"""DC verification pinned to the reference's data_cleaning_dc example
snapshot (examples/test_examples/snapshots/snap_test_examples_pytest.py,
data_cleaning_dc_output): the constraint
!(s.State == t.State and s.Salary < t.Salary and s.FedTaxRate > t.FedTaxRate)
fails on taxes_3 with exactly nine violating pairs -- the snapshot prints
them as unordered (min, max) pairs of 1-based file line numbers counting
the header, so canonical 0-based row pairs shift by 2 -- and holds on
taxes_4, the repaired table."""

import pandas as pd

from pyspark_validator.checks.dc import dc_check

P = "/root/reference/examples/datasets"
PREDS = [
    ("s.State", "==", "t.State"),
    ("s.Salary", "<", "t.Salary"),
    ("s.FedTaxRate", ">", "t.FedTaxRate"),
]


def _check(spark, name):
    pdf = pd.read_csv(f"{P}/{name}.csv")
    pdf["__row"] = range(len(pdf))
    return dc_check(spark.createDataFrame(pdf), PREDS, row_ref="__row")


def test_taxes_3_violations_match_snapshot(spark):
    chk = _check(spark, "taxes_3")
    assert bool(chk.summary().collect()[0]["holds"]) is False
    got = {
        tuple(sorted((r["rid_s"] + 2, r["rid_t"] + 2)))
        for r in chk.highlights().collect()
    }
    assert got == {
        (2, 5), (3, 5), (4, 5),
        (6, 9), (7, 9), (8, 9),
        (10, 13), (11, 13), (12, 13),
    }


def test_taxes_4_repaired_table_holds(spark):
    row = _check(spark, "taxes_4").summary().collect()[0]
    assert bool(row["holds"]) is True and row["n_violating_pairs"] == 0
