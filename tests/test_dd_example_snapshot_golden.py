"""DD verification pinned to the reference's verifying_dd example snapshot
(examples/test_examples/snapshots/snap_test_examples_pytest.py,
verifying_dd_output), exercising the typed distance table the verifier
gained for it: string columns compare by Levenshtein, dates by day
difference, numerics by absolute difference, and a [0, 0] LHS of any type
blocks by hash equality (no neighbor probes).

Legs: the narrative flights DD (flight_id[0,0]; date[0,7] -> price[0,250])
holds; stores_dd DD1 holds while DD2 (store_name[0,0] ->
stock_quantity[0,25]) fails with four pinned pairs at error 4/18; the
grades walkthrough (student_id[0,0] -> student_name[0,0], a string
equality RHS) fails at 4/6, drops to 2/6 after the Akice fix, and holds
on the fully repaired table."""

import pandas as pd
import pytest

from pyspark_validator.checks.dd import dd_check

DATASETS = "/root/reference/examples/datasets"


def _check(spark, pdf, lhs, rhs):
    pdf = pdf.copy()
    pdf["__row"] = range(len(pdf))
    return dd_check(spark.createDataFrame(pdf), lhs, rhs, row_ref="__row")


def _pairs(chk):
    return sorted(
        tuple(sorted((r["rid_a"], r["rid_b"]))) for r in chk.highlights().collect()
    )


def test_flights_narrative_dd_holds(spark):
    fl = pd.DataFrame(
        {
            "flight_id": [25, 25, 11, 25, 11, 11, 25],
            "date": pd.to_datetime(
                ["2023-08-19", "2023-08-22", "2023-09-01", "2023-09-02",
                 "2023-09-07", "2023-09-12", "2023-10-11"]
            ).date,
            "price": [370, 200, 850, 120, 700, 460, 200],
        }
    )
    chk = _check(spark, fl, {"flight_id": (0, 0), "date": (0, 7)}, {"price": (0, 250)})
    assert bool(chk.summary().collect()[0]["holds"]) is True


def test_stores_dd_matches_snapshot(spark):
    pdf = pd.read_csv(f"{DATASETS}/stores_dd.csv")
    c1 = _check(
        spark, pdf, {"product_name": (0, 0)},
        {"stock_quantity": (0, 20), "price_per_unit": (0, 60)},
    )
    assert bool(c1.summary().collect()[0]["holds"]) is True
    c2 = _check(spark, pdf, {"store_name": (0, 0)}, {"stock_quantity": (0, 25)})
    s2 = c2.summary().collect()[0]
    assert not s2["holds"]
    assert s2["n_violating_pairs"] == 4 and s2["n_lhs_pairs"] == 18
    assert s2["error"] == 4 / 18
    assert _pairs(c2) == [(0, 6), (0, 9), (2, 8), (2, 11)]


@pytest.mark.parametrize(
    "name,holds,error,pairs",
    [
        ("grades_dd", False, 4 / 6, [(0, 1), (1, 2), (3, 4), (3, 5)]),
        ("grades_dd2", False, 2 / 6, [(3, 4), (3, 5)]),
        ("grades_dd3", True, 0.0, []),
    ],
)
def test_grades_walkthrough_matches_snapshot(spark, name, holds, error, pairs):
    pdf = pd.read_csv(f"{DATASETS}/{name}.csv")
    chk = _check(spark, pdf, {"student_id": (0, 0)}, {"student_name": (0, 0)})
    s = chk.summary().collect()[0]
    assert bool(s["holds"]) is holds and s["error"] == error
    assert _pairs(chk) == pairs
