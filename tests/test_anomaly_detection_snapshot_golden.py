"""The reference's expert anomaly-detection pipeline pinned to its example
snapshot (examples/test_examples/snapshots/snap_test_examples_pytest.py,
anomaly_detection_output): minimal exact FDs over three successive cargo
snapshots -- dataset 3 silently loses [item_id] -> item_weight, the
anomaly -- the g1 AFD rescue at error 0.005 recovering it as
[item_id cargo_id] -> item_weight, and the closing euclidean MFD check
(lhs item_id, rhs item_weight, parameter 4) holding on dataset 3."""

import pandas as pd
import pytest

from pyspark_validator.checks.mfd import mfd_check
from pyspark_validator.discovery import mine_fds
from pyspark_validator.pfd_discovery import mine_afds_tane

P = "/root/reference/examples/datasets"

UNARY_COMMON = [
    "[record_id] -> cargo_id",
    "[record_id] -> item_id",
    "[record_id] -> item_weight",
    "[record_id] -> timestamp",
    "[timestamp] -> cargo_id",
    "[timestamp] -> item_id",
    "[timestamp] -> item_weight",
    "[timestamp] -> record_id",
    "[item_weight] -> item_id",
]

FD_GOLDEN = {
    1: sorted(UNARY_COMMON + ["[item_id] -> item_weight"]),
    2: sorted(UNARY_COMMON + ["[item_id] -> item_weight"]),
    3: sorted(UNARY_COMMON),
}


def _load(spark, i):
    return spark.createDataFrame(
        pd.read_csv(f"{P}/cargo_data_{i}.csv").astype(str)
    )


@pytest.mark.parametrize("i", [1, 2, 3])
def test_exact_fds_match_snapshot(spark, i):
    df = _load(spark, i)
    fds = mine_fds(df, df.columns, max_lhs=4)
    assert sorted(f"[{' '.join(l)}] -> {r}" for l, r in fds) == FD_GOLDEN[i]


def test_afd_rescue_and_mfd_close_match_snapshot(spark):
    df = _load(spark, 3)
    afds = mine_afds_tane(df, df.columns, max_error=0.005, error_measure="g1")
    got = sorted(f"[{' '.join(l)}] -> {r}" for l, r in afds)
    assert got == sorted(UNARY_COMMON + ["[item_id cargo_id] -> item_weight"])
    typed = spark.createDataFrame(pd.read_csv(f"{P}/cargo_data_3.csv"))
    row = mfd_check(
        typed, ["item_id"], ["item_weight"], metric="euclidean", parameter=4.0
    ).summary().collect()[0]
    assert bool(row["holds"]) is True
