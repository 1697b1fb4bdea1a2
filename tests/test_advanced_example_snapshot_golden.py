"""Advanced-example snapshot goldens (reference
examples/test_examples/snapshots/snap_test_examples_pytest.py):

* afd_multiple_error_thresholds_output -- Pyro/TANE g1 AFD mining on iris
  at error 0 / 0.1 / 0.2 / 0.3, pinned as index FD sets (the 0.1 and 0.2
  results coincide; 0.3 adds the three [4] -> * petal-width AFDs).
* comparison_pfd_vs_afd_output -- PFDTane per_value vs TANE g1 at error
  0.18 on glitchy_sensor.csv: the per-value measure forgives the single
  glitchy device, so [DeviceId] -> Data is a pFD but not an AFD, whose g1
  error the snapshot pins at 0.23076923076923078.
"""

import csv
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pfdtane_oracle import load_csv  # noqa: E402

from pyspark_validator.checks.fd import fd_check  # noqa: E402
from pyspark_validator.discovery import mine_fds  # noqa: E402
from pyspark_validator.pfd_discovery import (  # noqa: E402
    mine_afds_tane,
    mine_pfds,
)

IRIS = "/root/reference/examples/datasets/iris.csv"
GLITCHY = "/root/reference/examples/datasets/glitchy_sensor.csv"

IRIS_UNARY_16 = {
    ((0,), 1), ((0,), 2), ((0,), 3), ((0,), 4),
    ((1,), 0), ((1,), 2), ((1,), 3), ((1,), 4),
    ((2,), 0), ((2,), 1), ((2,), 3), ((2,), 4),
    ((3,), 0), ((3,), 1), ((3,), 2), ((3,), 4),
}

IRIS_GOLDEN = [
    (0.0, {((0, 1, 2), 4), ((0, 1, 3), 4), ((0, 2, 3), 4), ((1, 2, 3), 4)}),
    (0.1, IRIS_UNARY_16),
    (0.2, IRIS_UNARY_16),
    (0.3, IRIS_UNARY_16 | {((4,), 1), ((4,), 2), ((4,), 3)}),
]


@pytest.fixture(scope="module")
def iris(spark):
    rows = load_csv(IRIS, False)
    cols = [f"v{i}" for i in range(len(rows[0]))]
    return spark.createDataFrame([tuple(r) for r in rows], cols), cols


@pytest.mark.parametrize("error,want", IRIS_GOLDEN)
def test_iris_g1_thresholds_match_snapshot(iris, error, want):
    df, cols = iris
    ix = {c: i for i, c in enumerate(cols)}
    if error == 0.0:
        mined = mine_fds(df, cols, max_lhs=5)
    else:
        mined = mine_afds_tane(df, cols, max_error=error, error_measure="g1")
    got = {(tuple(sorted(ix[c] for c in l)), ix[r]) for l, r in mined}
    assert got == want


def test_glitchy_sensor_pfd_vs_afd_matches_snapshot(spark):
    rows = load_csv(GLITCHY, True)
    hdr = next(csv.reader(open(GLITCHY)))
    df = spark.createDataFrame([tuple(r) for r in rows], hdr)
    fmt = lambda fds: {f"[{' '.join(l)}] -> {r}" for l, r in fds}  # noqa: E731
    pfds = fmt(mine_pfds(df, hdr, max_error=0.18, error_measure="per_value"))
    afds = fmt(mine_afds_tane(df, hdr, max_error=0.18, error_measure="g1"))
    shared = {
        "[Data] -> Id",
        "[Data] -> DeviceId",
        "[Id] -> DeviceId",
        "[Id] -> Data",
    }
    assert pfds - afds == {"[DeviceId] -> Data"}
    assert afds - pfds == set()
    assert afds & pfds == shared
    m = fd_check(df, ["DeviceId"], ["Data"], num_partitions=4)
    assert float(m.afd_measures().collect()[0]["g1"]) == 0.23076923076923078
