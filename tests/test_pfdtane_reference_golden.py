"""PFDTane probabilistic-FD mining pinned to the reference's golden result
hashes (src/tests/unit/test_pfdtane.cpp): Fletcher16 over the sorted
FDsToJson string (fd_algorithm.h:83-99, fd_algorithm.cpp:47-56). Fixtures
neighbors10k is not shipped with the reference checkout; the remaining
golden corpus (TestFD per-value mining, iris at two thresholds, both
validation error tables) runs verbatim.

A second suite is the property law: on random low-cardinality matrices the
batched Spark miner emits exactly the pure-python replica's FD set for both
error measures, approximate and exact modes -- the per-value measure is
non-monotone, so these walks exercise candidate propagation, key pruning
and zero-ary registration, not just thresholding.
"""

import os
import random
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pfdtane_oracle import (  # noqa: E402
    brute_force_pfdtane,
    load_csv,
    pfd_error,
    result_hash,
)

from pyspark_validator.pfd_discovery import mine_pfds  # noqa: E402

TESTFD = "/root/reference/test_input_data/TestFD.csv"
IRIS = "/root/reference/examples/datasets/iris.csv"

# (csv, has_header, error, measure, golden) -- PFDTaneTestMiningSuite
GOLDEN = [
    (TESTFD, True, 0.3, "per_value", 44381),
    (IRIS, False, 0.1, "per_value", 19266),
    (IRIS, False, 0.01, "per_value", 10695),
]

# (lhs, rhs, expected) -- PFDTaneTestValidationSuite
ERRORS_PER_VALUE = [
    (2, 3, 0.0625), (4, 5, 0.333333), (3, 2, 0.291666), (0, 1, 0.75),
    (1, 0, 0.0), (4, 3, 0.099999), (1, 5, 0.416666), (5, 1, 0.0),
]
ERRORS_PER_TUPLE = [
    (2, 3, 0.083333), (4, 5, 0.333333), (3, 2, 0.5), (0, 1, 0.75),
    (1, 0, 0.0), (4, 3, 0.083333), (1, 5, 0.416666), (5, 1, 0.0),
]


def _index_fds(fds, cols):
    ix = {c: i for i, c in enumerate(cols)}
    return [(frozenset(ix[c] for c in lhs), ix[r]) for lhs, r in fds]


@pytest.mark.parametrize(
    "measure,cases",
    [("per_value", ERRORS_PER_VALUE), ("per_tuple", ERRORS_PER_TUPLE)],
)
def test_replica_error_values_match_reference(measure, cases):
    rows = load_csv(TESTFD, True)
    for lhs, rhs, want in cases:
        got = pfd_error(rows, frozenset({lhs}), rhs, measure)
        assert abs(got - want) < 1e-5, (lhs, rhs, got, want)


@pytest.mark.parametrize("path,header,error,measure,want", GOLDEN)
def test_replica_matches_reference_hash(path, header, error, measure, want):
    rows = load_csv(path, header)
    assert result_hash(brute_force_pfdtane(rows, error, measure)) == want


@pytest.mark.parametrize("path,header,error,measure,want", GOLDEN)
def test_spark_miner_matches_reference_hash(
    spark, path, header, error, measure, want
):
    rows = load_csv(path, header)
    cols = [f"v{i}" for i in range(len(rows[0]))]
    df = spark.createDataFrame([tuple(r) for r in rows], cols)
    fds = mine_pfds(df, cols, max_error=error, error_measure=measure)
    assert result_hash(_index_fds(fds, cols)) == want


@pytest.mark.parametrize(
    "seed,error,measure",
    [
        (1, 0.0, "per_tuple"),
        (2, 0.15, "per_tuple"),
        (3, 0.15, "per_value"),
        (4, 0.35, "per_value"),
    ],
)
def test_property_law_spark_equals_replica(spark, seed, error, measure):
    rng = random.Random(seed)
    n, p, card = 60, 4, 3
    rows = [[str(rng.randrange(card)) for _ in range(p)] for _ in range(n)]
    cols = [f"v{i}" for i in range(p)]
    df = spark.createDataFrame([tuple(r) for r in rows], cols)
    got = _index_fds(mine_pfds(df, cols, max_error=error, error_measure=measure), cols)
    want = brute_force_pfdtane(rows, error, measure)
    assert sorted(map(repr, got)) == sorted(map(repr, want))


def test_max_lhs_truncates_and_facade(spark):
    """max_lhs caps the walk depth; the compat.PFDTane facade returns FD
    result objects with the binding's getters (bind_fd.cpp:75-82)."""
    from pyspark_validator import compat

    rows = load_csv(TESTFD, True)
    cols = [f"v{i}" for i in range(len(rows[0]))]
    df = spark.createDataFrame([tuple(r) for r in rows], cols)
    fds = mine_pfds(df, cols, max_error=0.3, error_measure="per_value", max_lhs=1)
    assert all(len(lhs) <= 1 for lhs, _ in fds)
    want = brute_force_pfdtane(rows, 0.3, "per_value", max_lhs=1)
    assert sorted(map(repr, _index_fds(fds, cols))) == sorted(map(repr, want))

    algo = compat.PFDTane(spark)
    algo.load_data(df)
    algo.execute(error=0.3, error_measure="per_value")
    got = {f.to_index_tuple() for f in algo.get_fds()}
    full = brute_force_pfdtane(rows, 0.3, "per_value")
    assert got == {(tuple(sorted(lhs)), r) for lhs, r in full}
