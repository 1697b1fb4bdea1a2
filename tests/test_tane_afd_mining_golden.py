"""TANE approximate-FD mining under AFD error measures, pinned to the
reference's golden result hashes (src/tests/unit/test_tane_afd_measures.cpp
AfdMeasuresTaneMiningSuite): Fletcher16 over the sorted FDsToJson string
(fd_algorithm.h:83-99).  The suite's kNeighbors10k fixture is not shipped
with the reference checkout; the 12 TestFD / iris goldens run verbatim.

Spark runs the batched lattice walk (pfd_discovery.mine_afds_tane); a pure
python replica (scripts/pfdtane_oracle.brute_force_tane_afd) double-checks
each golden and anchors the property law on random matrices -- tau and
mu_plus are non-monotone in the LHS, so those walks exercise candidate
propagation and key pruning, not mere thresholding.
"""

import os
import random
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pfdtane_oracle import (  # noqa: E402
    afd_error,
    brute_force_tane_afd,
    load_csv,
    result_hash,
)

from pyspark_validator.pfd_discovery import mine_afds_tane  # noqa: E402

TESTFD = "/root/reference/test_input_data/TestFD.csv"
IRIS = "/root/reference/examples/datasets/iris.csv"

#: (csv, has_header, error, measure, golden) -- AfdMeasuresTaneMiningSuite,
#: test_tane_afd_measures.cpp:324-347, shipped-fixture subset.
GOLDEN = [
    (TESTFD, True, 0.3, "pdep", 3325),
    (IRIS, False, 0.174, "pdep", 19266),
    (IRIS, False, 0.1, "pdep", 18528),
    (TESTFD, True, 0.01, "tau", 33180),
    (IRIS, False, 0.1, "tau", 11680),
    (IRIS, False, 0.01, "tau", 60896),
    (TESTFD, True, 0.01, "mu_plus", 33180),
    (IRIS, False, 0.1, "mu_plus", 60841),
    (IRIS, False, 0.01, "mu_plus", 60896),
    (TESTFD, True, 0.01, "rho", 33180),
    (IRIS, False, 0.1, "rho", 11873),
    (IRIS, False, 0.01, "rho", 47878),
]


def _index_fds(fds, cols):
    ix = {c: i for i, c in enumerate(cols)}
    return [(frozenset(ix[c] for c in lhs), ix[r]) for lhs, r in fds]


@pytest.mark.parametrize("path,header,error,measure,want", GOLDEN)
def test_replica_matches_reference_hash(path, header, error, measure, want):
    rows = load_csv(path, header)
    assert result_hash(brute_force_tane_afd(rows, error, measure)) == want


@pytest.mark.parametrize("path,header,error,measure,want", GOLDEN)
def test_spark_miner_matches_reference_hash(
    spark, path, header, error, measure, want
):
    rows = load_csv(path, header)
    cols = [f"v{i}" for i in range(len(rows[0]))]
    df = spark.createDataFrame([tuple(r) for r in rows], cols)
    fds = mine_afds_tane(df, cols, max_error=error, error_measure=measure)
    assert result_hash(_index_fds(fds, cols)) == want


def test_tau_validation_values_anchor_the_replica():
    """A spot of the kTau TaneValidationSuite over TestFD
    (test_tane_afd_measures.cpp:180-196): the suite pins tau MEASURE
    values, so 1 - afd_error must reproduce them."""
    rows = load_csv(TESTFD, True)
    for lhs, rhs, want in [
        (0, 1, 0.0),
        (1, 0, 1.0),
        (1, 2, 0.48387096774193533),
        (1, 3, 0.6444444444444446),
    ]:
        got = 1.0 - afd_error(rows, frozenset({lhs}), rhs, "tau")
        assert abs(got - want) < 1e-9, (lhs, rhs, got, want)


@pytest.mark.parametrize(
    "seed,error,measure,n,p,card",
    [
        (11, 0.2, "pdep", 60, 4, 3),
        (12, 0.35, "tau", 60, 4, 3),
        (13, 0.3, "mu_plus", 60, 4, 3),
        (14, 0.25, "rho", 60, 4, 3),
        (15, 0.1, "g1", 60, 4, 3),
        # full-depth walks (max_lhs=None, arities up to 4 register: the
        # candidate-propagation and key-prune paths fire deep in the lattice)
        (23, 0.45, "pdep", 40, 5, 2),
        (22, 0.6, "tau", 40, 5, 2),
    ],
)
def test_property_law_spark_equals_replica(
    spark, seed, error, measure, n, p, card
):
    rng = random.Random(seed)
    rows = [[str(rng.randrange(card)) for _ in range(p)] for _ in range(n)]
    cols = [f"v{i}" for i in range(p)]
    df = spark.createDataFrame([tuple(r) for r in rows], cols)
    got = _index_fds(
        mine_afds_tane(df, cols, max_error=error, error_measure=measure),
        cols,
    )
    want = brute_force_tane_afd(rows, error, measure)
    assert sorted(map(repr, got)) == sorted(map(repr, want))
