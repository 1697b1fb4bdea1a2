"""HyMD MD-discovery goldens pinned to the reference's test suite
(src/tests/unit/test_hymd.cpp) on its own fixture
(test_input_data/animals_beverages.csv): the default-parameter result
(AnimalsBeveragesNormal) and the exhaustive no-limits lattice
(AnimalsBeveragesNoLimits, 25 MDs) -- exact boundaries, exact MdLess
order (utility/md_less.h)."""

import os

import pytest

from pyspark_validator.io import read_reference_csv
from pyspark_validator.md_discovery import ColumnMatch, mine_mds

FIXTURE = "/root/reference/test_input_data/animals_beverages.csv"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(FIXTURE), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def animals(spark):
    return read_reference_csv(spark, FIXTURE).persist()


def _pairs(mds):
    return [
        (tuple(round(v, 9) for v in r.lhs_bounds), (r.rhs_index, round(r.rhs_bound, 9)))
        for r in mds
    ]


def test_hymd_normal(animals):
    """AnimalsBeveragesNormal: min_sim 0.7, min_support n+1,
    prune_nondisjoint -- exactly two MDs, in order."""
    got = _pairs(mine_mds(animals))
    assert got == [
        ((0.0, 0.0, 0.0, 0.75), (2, 0.75)),
        ((0.0, 0.0, 0.75, 0.0), (3, 0.75)),
    ]


def test_hymd_no_limits(animals):
    """AnimalsBeveragesNoLimits: min_sim 0, min_support 0, nondisjoint
    allowed -- the full 25-MD lattice in MdLess order."""
    cms = [ColumnMatch(c, c, "levenshtein", 0.0) for c in animals.columns]
    got = _pairs(mine_mds(animals, cms, min_support=0, prune_nondisjoint=False))
    expected = [
        ((0, 0, 0, 0), (1, round(1 / 6, 9))),
        ((0.2, 0, 0, 0), (3, 1.0)),
        ((0.2, 0, 0, 0), (2, 0.75)),
        ((1, 0, 0, 0), (1, 1.0)),
        ((1, 0, 0, 0), (2, 1.0)),
        ((0, 0, 0.75, 0), (3, 0.75)),
        ((0, 0, 0, 0.75), (2, 0.75)),
        ((0, 0, 0, 1), (0, 0.2)),
        ((0, 0, 1, 1), (0, 1.0)),
        ((0, 0, 1, 1), (1, 1.0)),
        ((0, 1, 0, 0.75), (0, 1.0)),
        ((0, 1, 0, 0.75), (2, 1.0)),
        ((0, 1, 0, 0.75), (3, 1.0)),
        ((0, 1, 0.75, 0), (0, 1.0)),
        ((0, 1, 0.75, 0), (2, 1.0)),
        ((0, 1, 0.75, 0), (3, 1.0)),
        ((0.125, 0, 0, 0.75), (3, 1.0)),
        ((0.125, 0, 0, 0.75), (0, 0.2)),
        ((0.125, 0, 0.75, 0), (3, 1.0)),
        ((0.125, 0, 0.75, 0), (0, 0.2)),
        ((0.125, 0, 1, 0), (0, 1.0)),
        ((0.125, 0, 1, 0), (1, 1.0)),
        ((0.125, 1, 0, 0), (0, 1.0)),
        ((0.125, 1, 0, 0), (2, 1.0)),
        ((0.125, 1, 0, 0), (3, 1.0)),
    ]
    # normalize ints to floats on the expected side
    expected = [
        (tuple(float(v) for v in lhs), (m, float(b))) for lhs, (m, b) in expected
    ]

    def key(p):
        lhs, (m, b) = p
        return (sum(1 for v in lhs if v != 0.0), lhs, -b, m)

    assert got == sorted(expected, key=key)
    assert len(got) == 25


def test_hymd_min_support_monotone(animals):
    """Raising min_support can only remove MDs (support is antitone in
    LHS specialization)."""
    cms = [ColumnMatch(c, c, "levenshtein", 0.0) for c in animals.columns]
    loose = {str(r) for r in mine_mds(animals, cms, min_support=0,
                                      prune_nondisjoint=False)}
    tight = {str(r) for r in mine_mds(animals, cms, min_support=6,
                                      prune_nondisjoint=False)}
    assert tight <= loose


def test_hymd_facade(spark, animals):
    from pyspark_validator.compat import HyMD

    algo = HyMD(spark)
    algo.load_data(animals)
    algo.execute()
    mds = algo.get_mds()
    assert [(m.lhs_bounds, (m.rhs_index, m.rhs_bound)) for m in mds] == [
        ([0.0, 0.0, 0.0, 0.75], (2, 0.75)),
        ([0.0, 0.0, 0.75, 0.0], (3, 0.75)),
    ]
    assert "levenshtein" in str(mds[0])
