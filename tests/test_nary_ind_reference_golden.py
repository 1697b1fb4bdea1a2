"""N-ary IND discovery goldens vs the reference's own unit suites.

The three expected sets are lifted verbatim from
/root/reference/src/tests/unit/test_ind_util.cpp kINDEqualityTestConfigs
over the shipped ind_data fixtures. They are asserted by BOTH the exact
n-ary algorithms (test_ind_algorithms.cpp NaryINDAlgorithmTest: Mind) and
the approximate FAIDA at sample_size=500 / hll_accuracy=0.001
(test_faida.cpp EqualityTest) -- FAIDA must coincide with the exact result
there, so one golden covers both families.
"""

import pytest

from pyspark_validator.discovery import mine_nary_inds

REF = "/root/reference/test_input_data/ind_data"

#: test_ind_util.cpp:78-100, 0-based column indices, lhs -> rhs
EXPECTED = {
    "TestWide2": [((2,), (0,)), ((3,), (1,)), ((2, 3), (0, 1))],
    "Planets": [
        ((0,), (1,)),
        ((1,), (0,)),
        ((2,), (3,)),
        ((3,), (2,)),
        ((1, 3), (0, 2)),
        ((0, 2), (1, 3)),
        ((0, 3), (1, 2)),
        ((1, 2), (0, 3)),
    ],
    "Test-3ary-inds": [
        ((2,), (5,)),
        ((3,), (0,)),
        ((4,), (1,)),
        ((5,), (2,)),
        ((3, 4), (0, 1)),
        ((4, 5), (1, 2)),
        ((3, 5), (0, 2)),
        ((3, 4, 5), (0, 1, 2)),
    ],
}

FILES = {
    "TestWide2": "TestWide2.csv",
    "Planets": "Planets.csv",
    "Test-3ary-inds": "Test-3ary-inds.csv",
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_nary_ind_equality(spark, name):
    df = spark.read.csv(f"{REF}/{FILES[name]}", header=False, inferSchema=False)
    idx = {c: i for i, c in enumerate(df.columns)}
    res = mine_nary_inds({"t": df}, max_arity=3)
    got = sorted(
        (tuple(idx[c] for c in l[1]), tuple(idx[c] for c in r[1]))
        for l, r in res
    )
    assert got == sorted(EXPECTED[name])


def test_overlap_rejection_same_table(spark):
    # HaveIndicesIntersection: Planets' (0)<->(1) and (1)<->(0) unary pair
    # must NOT join into ((0,1), (1,0)) -- the sides share columns
    df = spark.read.csv(f"{REF}/Planets.csv", header=False, inferSchema=False)
    res = mine_nary_inds({"t": df}, max_arity=2)
    idx = {c: i for i, c in enumerate(df.columns)}
    pairs = {
        (tuple(idx[c] for c in l[1]), tuple(idx[c] for c in r[1]))
        for l, r in res
    }
    assert ((0, 1), (1, 0)) not in pairs
