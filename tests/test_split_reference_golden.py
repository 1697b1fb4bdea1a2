"""Split DD-discovery goldens pinned to the reference's test suite
(src/tests/unit/test_split.cpp) on its own fixtures
(test_input_data/TestDD*.csv + dif_tables/TestDif*.csv). Results are
compared as permutation-free sets of (lhs-constraint-set,
rhs-constraint-set), the CompareDDStringLists semantics."""

import os

import pytest

from pyspark_validator.dd_discovery import Constraint, mine_dds
from pyspark_validator.io import cast_inferred, read_reference_csv

BASE = "/root/reference/test_input_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference fixtures not available"
)


def _load(spark, name):
    return cast_inferred(read_reference_csv(spark, f"{BASE}/{name}.csv"))


def _dif(spark, name):
    return read_reference_csv(spark, f"{BASE}/dif_tables/{name}.csv")


def _as_set(dds):
    # The C++ comparison is tolerant (DFStringConstraint's defaulted <=>
    # delegates to the 5-eps DFConstraint compare); 9-dp rounding is an
    # equivalent normalisation at these magnitudes.
    return {
        (
            frozenset((n, round(a, 9), round(b, 9)) for n, a, b in d.left),
            frozenset((n, round(a, 9), round(b, 9)) for n, a, b in d.right),
        )
        for d in dds
    }


def _expect(pairs):
    return {
        (frozenset(lhs), frozenset(rhs))
        for lhs, rhs in pairs
    }


def test_split_test0(spark):
    """test_split.cpp Test0: TestDD + TestDif."""
    dds = mine_dds(_load(spark, "TestDD"), difference_table=_dif(spark, "TestDif"))
    assert _as_set(dds) == _expect(
        [
            ([("Col4", 2, 4)], [("Col0", 3, 4)]),
            ([("Col1", 2, 5)], [("Col0", 1, 1)]),
        ]
    )


def test_split_test1(spark):
    """test_split.cpp Test1: TestDD1, default ladder search space."""
    dds = mine_dds(_load(spark, "TestDD1"))
    assert _as_set(dds) == _expect(
        [
            ([("Col1", 2, 3)], [("Col0", 1, 1)]),
            ([("Col0", 1, 1)], [("Col1", 2, 2)]),
        ]
    )


def test_split_test2(spark):
    """test_split.cpp Test2: TestDD2 + TestDif1."""
    dds = mine_dds(_load(spark, "TestDD2"), difference_table=_dif(spark, "TestDif1"))
    assert _as_set(dds) == _expect([([("Col3", 5, 5)], [("Col2", 4, 4)])])


def test_split_test3(spark):
    """test_split.cpp Test3: TestDD2 + TestDif2 -- the reference's
    deterministic pick between the two equal-size minimal covers
    (also_expected_results in the C++ test)."""
    dds = mine_dds(_load(spark, "TestDD2"), difference_table=_dif(spark, "TestDif2"))
    assert _as_set(dds) == _expect(
        [
            ([("Col3", 7, 12)], [("Col1", 1, 1)]),
            ([("Col3", 5, 5)], [("Col1", 2, 2)]),
            ([("Col3", 5, 7), ("Col2", 4, 4)], [("Col1", 2, 2)]),
            ([("Col3", 5, 5)], [("Col2", 4, 4)]),
            ([("Col3", 12, 12)], [("Col2", 4, 4)]),
            ([("Col3", 7, 7)], [("Col2", 8, 8)]),
            ([("Col1", 1, 1), ("Col3", 5, 7)], [("Col2", 8, 8)]),
            ([("Col1", 2, 2)], [("Col3", 5, 5)]),
            ([("Col2", 8, 8)], [("Col3", 7, 7)]),
            ([("Col1", 1, 1)], [("Col3", 7, 12)]),
            ([("Col1", 1, 1), ("Col2", 4, 4)], [("Col3", 12, 12)]),
        ]
    )


def test_split_test4(spark):
    """test_split.cpp Test4: TestDD3 + TestDif3 (expected_results pick)."""
    dds = mine_dds(_load(spark, "TestDD3"), difference_table=_dif(spark, "TestDif3"))
    got = _as_set(dds)
    expected = _expect(
        [
            ([("Col3", 7, 7)], [("Col2", 4, 4)]),
            ([("Col1", 2, 2)], [("Col3", 7, 7)]),
            ([("Col2", 4, 4)], [("Col3", 7, 7)]),
        ]
    )
    also = _expect(
        [
            ([("Col3", 7, 7)], [("Col2", 4, 4)]),
            ([("Col1", 2, 2)], [("Col2", 4, 4)]),
            ([("Col2", 4, 4)], [("Col3", 7, 7)]),
        ]
    )
    assert got in (expected, also)


def test_split_test5(spark):
    """test_split.cpp Test5: TestDD4 + TestDif4."""
    dds = mine_dds(_load(spark, "TestDD4"), difference_table=_dif(spark, "TestDif4"))
    assert _as_set(dds) == _expect(
        [
            ([("Col2", 4, 8)], [("Col1", 1, 2)]),
            ([("Col3", 5, 5)], [("Col1", 2, 2)]),
            ([("Col2", 4, 4), ("Col3", 5, 7)], [("Col1", 2, 2)]),
            ([("Col2", 8, 8)], [("Col1", 1, 1)]),
            ([("Col1", 2, 2)], [("Col2", 4, 8)]),
            ([("Col1", 1, 2), ("Col3", 5, 7)], [("Col2", 4, 8)]),
            ([("Col1", 1, 1), ("Col3", 5, 7)], [("Col2", 8, 8)]),
            ([("Col3", 5, 5)], [("Col2", 4, 4)]),
            ([("Col1", 2, 2), ("Col3", 5, 12)], [("Col2", 4, 4)]),
            ([("Col1", 1, 1)], [("Col3", 5, 12)]),
            ([("Col2", 4, 4)], [("Col3", 5, 12)]),
            ([("Col2", 8, 8)], [("Col3", 5, 7)]),
            ([("Col1", 2, 2), ("Col2", 4, 4)], [("Col3", 5, 5)]),
        ]
    )


def test_split_double_compare(spark):
    """test_split.cpp TestDoubleCompare: TestDD5 + TestDif5 -- Col3 is a
    double column ('1.2e1', '5.0E0'), exercising the 5-eps tolerant
    Contains path."""
    dds = mine_dds(_load(spark, "TestDD5"), difference_table=_dif(spark, "TestDif5"))
    assert _as_set(dds) == _expect([([("Col3", 5.1, 5.1)], [("Col2", 4, 4)])])


def test_constraint_tolerance_unit():
    """dd.h:19-39 -- 5-eps relative closeness drives ==, subsume, within."""
    a = Constraint(1.0, 2.0)
    b = Constraint(1.0 + 1e-16, 2.0 - 1e-16)
    assert a.eq(b) and a.is_subsumed_by(b) and b.is_subsumed_by(a)
    assert a.is_within_exclusive(1.9999999) and not a.is_within_exclusive(2.0)
    assert Constraint(0.0, 1.0).longer_than(Constraint(5.0, 5.5))
    assert Constraint(2.0, 3.0).longer_than(Constraint(1.0, 2.0))


def test_repeated_values_zero_min(spark):
    """A repeated value forces min_dif = 0 (split.cpp:378 cluster size>1)
    and the default ladder starts at [0, k]."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"x": [1, 1, 2, 9], "y": [3, 3, 5, 30]})
    )
    dds = mine_dds(df)
    # x distances {0,1,7,8}, y distances {0,2,25,27}: [0;k] ladders exist
    got = _as_set(dds)
    assert got == _expect(
        [
            ([("y", 0, 4)], [("x", 0, 1)]),
            ([("y", 0, 1)], [("x", 0, 0)]),
            ([("x", 0, 4)], [("y", 0, 2)]),
            ([("x", 0, 0)], [("y", 0, 0)]),
        ]
    )


def test_split_facade(spark):
    """compat.Split mirrors bind_split.cpp:74 (get_dds on DDString list)."""
    import pandas as pd

    from pyspark_validator.compat import Split

    algo = Split(spark)
    algo.load_data(pd.DataFrame({"a": [1, 2, 3], "b": [3, 5, 7]}))
    algo.execute()
    strs = {str(d) for d in algo.get_dds()}
    assert "b [2, 3] -> a [1, 1]" in strs
