"""ND and set-based AOD golden tests pinned to the reference's cases
(src/tests/unit/test_nd_verifier.cpp:instantiations on TestND.csv;
src/tests/unit/test_set_based_verifier.cpp on TestFD.csv / BernoulliRelation.csv).
Only type-clean cases are ported: the reference's mixed-type columns ('-' vs
numbers under its runtime type inference) have no counterpart in a typed Spark
schema. Empty CSV cells are NULL here (the reference's parser nulls them, see
the TestNDVerifierNullEqualNull suite)."""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.canonical import NullMode
from pyspark_validator.checks.nd import nd_check
from pyspark_validator.checks.od import aod_check

# test_input_data/TestND.csv -- empty cells -> None
ND_ROWS = [
    ("1", "a", "x", "1.233", "-", "11", "aa"),
    ("1", "a", "x", "0", "8", "22", None),
    ("1", "a", "xy", "0", "8", "33", None),
    ("1", "b", "y", "hjkl", "444", "44", "aa"),
    ("1", "b", "y", "hjkl", "444", "44", "bb"),
    ("1", "b", "xy", "hjkl", "444", "55", "aa"),
    ("1", "c", "z", "0", "9", "66", None),
    ("1", "c", "z", "0", "9", "66", None),
    ("1", "c", "z", "999", "-", "77", "bb"),
    ("1", "d", "k", "hjkl", "555", "88", "aa"),
    ("1", "d", "k", "hjkl", "555", "88", "aa"),
    ("1", "d", "abc", "hjkl", "555", "99", None),
]
ND_COLS = [f"c{i}" for i in range(7)]


@pytest.fixture(scope="module")
def nd_df(spark):
    return spark.createDataFrame(ND_ROWS, ND_COLS)


# (lhs, rhs, expected real weight) -- test_nd_verifier.cpp NDVerifierTestSuite
ND_GOLDEN = [
    (["c0"], ["c1"], 4),
    (["c0"], ["c2"], 6),
    (["c0"], ["c3"], 4),
    (["c0"], ["c4"], 5),
    (["c0"], ["c5"], 9),
    (["c1"], ["c5"], 3),
    (["c4"], ["c0"], 1),
    (["c0", "c1"], ["c3", "c5"], 3),
    (["c1", "c2"], ["c3", "c6"], 2),
    (["c1", "c2", "c3"], ["c6"], 2),
]


@pytest.mark.parametrize("lhs,rhs,weight", ND_GOLDEN)
def test_nd_reference_golden(nd_df, lhs, rhs, weight):
    s = nd_check(nd_df, lhs, rhs, weight=weight, num_partitions=4).collect()[0]
    assert s.real_weight == weight
    assert s.holds
    if weight > 1:
        s2 = nd_check(nd_df, lhs, rhs, weight=weight - 1, num_partitions=4).collect()[0]
        assert not s2.holds


def test_nd_null_equality_modes(nd_df):
    """test_nd_verifier.cpp NDVerifierTestNullEqualNull: c6 has 2 values + 5
    NULL cells -> weight 3 when NULL==NULL, 7 when every NULL is distinct."""
    s_eq = nd_check(nd_df, ["c0"], ["c6"], weight=3, null_mode=NullMode.EQUAL).collect()[0]
    assert s_eq.real_weight == 3 and s_eq.holds
    s_ne = nd_check(
        nd_df, ["c0"], ["c6"], weight=7, null_mode=NullMode.UNEQUAL
    ).collect()[0]
    assert s_ne.real_weight == 7 and s_ne.holds


# test_input_data/TestFD.csv, integer columns only (Col1, Col5)
FD_ROWS = [
    (1, 1), (2, 1), (3, 1), (4, 2), (4, 2), (5, 2),
    (6, 3), (6, 3), (7, 3), (8, 4), (8, 4), (9, 4),
]  # (Col5, Col1)


def test_aod_testfd_col5_col1_holds(spark):
    # test_set_based_verifier.cpp case 1: {}: Col5 ~ Col1 asc AND {Col5}: [] -> Col1
    # both hold (empty removal set).
    df = spark.createDataFrame(FD_ROWS, ["c5", "c1"]).withColumn("g", F.lit(1))
    s = {r.check: r for r in aod_check(df, ["g"], oc=("c5", "c1"), ofd_right=None).summary().collect()}
    assert s["oc"].n_removals == 0 and s["oc"].holds
    s2 = {r.check: r for r in aod_check(df, ["c5"], ofd_right="c1").summary().collect()}
    assert s2["ofd"].n_removals == 0 and s2["ofd"].holds


BERNOULLI = [
    (1, 1, 1, 1, 1, 1, 1),
    (2, 0, 0, 0, 1, 1, 1),
    (3, 0, 0, 1, 0, 1, 1),
    (4, 0, 1, 0, 1, 1, 0),
    (5, 0, 1, 1, 0, 0, 1),
    (6, 0, 0, 0, 0, 1, 1),
]
B_COLS = ["rid", "a", "b", "c", "d", "e", "f"]


@pytest.fixture(scope="module")
def bern_df(spark):
    return spark.createDataFrame(BERNOULLI, B_COLS)


def test_aod_bernoulli_holds(bern_df):
    # {}: F desc ~ E asc AND {B,C,D,E}: [] -> A : removal set {} (case :40-44)
    g = bern_df.withColumn("g", F.lit(1))
    s = {r.check: r for r in aod_check(g, ["g"], oc=("f", "e"), ordering="descending").summary().collect()}
    assert s["oc"].n_removals == 0
    s2 = {r.check: r for r in aod_check(bern_df, ["b", "c", "d", "e"], ofd_right="a").summary().collect()}
    assert s2["ofd"].n_removals == 0


def test_aod_bernoulli_single_removals(bern_df):
    # {A}: D asc ~ E asc (0 removals) + {A}: [] -> F (1 removal) => union {3}
    sc = {r.check: r for r in aod_check(bern_df, ["a"], oc=("d", "e"), ofd_right="f").summary().collect()}
    assert sc["oc"].n_removals == 0
    assert sc["ofd"].n_removals == 1
    # {A}: D desc ~ E asc (1 removal) + {A}: [] -> E (1 removal) => union {4}
    sd = {
        r.check: r
        for r in aod_check(
            bern_df, ["a"], oc=("d", "e"), ordering="descending", ofd_right="e"
        ).summary().collect()
    }
    assert sd["oc"].n_removals == 1
    assert sd["ofd"].n_removals == 1


def test_aod_removal_set_bernoulli_golden(bern_df):
    """Removal SET parity vs test_set_based_verifier.cpp (rows are 0-based
    there; rid = pos+1 here). All three type-clean Bernoulli cases reproduce
    the reference's exact witness set, not just its cardinality."""
    from pyspark_validator.checks.od import aod_check

    # {A}: D<= ~ E<= , {A}: [] -> F  => {3}
    c1 = aod_check(bern_df, ["a"], oc=("d", "e"), ofd_right="f")
    assert sorted(r.row_ref for r in c1.removal_rows("rid").collect()) == [4]
    u1 = c1.union_summary("rid").collect()[0]
    assert (u1.n_removals, u1.holds) == (1, False)
    assert abs(u1.error - 1 / 6) < 1e-12

    # {A}: D>= ~ E<= , {A}: [] -> E  => {4}
    c2 = aod_check(bern_df, ["a"], oc=("d", "e"), ordering="descending", ofd_right="e")
    assert sorted(r.row_ref for r in c2.removal_rows("rid").collect()) == [5]

    # {}: C>= ~ B<= , {D}: [] -> C  => {0, 4, 5}  (different contexts -> two
    # checks; the union across them is the reference's one removal std::set)
    g = bern_df.withColumn("g", F.pmod(F.col("rid"), F.lit(1)))
    oc3 = aod_check(g, ["g"], oc=("c", "b"), ordering="descending")
    ofd3 = aod_check(bern_df, ["d"], ofd_right="c")
    union = set(r.row_ref for r in oc3.removal_rows("rid").collect()) | set(
        r.row_ref for r in ofd3.removal_rows("rid").collect()
    )
    assert sorted(union) == [1, 5, 6]


def test_aod_removal_rows_empty_when_holds(bern_df):
    from pyspark_validator.checks.od import aod_check

    # {}: F>= ~ E<= holds -> empty removal set (case :105-112)
    g = bern_df.withColumn("g", F.pmod(F.col("rid"), F.lit(1)))
    c = aod_check(g, ["g"], oc=("f", "e"), ordering="descending")
    assert c.removal_rows("rid").count() == 0
    row = c.union_summary("rid").collect()[0]
    assert row.holds and row.n_removals == 0 and row.error == 0.0
