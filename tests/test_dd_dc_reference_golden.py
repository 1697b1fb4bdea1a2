"""DD and DC golden tests pinned to the reference's parameterized cases
(src/tests/unit/test_dd_verifier.cpp:42-70 on TestDD.csv;
src/tests/unit/test_dc_verifier.cpp:50-120 on TestDC.csv / TestDC1.csv /
BernoulliRelation.csv). Verdicts and pair counts must match; our DC counts
ORDERED (s, t) pairs with s != t, so a symmetric all-equality DC yields both
directions -- asserted explicitly where it differs from the reference's
unordered listing."""

import pytest

from pyspark_validator.checks.dc import dc_check
from pyspark_validator.checks.dd import dd_check

# test_input_data/TestDD.csv
DD_ROWS = [
    (1, 1, 6, 470, 123, 345),
    (2, 2, 10, 520, 456, 234),
    (3, 3, 14, 590, 678, 789),
    (4, 4, 22, 500, 345, 414),
    (5, 5, 20, 600, 234, 347),
]
DD_COLS = ["rid", "c0", "c1", "c2", "c3", "c4"]


@pytest.fixture(scope="module")
def dd_df(spark):
    return spark.createDataFrame(DD_ROWS, DD_COLS)


# (lhs, rhs, expected_error_pairs, expected_error) -- test_dd_verifier.cpp:45-63
DD_GOLDEN = [
    ({"c0": (0, 0)}, {"c1": (0, 0)}, 0, 0.0),
    ({"c0": (0, 2)}, {"c1": (0, 12)}, 0, 0.0),
    ({"c0": (1, 2)}, {"c1": (2, 12)}, 0, 0.0),
    ({"c0": (2, 3)}, {"c1": (6, 16)}, 0, 0.0),
    ({"c0": (2, 3)}, {"c1": (3, 16)}, 0, 0.0),
    ({"c1": (2, 16)}, {"c3": (111, 555)}, 0, 0.0),
    ({"c0": (0, 10000)}, {"c4": (0, 10000)}, 0, 0.0),
    ({"c0": (1, 1), "c1": (4, 6)}, {"c3": (222, 333), "c4": (111, 555)}, 0, 0.0),
    ({"c0": (1, 1), "c1": (4, 6)}, {"c3": (222, 333), "c4": (111, 550)}, 1, 1 / 2),
    ({"c0": (0, 2)}, {"c1": (0, 11)}, 1, 1 / 7),
    ({"c0": (0, 2)}, {"c1": (3, 10)}, 2, 2 / 7),
    ({"c0": (2, 3)}, {"c1": (9, 10)}, 4, 4 / 5),
    ({"c0": (2, 3)}, {"c1": (1, 2)}, 5, 1.0),
    ({"c1": (2, 16)}, {"c3": (112, 333)}, 5, 5 / 10),
]


@pytest.mark.parametrize("lhs,rhs,n_err,err", DD_GOLDEN)
def test_dd_reference_golden(dd_df, lhs, rhs, n_err, err):
    s = dd_check(dd_df, lhs, rhs, row_ref="rid").summary().collect()[0]
    assert s.n_violating_pairs == n_err
    assert float(s.error) == pytest.approx(err)
    assert s.holds == (n_err == 0)


# test_input_data/TestDC.csv
DC_ROWS = [
    (1, 0, 1, 2, "helloworld", 10, 10.2, 64.81099, "aa"),
    (2, 1, 2, 3, "helloworld", 15, 71.12, 16.693, "bb"),
    (3, 3, 4, 5, "hope it works", 23, 43.87, -15.8, "aa"),
    (4, 0, 1, 2, "cum deo", 7, 64.811, 2.19, "aa"),
    (5, 3, 4, 19, "ridiculous", 10, 15.9, -43.01, "bb"),
    (6, 1, 1, 14, "crucio", 12, 17.693, 69.012, "crm"),
    (7, 3, 1, 38, "lumos", 31, -0.19, -1.12, "bb"),
]
DC_COLS = ["rid", "c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7"]

# test_input_data/TestDC1.csv
DC1_ROWS = [
    (1, "NewYork", 3000, 0.20),
    (2, "NewYork", 4000, 0.25),
    (3, "NewYork", 5000, 0.30),
    (4, "Wisconsin", 5000, 0.15),
    (5, "Wisconsin", 6000, 0.20),
    (6, "Wisconsin", 4000, 0.10),
    (7, "Texas", 1000, 0.15),
    (8, "Texas", 2000, 0.25),
    (9, "Texas", 3000, 0.30),
    (10, "Texas", 3000, 0.31),
]
DC1_COLS = ["rid", "state", "salary", "fedtaxrate"]


@pytest.fixture(scope="module")
def dc_df(spark):
    return spark.createDataFrame(DC_ROWS, DC_COLS)


@pytest.fixture(scope="module")
def dc1_df(spark):
    return spark.createDataFrame(DC1_ROWS, DC1_COLS)


def test_dc_testdc_holds_cases(dc_df):
    # test_dc_verifier.cpp:51-55, :61-71, :77-80 -- all hold on TestDC.csv
    holds_cases = [
        [("t.c3", "==", "s.c3"), ("s.c1", "==", "t.c1"), ("s.c2", "==", "t.c2")],
        [("s.c0", "==", "t.c0"), ("t.c1", "==", "s.c1"), ("s.c2", ">", "t.c4")],
        [("s.c0", "==", "t.c0"), ("s.c5", "<=", "t.c6")],
        [("t.c7", ">", "s.c3"), ("s.c1", "==", "t.c1")],
        [("t.c2", "==", "s.c2"), ("s.c4", ">=", "t.c5")],
    ]
    for preds in holds_cases:
        s = dc_check(dc_df, preds, row_ref="rid").summary().collect()[0]
        assert s.holds, preds


def test_dc_testdc_duplicate_rows_violate(dc_df):
    # test_dc_verifier.cpp:56-60: rows (0,1,2,helloworld,...) and (0,1,2,cum deo,...)
    # agree on Col0..Col2 -> DC !(equalities) is violated; ordered-pair count = 2.
    c = dc_check(
        dc_df,
        [("t.c1", "==", "s.c1"), ("s.c2", "==", "t.c2"), ("s.c0", "==", "t.c0")],
        row_ref="rid",
    )
    s = c.summary().collect()[0]
    assert not s.holds and s.n_violating_pairs == 2
    pairs = {(h.rid_s, h.rid_t) for h in c.highlights().collect()}
    assert pairs == {(1, 4), (4, 1)}  # rid is 1-based over the same rows


def test_dc_bernoulli_shifted_columns(spark):
    # test_dc_verifier.cpp:72-76: !(s.A==t.B and s.B==t.C and s.C==t.D) on
    # BernoulliRelation.csv is violated (reference lists pairs {3,4},{3,7},{4,5}).
    rows = [
        (1, 1, 1, 1, 1, 1, 1),
        (2, 0, 0, 0, 1, 1, 1),
        (3, 0, 0, 1, 0, 1, 1),
        (4, 0, 1, 0, 1, 1, 0),
        (5, 0, 1, 1, 0, 0, 1),
        (6, 0, 0, 0, 0, 1, 1),
    ]
    df = spark.createDataFrame(rows, ["rid", "a", "b", "c", "d", "e", "f"])
    s = (
        dc_check(
            df,
            [("s.a", "==", "t.b"), ("s.b", "==", "t.c"), ("s.c", "==", "t.d")],
            row_ref="rid",
        )
        .summary()
        .collect()[0]
    )
    assert not s.holds and s.n_violating_pairs >= 3


def test_dc_salary_inversion_strict_holds(dc1_df):
    # test_dc_verifier.cpp:81-85: strict inequalities -> holds on TestDC1
    s = (
        dc_check(
            dc1_df,
            [
                ("s.salary", "<", "t.salary"),
                ("s.state", "==", "t.state"),
                ("s.fedtaxrate", ">", "t.fedtaxrate"),
            ],
            row_ref="rid",
        )
        .summary()
        .collect()[0]
    )
    assert s.holds


def test_dc_salary_inversion_nonstrict_violated(dc1_df):
    # test_dc_verifier.cpp:86-90: <=/>= version violated by the two Texas rows
    # with equal salary and 0.30 vs 0.31 tax (reference pair {10,11}).
    c = dc_check(
        dc1_df,
        [
            ("s.salary", "<=", "t.salary"),
            ("s.state", "==", "t.state"),
            ("s.fedtaxrate", ">=", "t.fedtaxrate"),
        ],
        row_ref="rid",
    )
    s = c.summary().collect()[0]
    assert not s.holds and s.n_violating_pairs == 1
    h = c.highlights().collect()[0]
    assert (h.rid_s, h.rid_t) == (10, 9)


def test_dc_single_tuple_contradiction_holds(dc1_df):
    # test_dc_verifier.cpp:91-95 and :96-100: self-contradictory single-tuple
    # predicates can never be satisfied -> DC holds.
    for preds in (
        [("s.salary", ">", "t.fedtaxrate"), ("s.salary", "<=", "t.fedtaxrate")],
        [("s.salary", "<", "s.salary"), ("t.state", "!=", "t.state")],
    ):
        s = (
            dc_check(dc1_df, preds, row_ref="rid", allow_cross_join=True)
            .summary()
            .collect()[0]
        )
        assert s.holds, preds
