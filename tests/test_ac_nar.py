"""AC + NAR golden tests.

AC range goldens replicate src/tests/unit/test_ac_algorithm.cpp with
fuzziness=0 (full-data mode: CalculateSampleSize returns n_rows, so the
reference's sampling loop is deterministic and our full-scan clustering
must agree exactly). NAR quality goldens are hand-computed from the
CalcQualities formula (nar/nar.cpp:10-24).
"""

import pytest

from pyspark.sql import functions as F

from pyspark_validator.checks.ac import ACSuite, _merge_to_limit, ac_check
from pyspark_validator.checks.nar import nar_check
from pyspark_validator.io import read_reference_csv

IRIS = "/root/reference/examples/datasets/iris.csv"
ZEROS = "/root/reference/test_input_data/TestZeros.csv"
NULLEMPTY = "/root/reference/test_input_data/NullEmpty.csv"


@pytest.fixture(scope="module")
def iris(spark):
    df = spark.read.csv(IRIS, header=False, inferSchema=False)
    return df.select(
        *[F.col(f"_c{i}").cast("double").alias(f"c{i}") for i in range(4)], "_c4"
    )


@pytest.fixture(scope="module")
def zeros(spark):
    df = read_reference_csv(spark, ZEROS)
    return df.select(*[F.col(c).try_cast("long").alias(c) for c in df.columns])


def _ranges(check):
    return [(r["lo"], r["hi"]) for r in check.ranges().orderBy("lo").collect()]


def assert_ranges(got, expected):
    assert len(got) == len(expected)
    for (glo, ghi), (elo, ehi) in zip(got, expected):
        assert glo == pytest.approx(elo, rel=1e-9, abs=1e-12)
        assert ghi == pytest.approx(ehi, rel=1e-9, abs=1e-12)


class TestACReferenceGoldens:
    def test_addition_iris_0_2(self, iris):
        # NonFuzzyBumpsDetection1
        got = _ranges(ac_check(iris, "c0", "c2", "+", weight=0.05))
        assert_ranges(got, [(5.4, 7.4), (8.1, 8.5), (9.1, 14.6)])

    def test_addition_iris_2_3(self, iris):
        # NonFuzzyBumpsDetection2
        got = _ranges(ac_check(iris, "c2", "c3", "+", weight=0.05))
        assert_ranges(got, [(1.2, 2.3), (4.1, 9.2)])

    def test_subtraction_iris_1_3(self, iris):
        # SubNonFuzzy (default weight 0.1)
        got = _ranges(ac_check(iris, "c1", "c3", "-", weight=0.1))
        assert_ranges(got, [(0.3, 2.0), (2.7, 4.0)])

    def test_multiplication_iris_2_3(self, iris):
        # MulNonFuzzy
        got = _ranges(ac_check(iris, "c2", "c3", "*", weight=0.1))
        assert_ranges(got, [(0.11, 0.96), (3.3, 15.87)])

    def test_division_zeros(self, zeros):
        # DivNonFuzzy: integer division, zero divisors skipped
        assert_ranges(
            _ranges(ac_check(zeros, "First", "Second", "/")), [(0, 1), (10, 10)]
        )
        assert_ranges(
            _ranges(ac_check(zeros, "Second", "First", "/")), [(0, 0), (1, 1)]
        )
        assert_ranges(_ranges(ac_check(zeros, "First", "Third", "/")), [(1, 1)])
        assert_ranges(
            _ranges(ac_check(zeros, "Third", "First", "/")), [(0, 0), (1, 1)]
        )

    def test_null_and_empty_ignoring(self, spark):
        # NullAndEmptyIgnoring: null/empty operands drop the row-pair
        df = read_reference_csv(spark, NULLEMPTY)
        df = df.select(*[F.col(c).try_cast("long").alias(c) for c in df.columns])
        suite = ACSuite(df, "+")
        assert len(suite.pairs()) == 6  # all 4 columns are Int-typed
        cols = df.columns
        assert_ranges(_ranges(suite.check(cols[0], cols[1])), [(3, 3)])
        assert_ranges(_ranges(suite.check(cols[0], cols[2])), [(4, 4)])
        assert_ranges(_ranges(suite.check(cols[0], cols[3])), [(2, 2)])

    def test_division_pairs_both_directions(self, zeros):
        pairs = ACSuite(zeros, "/").pairs()
        assert ("First", "Second") in pairs and ("Second", "First") in pairs
        assert len(pairs) == 6  # 3 unordered int pairs x 2 directions


class TestACExceptions:
    def test_exceptions_outside_ranges(self, zeros):
        check = ac_check(zeros, "First", "Second", "/")
        exc = check.exceptions(["First"], ranges=[(0.0, 1.0)]).collect()
        assert [(r["First"], r["res"]) for r in exc] == [(20, 10.0)]

    def test_borders_inclusive(self, spark):
        # ValueBelongsToRanges: equality with either border is inside
        df = spark.createDataFrame(
            [(1, 1.0, 2.0), (2, 5.0, 0.0), (3, 3.0, 3.01)], "id long, a double, b double"
        )
        exc = ac_check(df, "a", "b", "+").exceptions(
            ["id"], ranges=[(3.0, 5.0), (6.01, 6.01)]
        )
        assert [r["id"] for r in exc.collect()] == []

    def test_own_full_data_ranges_have_no_exceptions(self, iris):
        check = ac_check(iris, "c0", "c2", "+", weight=0.05)
        assert check.exceptions(["c0"]).count() == 0

    def test_exception_rows_rollup(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0, 1.0, 1.0), (2, 100.0, 1.0, 100.0)],
            "id long, a double, b double, c double",
        )
        suite = ACSuite(df, "+", columns=["a", "b", "c"])
        rows = suite.exception_rows(
            ["id"],
            {
                ("a", "b"): [(0.0, 3.0)],
                ("a", "c"): [(0.0, 3.0)],
                ("b", "c"): [(0.0, 300.0)],
            },
        ).collect()
        assert len(rows) == 1
        (row,) = rows
        assert row["id"] == 2
        assert [(p["lhs"], p["rhs"]) for p in row["column_pairs"]] == [
            ("a", "b"),
            ("a", "c"),
        ]

    def test_degenerate_inputs(self, spark):
        df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
        assert _ranges(ac_check(df, "a", "b", "+")) == []  # <2 pairs -> no ranges
        two = spark.createDataFrame([(1.0, 2.0), (1.0, 2.0)], "a double, b double")
        assert_ranges(_ranges(ac_check(two, "a", "b", "+")), [(3.0, 3.0)])

    def test_weight_one_single_range(self, iris):
        got = _ranges(ac_check(iris, "c0", "c2", "+", weight=1.0))
        assert_ranges(got, [(5.4, 14.6)])


class TestRestrictRangesAmount:
    def test_merges_closest_first(self):
        got = _merge_to_limit([(0, 1), (2, 3), (10, 11)], 2)
        assert got == [(0, 3), (10, 11)]

    def test_single_range_kept(self):
        assert _merge_to_limit([(0, 1)], 1) == [(0, 1)]

    def test_no_limit(self):
        r = [(0, 1), (5, 6)]
        assert _merge_to_limit(r, 0) == r


class TestNAR:
    @pytest.fixture(scope="class")
    def df(self, spark):
        rows = [
            ("a", 10.0, 1),
            ("a", 20.0, 1),
            ("a", 30.0, 0),
            ("b", 15.0, 1),
            ("b", 50.0, 0),
        ]
        return spark.createDataFrame(rows, "cat string, x double, y long")

    def test_qualities_golden(self, df):
        # ante: cat in {a}; cons: x in [0, 25] -> fits rows 1,2 of 3 ante rows
        q = nar_check(df, {"cat": ["a"]}, {"x": (0.0, 25.0)}).qualities().collect()[0]
        assert q["n_rows"] == 5 and q["n_fit_ante"] == 3 and q["n_fit_both"] == 2
        assert q["support"] == pytest.approx(2 / 5)
        assert q["confidence"] == pytest.approx(2 / 3)
        assert q["fitness"] == pytest.approx((2 / 3 + 2 / 5 + 2 / 3) / 3)

    def test_multi_condition_ante(self, df):
        q = (
            nar_check(df, {"cat": ["a", "b"], "x": (10.0, 20.0)}, {"y": (1, 1)})
            .qualities()
            .collect()[0]
        )
        assert q["n_fit_ante"] == 3 and q["n_fit_both"] == 3
        assert q["confidence"] == pytest.approx(1.0)
        assert q["fitness"] == pytest.approx((1.0 + 3 / 5 + 1.0) / 3)

    def test_zero_guards(self, df):
        q = nar_check(df, {"cat": ["zzz"]}, {"x": (0.0, 1.0)}).qualities().collect()[0]
        assert (q["support"], q["confidence"], q["fitness"]) == (0.0, 0.0, 0.0)
        q = nar_check(df, {}, {"x": (0.0, 1.0)}).qualities().collect()[0]
        assert (q["support"], q["confidence"], q["fitness"]) == (0.0, 0.0, 0.0)

    def test_null_fits_nothing(self, spark):
        df = spark.createDataFrame([(None, 1.0), ("a", 2.0)], "cat string, x double")
        q = nar_check(df, {"cat": ["a"]}, {"x": (0.0, 5.0)}).qualities().collect()[0]
        assert q["n_fit_ante"] == 1 and q["n_fit_both"] == 1

    def test_violations(self, df):
        v = nar_check(df, {"cat": ["a"]}, {"x": (0.0, 25.0)}).violations().collect()
        assert [r["x"] for r in v] == [30.0]


class TestAcCompatAndSuite:
    def test_ac_algorithm_facade(self, spark):
        import pandas as pd

        from pyspark_validator.compat import AcAlgorithm

        algo = AcAlgorithm(spark)
        algo.load_data(
            pd.DataFrame({"a": [1.0, 2.0, 3.0, 100.0], "b": [1.0, 2.0, 3.0, 100.0]})
        )
        # full-data mode: ranges cover everything, exceptions empty
        algo.execute(bin_operation="+", weight=0.1)
        ranges = algo.get_ranges_by_columns(0, 1)
        assert ranges.ranges == [(2.0, 6.0), (200.0, 200.0)]
        assert algo.get_ac_exceptions() == []
        # sampled mode: the value-hash sample drops some results -> rows whose
        # result falls outside the sampled ranges surface as exceptions
        algo.execute(bin_operation="+", weight=0.1, sample_fraction=0.5)
        for exc in algo.get_ac_exceptions():
            assert exc.column_pairs == [(0, 1)]

    def test_suite_ac_nar_kinds(self, spark):
        from pyspark.sql import functions as F

        from pyspark_validator.runner import CheckSpec, ValidationSuite

        docs = spark.createDataFrame(
            [(f"d{i}", [("text", f"t{i}", None, 0)]) for i in range(20)],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
        )
        suite = ValidationSuite(spark, docs, num_partitions=4)
        res = suite.run(
            [
                CheckSpec(
                    name="ac_len",
                    kind="custom",
                    fn=lambda df: __import__(
                        "pyspark_validator.checks.ac", fromlist=["ac_check"]
                    )
                    .ac_check(
                        df.withColumn("ln", F.length("span_seq").cast("double"))
                        .withColumn("ln2", F.col("ln") * 2),
                        "ln",
                        "ln2",
                        "+",
                    )
                    .exceptions(["doc_id"], ranges=[(0.0, 1e6)])
                    .agg(F.count(F.lit(1)).alias("n_exceptions"))
                    .select(
                        (F.col("n_exceptions") == 0).alias("holds"),
                        "n_exceptions",
                    )
                    .withColumn("partition_id", F.lit(0)),
                ),
                CheckSpec(
                    name="nar_kind",
                    kind="nar",
                    params={
                        "ante": {"span_key": (0, 10**18)},
                        "cons": {"span_key": (0, 10**18)},
                        "min_confidence": 1.0,
                    },
                ),
            ]
        )
        assert res["ac_len"].collect()[0].holds
        assert res["nar_kind"].collect()[0].holds

    def test_suite_ac_kind(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        from pyspark_validator.runner import CheckSpec, ValidationSuite

        docs = spark.createDataFrame(
            [(f"d{i}", [("text", "x" * (i + 1), None, 0)]) for i in range(10)],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
        )
        suite = ValidationSuite(spark, docs, num_partitions=2)
        out = suite.run(
            [
                CheckSpec(
                    name="ac_span",
                    kind="ac",
                    params={
                        "lhs": "span_key",
                        "rhs": "span_key",
                        "binop": "-",
                        "ranges": [(0.0, 0.0)],  # x - x == 0 always
                    },
                )
            ]
        )
        rows = out["ac_span"].collect()
        assert len(rows) >= 1  # one verdict per populated partition
        assert all(r.holds and r.n_exceptions == 0 for r in rows)
        assert len({r.partition_id for r in rows}) == len(rows)


def test_suite_all_ranges_parallel(spark):
    df = spark.createDataFrame(
        [(float(i), float(i), float(100 + i)) for i in range(20)],
        "a double, b double, c double",
    )
    suite = ACSuite(df, "+", columns=["a", "b", "c"])
    rows = suite.all_ranges(parallelism=3).orderBy("lhs", "rhs", "lo").collect()
    got = {(r["lhs"], r["rhs"]): (r["lo"], r["hi"]) for r in rows}
    assert got[("a", "b")] == (0.0, 38.0)
    assert got[("a", "c")] == (100.0, 138.0)
    assert got[("b", "c")] == (100.0, 138.0)


def test_overflow_rows_skipped_not_fatal(spark):
    big = (1 << 62)
    df = spark.createDataFrame(
        [(big, big), (1, 2), (2, 3)], "a long, b long"
    )
    # ANSI mode would abort the job on the overflowing (big, big) pair;
    # try_* arithmetic skips it
    got = _ranges(ac_check(df, "a", "b", "+"))
    assert got == [(3.0, 3.0), (5.0, 5.0)]  # overflow pair gone, delta splits the rest


def test_ranges_invariant_to_bucket_count(spark, request):
    iris_df = request.getfixturevalue("iris")
    expected = _ranges(ac_check(iris_df, "c0", "c2", "+", weight=0.05, num_partitions=64))
    for p in (1, 3, 17):
        got = _ranges(ac_check(iris_df, "c0", "c2", "+", weight=0.05, num_partitions=p))
        assert got == expected, f"num_partitions={p}"


def test_nar_json_spec_condition_forms(spark):
    """JSON suite specs cannot distinguish tuples from lists: the explicit
    {"between": ...} / {"in": ...} dict forms must behave identically."""
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 90.0), ("b", 10.0)], "cat string, x double"
    )
    native = (
        nar_check(df, {"cat": ["a"]}, {"x": (0.0, 50.0)}).qualities().collect()[0]
    )
    json_form = (
        nar_check(df, {"cat": {"in": ["a"]}}, {"x": {"between": [0.0, 50.0]}})
        .qualities()
        .collect()[0]
    )
    assert native == json_form
    with pytest.raises(ValueError, match="between"):
        nar_check(df, {"cat": {"oops": 1}}, {"x": (0, 1)}).qualities()
