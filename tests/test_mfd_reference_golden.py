"""MFD golden tests pinned to the reference's own parameterized cases
(src/tests/unit/test_metric_verifier.cpp:129-168) on its fixture tables
TestLong.csv / TestMetric.csv (test_input_data/). Each case asserts the same
holds/fails verdict the reference's MetricVerifier produces."""

import pytest

# TestLong.csv (First, Second, Third) -- test_input_data/TestLong.csv
LONG_ROWS = [
    (1, 2, 1), (2, 3, 2), (1, 2, 3), (3, 3, 4),
    (3, 4, 5), (2, 2, 7), (5, 2, 7), (5, 3, 8),
]

# TestMetric.csv subset of columns used below (Base1, Base2, Metric1, Metric2,
# Metric3, Metric4, Metric5) -- NULLs kept as None
METRIC_ROWS = [
    (1, 1, -0.1324231, 3.123, -5, "aaaaa", "ewas"),
    (1, 2, 0.223, 0.1233, 10, "aabaa", "seewa"),
    (1, 3, 1.23, 0.23, 63, "aaaa", "esaaw"),
    (1, 4, 4.44, 1.442, 41, "aaaca", "seaaw"),
    (1, 5, 1.223, 0.009, 120, "aaa", "ewas"),
    (1, 4, 0.776101, -1.2, 42, "aaaaa", "seewa"),
    (2, 6, 4.033, -4.1, -500, "ab", None),
    (2, 7, 2.331, -1.23, 20000, "ba", None),
    (2, 8, 3.11, -7.42, 3, "bb", None),
    (2, 4, -0.0001, 0.11, 1100, "aa", "seseaw"),
    (2, 9, 1.003, -0.1, 9, "ac", None),
    (2, 10, 2.31, -0.32, 0, "bc", None),
]
METRIC_COLS = ["b1", "b2", "m1", "m2", "m3", "m4", "m5"]


@pytest.fixture(scope="module")
def long_df(spark):
    return spark.createDataFrame(LONG_ROWS, ["c0", "c1", "c2"])


@pytest.fixture(scope="module")
def metric_df(spark):
    return spark.createDataFrame(METRIC_ROWS, METRIC_COLS)


def _holds(df, lhs, rhs, metric, param, **kw):
    from pyspark_validator.checks.mfd import mfd_check

    return (
        mfd_check(df, lhs, rhs, metric=metric, parameter=param, **kw)
        .summary()
        .collect()[0]
        .holds
    )


# test_metric_verifier.cpp:130-134 (TestLong, euclidean)
@pytest.mark.parametrize(
    "param,lhs,rhs,expected",
    [
        (2, ["c0", "c1"], ["c2"], True),
        (1, ["c0"], ["c1"], True),
        (4, ["c1"], ["c0"], True),
        (5, ["c0"], ["c2"], True),
        (0, ["c2"], ["c1"], True),
    ],
)
def test_mfd_long_euclidean_1d(long_df, param, lhs, rhs, expected):
    assert _holds(long_df, lhs, rhs, "euclidean", param) == expected
    # and the verdict flips just below the exact diameter for the tight cases
    if param in (2, 5):
        assert _holds(long_df, lhs, rhs, "euclidean", param - 0.01) is False


# test_metric_verifier.cpp:157-158 (TestLong, euclidean 2-d, brute & calipers
# agree): delta = sqrt(1^2 + 5^2) for First=2 cluster points (3,2),(2,7)
def test_mfd_long_euclidean_2d(long_df):
    assert _holds(long_df, ["c0"], ["c1", "c2"], "euclidean", 5.0990195135928)
    assert not _holds(long_df, ["c0"], ["c1", "c2"], "euclidean", 5.098)


# test_metric_verifier.cpp:135-139 (TestMetric, euclidean on Metric1/2/3)
@pytest.mark.parametrize(
    "param,lhs,rhs,expected",
    [
        (20500, ["b1"], ["m3"], True),
        (1059, ["b2"], ["m3"], True),
        (1, ["b2", "b1"], ["m3"], True),
        (4.5724231, ["b1"], ["m1"], True),
        (7.53, ["b1"], ["m2"], True),
    ],
)
def test_mfd_metric_euclidean(metric_df, param, lhs, rhs, expected):
    assert _holds(metric_df, lhs, rhs, "euclidean", param) == expected
    assert _holds(metric_df, lhs, rhs, "euclidean", param * 0.999) is False


# test_metric_verifier.cpp:140-144 (TestMetric, levenshtein on Metric4/5)
def test_mfd_metric_levenshtein(metric_df):
    assert _holds(metric_df, ["b1"], ["m4"], "levenshtein", 2)
    assert not _holds(metric_df, ["b1"], ["m4"], "levenshtein", 1)
    assert _holds(metric_df, ["b2"], ["m4"], "levenshtein", 3)
    # Metric5 with NULLs: skipped when dist_from_null_is_infinity=False (:142)
    assert _holds(metric_df, ["b1"], ["m5"], "levenshtein", 4)
    # ...but ANY delta fails when NULL distance is infinite (:143-144)
    assert not _holds(
        metric_df, ["b1"], ["m5"], "levenshtein", 10, dist_from_null_is_infinity=True
    )


def test_mfd_highlight_diameters(metric_df):
    """Cluster diameters pinned from the reference HighlightTestSuite
    (test_metric_verifier.cpp:170-200): our highlight granularity is the
    cluster (its diameter == the max of the reference's per-row distances)."""
    from pyspark_validator.checks.mfd import mfd_check

    # euclidean {0} -> {4} (Metric3): diameters 125 (Base1=1) and 20500 (Base1=2)
    d1 = {
        r["__x0"]: r.diameter
        for r in mfd_check(metric_df, ["b1"], ["m3"], parameter=-1.0)
        .highlights()
        .collect()
    }
    assert d1 == {1: 125.0, 2: 20500.0}

    # euclidean {0} -> {2} (Metric1): 4.572423 and 4.0331
    d2 = {
        r["__x0"]: round(r.diameter, 6)
        for r in mfd_check(metric_df, ["b1"], ["m1"], parameter=-1.0)
        .highlights()
        .collect()
    }
    assert d2 == {1: 4.572423, 2: 4.0331}

    # levenshtein {0} -> {5} (Metric4): both clusters diameter 2
    d3 = {
        r["__x0"]: r.diameter
        for r in mfd_check(
            metric_df, ["b1"], ["m4"], metric="levenshtein", parameter=-1.0
        )
        .highlights()
        .collect()
    }
    assert d3 == {1: 2.0, 2: 2.0}


# ---------------------------------------------------------------------------
# approx path (enums.h:21-22 kApprox, metric_verifier.cpp ApproxVerifyCluster)


def test_mfd_approx_bounds_and_verdict(spark):
    """The 2-approximation judges a cluster by 2 * pivot radius: sound when it
    holds (true diameter <= 2r), conservative when the pivot radius doubles
    past the parameter even though the true diameter is within it."""
    from pyspark_validator.checks.mfd import mfd_check

    # one cluster, strings around pivot 'aaaa' (min Y): lev(aaaa, aabb) = 2,
    # lev(aabb, abbb) = 1 ... true diameter = 3 (aaaa vs abbb).
    df = spark.createDataFrame(
        [(1, "aaaa"), (1, "aabb"), (1, "abbb")], ["k", "s"]
    )
    brute = (
        mfd_check(df, ["k"], ["s"], metric="levenshtein", parameter=3.0, algo="brute")
        .summary().collect()[0]
    )
    assert brute.holds and brute.max_diameter == 3.0
    approx = (
        mfd_check(df, ["k"], ["s"], metric="levenshtein", parameter=3.0, algo="approx")
        .summary().collect()[0]
    )
    # pivot = 'aaaa' (min), radius = 3 (lev to 'abbb') -> upper bound 6 > 3:
    # the approx algorithm reports a violation, like the reference kApprox.
    assert not approx.holds
    assert approx.max_diameter == 6.0
    assert approx.n_approx_clusters == 1
    # with parameter >= 2r the approx path proves the MFD holds
    ok = (
        mfd_check(df, ["k"], ["s"], metric="levenshtein", parameter=6.0, algo="approx")
        .summary().collect()[0]
    )
    assert ok.holds


def test_mfd_auto_resolves_oversized_clusters(spark):
    """auto mode: clusters beyond cluster_cap get an approx answer instead of
    a refusal -- holds is decided for every cluster (no n_oversized block)."""
    from pyspark_validator.checks.mfd import mfd_check

    rows = [(1, f"v{i % 3}") for i in range(50)] + [(2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, ["k", "s"])
    c = mfd_check(
        df, ["k"], ["s"], metric="levenshtein", parameter=10.0,
        cluster_cap=10, algo="auto",
    )
    s = c.summary().collect()[0]
    assert s.n_oversized == 1  # cluster k=1 exceeded the cap
    assert s.n_approx_clusters == 1  # ...and was answered by the 2-approx
    assert s.holds  # radius*2 <= 10 for both clusters
    # brute mode on the same data refuses and blocks holds
    b = mfd_check(
        df, ["k"], ["s"], metric="levenshtein", parameter=10.0,
        cluster_cap=10, algo="brute",
    ).summary().collect()[0]
    assert not b.holds and b.n_oversized == 1


def test_mfd_approx_euclidean_2d(spark):
    from pyspark_validator.checks.mfd import mfd_check

    # square of side 1: true diameter sqrt(2); pivot = (0,0), radius sqrt(2)
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 0.0, 1.0), (1, 1.0, 0.0), (1, 1.0, 1.0)],
        ["k", "x", "y"],
    )
    s = (
        mfd_check(df, ["k"], ["x", "y"], metric="euclidean", parameter=3.0,
                  algo="approx")
        .summary().collect()[0]
    )
    assert s.holds
    assert abs(s.max_diameter - 2 * 2**0.5) < 1e-9
