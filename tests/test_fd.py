"""FD / AFD / PFD golden tests.

Pinned values from the reference's parameterized tests on TestFD.csv
(src/tests/unit/test_fd_verifier.cpp:88-101) plus pandas-oracle cross-validation
on the F1 interleaved-doc fixture (planted FD breaks at duplicated doc_ids).
"""

import pytest

from pyspark_validator.canonical import canonicalize
from pyspark_validator.checks.fd import fd_check
from pyspark_validator.checks.nd import nd_check
from pyspark_validator.oracle import fixtures
from pyspark_validator.oracle.pandas_oracle import (
    afd_oracle,
    fd_oracle,
    nd_oracle,
    pfd_oracle,
)


def _row(df):
    return df.collect()[0]


# reference: FD {4}->{3}: 1 cluster, 2 rows, error 2/132; {3}->{4}: 2 clusters,
# 10 rows, 26/132; {0}->{1}: 1 cluster, 12 rows, 108/132 (test_fd_verifier.cpp:99-101)
@pytest.mark.parametrize(
    "lhs,rhs,n_clusters,n_rows,err_num",
    [
        (["col4"], ["col3"], 1, 2, 2),
        (["col3"], ["col4"], 2, 10, 26),
        (["col0"], ["col1"], 1, 12, 108),
    ],
)
def test_fd_tfd_fails_golden(spark, lhs, rhs, n_clusters, n_rows, err_num):
    df = fixtures.tfd_spark(spark)
    s = _row(fd_check(df, lhs, rhs, num_partitions=4).summary())
    assert not s.holds
    assert s.n_error_clusters == n_clusters
    assert s.n_error_rows == n_rows
    assert s.conflict_pairs == err_num
    assert s.g1_error == pytest.approx(err_num / 132)


@pytest.mark.parametrize(
    "lhs,rhs",
    [
        (["col1"], ["col0"]),
        (["col2"], ["col0"]),
        (["col5"], ["col0", "col1", "col2", "col3", "col4"]),
        (["col2", "col3"], ["col5"]),
    ],
)
def test_fd_tfd_holds_golden(spark, lhs, rhs):
    df = fixtures.tfd_spark(spark)
    s = _row(fd_check(df, lhs, rhs, num_partitions=4).summary())
    assert s.holds
    assert s.n_error_clusters == 0
    assert s.g1_error == 0.0


def test_fd_highlights_golden(spark):
    """FD {4}->{3} highlight: cluster col4='-' (rows 0,8), 2 distinct RHS,
    most-frequent proportion 1/2 (stats_calculator.cpp:61-113)."""
    df = fixtures.tfd_spark(spark)
    h = fd_check(df, ["col4"], ["col3"], num_partitions=4).highlights().collect()
    assert len(h) == 1
    assert h[0].col4 == "-"
    assert h[0].cluster_size == 2
    assert h[0].num_distinct_rhs == 2
    assert h[0].most_frequent_rhs_proportion == pytest.approx(0.5)


def test_fd_highlights_vs_oracle(spark):
    df = fixtures.tfd_spark(spark)
    h = (
        fd_check(df, ["col3"], ["col4"], num_partitions=4)
        .highlights()
        .collect()
    )
    o = fd_oracle(fixtures.tfd_pandas(), ["col3"], ["col4"])
    assert len(h) == o.num_error_clusters
    got = sorted((r.cluster_size, r.num_distinct_rhs) for r in h)
    exp = sorted((len(c), d) for c, d, _ in o.highlights)
    assert got == exp


def test_afd_measures_vs_oracle(spark):
    df = fixtures.tfd_spark(spark)
    pdf = fixtures.tfd_pandas()
    for lhs, rhs in [(["col3"], ["col4"]), (["col1"], ["col2"]), (["col4"], ["col3"])]:
        m = _row(fd_check(df, lhs, rhs, num_partitions=4).afd_measures())
        o = afd_oracle(pdf, lhs, rhs)
        assert m.g1 == pytest.approx(o.g1), (lhs, rhs)
        assert m.pdep == pytest.approx(o.pdep), (lhs, rhs)
        assert m.tau == pytest.approx(o.tau), (lhs, rhs)
        assert m.mu_plus == pytest.approx(o.mu_plus), (lhs, rhs)
        assert m.rho == pytest.approx(o.rho), (lhs, rhs)


def test_pfd_vs_oracle(spark):
    df = fixtures.tfd_spark(spark)
    pdf = fixtures.tfd_pandas()
    for lhs, rhs in [(["col3"], ["col4"]), (["col0"], ["col1"])]:
        c = fd_check(df, lhs, rhs, num_partitions=4)
        o = pfd_oracle(pdf, lhs, rhs)
        t = _row(c.pfd("per_tuple"))
        v = _row(c.pfd("per_value"))
        assert t.error == pytest.approx(o.error_per_tuple), (lhs, rhs)
        assert v.error == pytest.approx(o.error_per_value), (lhs, rhs)
        assert t.n_violating_clusters == o.num_violating_clusters
        assert t.n_violating_rows == o.num_violating_rows


def test_fd_docs_planted(spark):
    """F1: FD doc_id -> span_seq broken exactly at duplicate copies with variant
    spans; closed-form from dup_spans_differ."""
    n_docs = 2000
    docs = fixtures.docs_spark_df(spark, n_docs)
    canon = canonicalize(docs, num_partitions=16, cache=False)
    s = _row(fd_check(canon.df, ["doc_id"], ["span_seq"], num_partitions=16).summary())
    pdf = fixtures.docs_pandas(n_docs)
    pdf["span_seq"] = pdf["spans"].map(
        lambda spans: "\x1e".join(
            "\x1f".join(
                "\x00N" if sp[f] is None else str(sp[f])
                for f in ("kind", "text", "media_ref")
            )
            for sp in spans
        )
    )
    o = fd_oracle(pdf, ["doc_id"], ["span_seq"])
    assert s.holds == o.holds
    assert s.n_error_clusters == o.num_error_clusters
    assert s.n_error_rows == o.num_error_rows
    assert s.g1_error == pytest.approx(o.error)
    # sanity: the break is real (at least one variant-span duplicate exists)
    assert s.n_error_clusters >= 1


def test_nd_check(spark):
    df = fixtures.tfd_spark(spark)
    pdf = fixtures.tfd_pandas()
    # col1 -> col2: each col1 value maps to <= ? distinct col2 values
    holds2, real = nd_oracle(pdf, ["col1"], ["col2"], 2)
    r = _row(nd_check(df, ["col1"], ["col2"], weight=2, num_partitions=4))
    assert r.holds == holds2
    assert r.real_weight == real
    r3 = _row(nd_check(df, ["col1"], ["col2"], weight=real, num_partitions=4))
    assert r3.holds


def test_afd_measures_single_xy_scan(spark, tmp_path):
    """pdep_num is folded into the X-level agg and the Y marginal derives
    from the (X,Y) counts: the afd_measures plan scans the source exactly
    twice (X branch + Y branch), not three times."""
    from pyspark_validator.checks.fd import fd_check

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i % 5, f"y{i % 3}") for i in range(50)], ["x", "y"]
    ).write.parquet(p)
    df = spark.read.parquet(p)
    m = fd_check(df, ["x"], ["y"]).afd_measures()
    explained = m._sc._jvm.PythonSQLUtils.explainString(
        m._jdf.queryExecution(), "formatted"
    )
    import re

    scans = re.findall(r"^\(\d+\) Scan parquet", explained, flags=re.M)
    assert len(scans) == 2, explained[:2000]


def test_pfd_measures_single_pass(spark):
    from pyspark_validator.checks.fd import fd_check

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "c"), (2, "c")], ["x", "y"]
    )
    r = fd_check(df, ["x"], ["y"]).pfd_measures().collect()[0]
    # per_tuple: 1 - (2+2)/5 = 0.2 ; per_value: 1 - (2/3 + 1)/2 = 1/6
    assert abs(r.error_per_tuple - 0.2) < 1e-12
    assert abs(r.error_per_value - (1 - (2 / 3 + 1) / 2)) < 1e-12
    assert r.n_violating_clusters == 1 and r.n_violating_rows == 1
    # the named accessor projects from the same agg
    one = fd_check(df, ["x"], ["y"]).pfd("per_value").collect()[0]
    assert abs(one.error - r.error_per_value) < 1e-15


def test_highlight_sort_modes(spark):
    """fd_verifier.cpp:67-105 sort-mode parity, incl. the typed LHS
    comparator Empty < Null < value (stats_calculator.cpp:12-43)."""
    from pyspark_validator.checks.fd import fd_check

    rows = []
    # clusters keyed by string lhs: '' (empty), None, 'a', 'b'
    for key, ys in [("", ["p", "q"]), (None, ["p", "q", "q"]),
                    ("a", ["p", "q", "r"]), ("b", ["p", "p", "q", "q"])]:
        rows += [(key, y) for y in ys]
    df = spark.createDataFrame(rows, ["x", "y"])
    c = fd_check(df, ["x"], ["y"])

    def col_order(sort_by, ascending, col):
        return [r[col] for r in c.highlights(sort_by=sort_by, ascending=ascending).collect()]

    assert col_order("size", True, "cluster_size") == [2, 3, 3, 4]
    assert col_order("size", False, "cluster_size") == [4, 3, 3, 2]
    assert col_order("num", False, "num_distinct_rhs")[0] == 3
    props = col_order("proportion", True, "most_frequent_rhs_proportion")
    assert props == sorted(props)
    # typed lhs: empty string < NULL < 'a' < 'b'
    assert col_order("lhs", True, "x") == ["", None, "a", "b"]
    assert col_order("lhs", False, "x") == ["b", "a", None, ""]
