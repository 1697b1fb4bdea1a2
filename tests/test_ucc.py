"""UCC golden tests.

Pinned expectations from the reference's parameterized tests
(src/tests/unit/test_ucc_verifier.cpp:81-96 on TestFD.csv) plus pandas-oracle
cross-validation on the F1 interleaved-doc fixture with planted duplicates.
"""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.canonical import NullMode, canonicalize
from pyspark_validator.checks.ucc import ucc_check
from pyspark_validator.oracle import fixtures
from pyspark_validator.oracle.pandas_oracle import ucc_oracle


def _summary(check):
    return check.summary().collect()[0]


# --- F2 golden values (test_ucc_verifier.cpp:84-95); TestFD.csv cols are 1-indexed
# in FIXTURES.md as 0-based indices {0},{0,1},{0,1,2},all.
@pytest.mark.parametrize(
    "cols,n_clusters,n_rows,pairs",
    [
        (["col0"], 1, 12, 12 * 11),  # UCC {0}: one cluster of all 12 rows
        (["col0", "col1"], 4, 12, 4 * 3 * 2),  # 4 triples
        (["col0", "col1", "col2"], 4, 8, 4 * 2 * 1),  # 4 pairs
        (["col0", "col1", "col2", "col3", "col4", "col5"], 3, 6, 3 * 2 * 1),
    ],
)
def test_ucc_tfd_golden(spark, cols, n_clusters, n_rows, pairs):
    df = fixtures.tfd_spark(spark)
    s = _summary(ucc_check(df, cols, num_partitions=4))
    assert s.n_violating_clusters == n_clusters
    assert s.n_violating_rows == n_rows
    assert s.violating_pairs == pairs
    assert s.aucc_error == pytest.approx(pairs / (12 * 11))
    assert not s.holds


def test_ucc_holds(spark):
    df = fixtures.tfd_spark(spark)
    s = _summary(ucc_check(df, ["col5"], num_partitions=4))
    # col5 has duplicates (4,4),(6,6),(8,8) -> does NOT hold; row_id does
    assert not s.holds
    s2 = _summary(ucc_check(df, ["row_id"], num_partitions=4))
    assert s2.holds
    assert s2.n_violating_clusters == 0
    assert s2.aucc_error == 0.0


def test_ucc_docs_planted_duplicates(spark):
    """F1: 2000 docs -> doc 0 tripled, doc 1000 doubled; exact closed-form counts."""
    n_docs = 2000
    docs = fixtures.docs_spark_df(spark, n_docs)
    canon = canonicalize(docs, num_partitions=16)
    check = ucc_check(canon.df, ["doc_id"], num_partitions=16, partition_key="doc_id")
    s = _summary(check)
    n = n_docs + 3  # 2000 + 2 extra (doc 0) + 1 extra (doc 1000)
    assert s.n_rows == n
    assert s.n_violating_clusters == 2
    assert s.n_violating_rows == 5
    assert s.violating_pairs == 3 * 2 + 2 * 1
    assert s.aucc_error == pytest.approx((3 * 2 + 2 * 1) / (n * (n - 1)))

    # violations: exact clusters, sample capped + deterministic
    viol = check.violations().orderBy("doc_id").collect()
    assert [v.doc_id for v in viol] == ["doc_%012d" % 0, "doc_%012d" % 1000]
    assert [v.cluster_size for v in viol] == [3, 2]

    # cross-validate against the pandas oracle on identical rows
    pdf = fixtures.docs_pandas(n_docs)
    o = ucc_oracle(pdf, ["doc_id"])
    assert o.num_violating_clusters == s.n_violating_clusters
    assert o.num_violating_rows == s.n_violating_rows
    assert o.aucc_error == pytest.approx(s.aucc_error)
    canon.unpersist()


def test_ucc_span_seq_duplicate_semantics(spark):
    """The per-row invariant: span-sequence equality on (kind, text, media_ref, order).

    Duplicate copies with variant spans must NOT collide on span_seq; identical
    copies MUST. Verified via UCC on (doc_id, span_seq)."""
    n_docs = 2000
    docs = fixtures.docs_spark_df(spark, n_docs)
    canon = canonicalize(docs, num_partitions=16)
    s = _summary(
        ucc_check(canon.df, ["doc_id", "span_seq"], num_partitions=16)
    )
    # exact check against oracle
    pdf = fixtures.docs_pandas(n_docs)
    pdf["span_seq"] = pdf["spans"].map(
        lambda spans: "\x1e".join(
            "\x1f".join("\x00N" if s[f] is None else str(s[f]) for f in ("kind", "text", "media_ref"))
            for s in spans
        )
    )
    o = ucc_oracle(pdf, ["doc_id", "span_seq"])
    assert s.n_violating_clusters == o.num_violating_clusters
    assert s.n_violating_rows == o.num_violating_rows
    canon.unpersist()


def test_ucc_null_modes(spark):
    df = fixtures.nulls_edge_spark(spark)
    # NullMode.EQUAL: nulls group together -> 'a' has clusters x:2, null:2, "":2 -> 3 clusters
    s_eq = _summary(ucc_check(df, ["a"], null_mode=NullMode.EQUAL, num_partitions=4))
    assert s_eq.n_violating_clusters == 4  # x(2), NULLnull(2), ""(2), y(2)
    assert s_eq.n_violating_rows == 8
    # NullMode.UNEQUAL: each NULL unique -> null cluster disappears
    s_ne = _summary(ucc_check(df, ["a"], null_mode=NullMode.UNEQUAL, num_partitions=4))
    assert s_ne.n_violating_clusters == 3  # x, "", y
    assert s_ne.n_violating_rows == 6
    # empty string and literal "NULL" are values, never null (builtin.h:36-40)
    s_b = _summary(ucc_check(df, ["b"], null_mode=NullMode.UNEQUAL, num_partitions=4))
    o = ucc_oracle(
        __import__("pandas").DataFrame(
            fixtures.NULLS_EDGE_ROWS, columns=["a", "b"]
        ),
        ["b"],
        nulls_equal=False,
    )
    assert s_b.n_violating_clusters == o.num_violating_clusters


def test_ucc_per_partition_verdicts_stable(spark):
    """Verdicts keyed by pmod(xxhash64(key), P) must not depend on parallelism."""
    docs = fixtures.docs_spark_df(spark, 500)
    canon = canonicalize(docs, num_partitions=8, cache=False)
    v1 = (
        ucc_check(canon.df, ["doc_id"], num_partitions=8, partition_key="doc_id")
        .verdicts()
        .orderBy("partition_id")
        .collect()
    )
    v2 = (
        ucc_check(
            canon.df.repartition(3), ["doc_id"], num_partitions=8, partition_key="doc_id"
        )
        .verdicts()
        .orderBy("partition_id")
        .collect()
    )
    assert v1 == v2
