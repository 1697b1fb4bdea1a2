"""Skew robustness: a single hot key holding half the table must not break or
distort any path -- the algebraic rollups are map-side combined (skew-immune by
construction) and the violation sampler is salted + capped (bounded memory per
key regardless of cluster size)."""

from pyspark.sql import functions as F

from pyspark_validator.checks.fd import fd_check
from pyspark_validator.checks.ucc import ucc_check


def _hot_df(spark, n=200_000, hot_share=0.5):
    hot = int(n * hot_share)
    return spark.range(n).select(
        F.when(F.col("id") < hot, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k"),
        (F.col("id") % 97).alias("v"),
        F.col("id").alias("rid"),
    )


def test_ucc_summary_and_salted_violations_under_skew(spark):
    df = _hot_df(spark)
    check = ucc_check(df, ["k"], num_partitions=16, row_ref="rid", violation_cap=10)
    s = check.summary().collect()[0]
    assert s.n_rows == 200_000
    assert s.n_violating_clusters == 1
    assert s.n_violating_rows == 100_000
    assert s.violating_pairs == 100_000 * 99_999
    # salted two-phase collect: the 100k-row cluster yields a 10-element,
    # deterministic (smallest rids) sample -- never a 100k-element buffer
    v = check.violations().collect()
    assert len(v) == 1
    assert v[0].cluster_size == 100_000
    assert list(v[0].sample_rows) == sorted(v[0].sample_rows)
    assert len(v[0].sample_rows) == 10
    assert v[0].sample_rows[0] == 0  # deterministic: globally smallest rids


def test_fd_summary_under_skew(spark):
    df = _hot_df(spark)
    s = fd_check(df, ["k"], ["v"], num_partitions=16).summary().collect()[0]
    # HOT maps to 97 distinct v values; all other keys are unique
    assert s.n_error_clusters == 1
    assert s.n_distinct_x == 100_001
    assert s.n_distinct_xy == 100_000 + 97
    assert not s.holds
