"""Numerical-dependency validation.

Reference (nd/nd_verifier/nd_verifier.h:22-40): ND X ->(w) Y holds iff every X value
maps to at most w distinct Y values; the 'real weight' is the max distinct-Y count
over X clusters. Spark: one groupBy(X, Y) -> groupBy(X) chain (same single-shuffle
plan as FD; n_distinct_y per X), then an algebraic rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_validator.canonical import NullMode
from pyspark_validator.checks.fd import fd_check


def nd_check(
    df: DataFrame,
    lhs: list[str],
    rhs: list[str],
    weight: int,
    num_partitions: int = 64,
    null_mode: NullMode = NullMode.EQUAL,
) -> DataFrame:
    """Single-row: holds / real_weight / n_violating_clusters (X values exceeding w)
    / n_violating_rows."""
    x_level = fd_check(
        df, lhs, rhs, num_partitions=num_partitions, null_mode=null_mode
    )._x_level
    over = F.col("n_distinct_y") > weight
    return x_level.agg(
        F.max("n_distinct_y").alias("real_weight"),
        F.sum(over.cast("long")).alias("n_violating_clusters"),
        F.sum(F.when(over, F.col("cx")).otherwise(0)).alias("n_violating_rows"),
    ).select(
        (F.col("real_weight") <= weight).alias("holds"),
        "real_weight",
        "n_violating_clusters",
        "n_violating_rows",
    )
