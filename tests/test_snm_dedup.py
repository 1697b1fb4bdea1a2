"""Sorted-neighborhood-method dedup blocking (the reference's expert
dedupe scenario, examples/expert/dedupe.py: sort by mined-AFD LHS values,
compare each row to its window-1 successors).

Closed-form checks: the pair set under ORDER BY (key, id) is exactly
{(i, j) : 0 < rank_j - rank_i < window}, independent of partitioning; the
global ranks are a permutation of [0, n); ties order by id."""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.dedup import (
    snm_dedup_candidates,
    sorted_neighborhood_pairs,
)


def _expected_pairs(ids_sorted, window):
    out = set()
    for i in range(len(ids_sorted)):
        for j in range(i + 1, min(i + window, len(ids_sorted))):
            out.add((ids_sorted[i], ids_sorted[j]))
    return out


def test_snm_pairs_match_closed_form(spark):
    rows = [(f"d{i:02d}", f"k{(i * 7) % 10}") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "key"])
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, "key", window=3, id_col="doc_id", partitions=4
        ).collect()
    }
    ids_sorted = [i for i, _ in sorted(rows, key=lambda t: (t[1], t[0]))]
    assert got == _expected_pairs(ids_sorted, 3)
    # n-1 + n-2 pairs for window 3
    assert len(got) == 19 + 18


def test_snm_ranks_are_a_permutation(spark):
    from pyspark_validator.pipelines.dedup import _global_ranks

    df = spark.createDataFrame(
        [(f"r{i}", i % 5) for i in range(57)], ["doc_id", "v"]
    )
    ranked = _global_ranks(df, F.col("v"), "doc_id", partitions=8)
    ranks = sorted(r["__rank"] for r in ranked.collect())
    assert ranks == list(range(57))
    # equal keys order by id: ranks within each v group are contiguous
    by_key = (
        ranked.join(df, on=ranked["id"] == df["doc_id"])
        .groupBy("v")
        .agg(F.min("__rank").alias("lo"), F.max("__rank").alias("hi"),
             F.count(F.lit(1)).alias("c"))
        .collect()
    )
    for r in by_key:
        assert r["hi"] - r["lo"] + 1 == r["c"]


def test_snm_window_edge_cases(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["doc_id", "v"])
    got = sorted_neighborhood_pairs(df, "v", window=2, id_col="doc_id").collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [("a", "b")]
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "v", window=1, id_col="doc_id")


def test_snm_dedup_candidates_blocks_planted_duplicates(spark):
    # near-duplicates share the (name, city) sort key prefix and land in one
    # window regardless of their row ids
    rows = [
        ("x1", "ann", "rome", 30),
        ("zz", "bob", "kyiv", 40),
        ("x2", "ann", "rome", 31),
        ("qq", "cat", "lima", 50),
        ("x3", "ann", "rome", 30),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "name", "city", "age"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in snm_dedup_candidates(
            df, ["name", "city"], window=3, id_col="doc_id"
        ).collect()
    }
    assert {("x1", "x2"), ("x1", "x3"), ("x2", "x3")} <= pairs
    # the SNM window slides across key boundaries by design (zz/qq are rank
    # neighbors), but rank distance >= window is excluded: x1 (rank 0) never
    # meets zz (rank 3) or qq (rank 4)
    assert ("x1", "zz") not in pairs and ("x1", "qq") not in pairs
