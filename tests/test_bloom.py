"""Bloom-gated delta-vs-corpus exact dedup (pipelines/bloom.py).

Laws pinned here:
  * exactness: delta_new_rows with a Bloom gate is row-identical to the plain
    anti-join, including under heavy false-positive pressure (a deliberately
    undersized filter);
  * no false negatives: every corpus fingerprint passes its own filter;
  * OR-mergeability: words(A) merged with words(B) == words(A union B);
  * plan: the gate path adds no Exchange before the verify join.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.bloom import (
    bloom_array,
    bloom_gate,
    bloom_words,
    content_hash_index,
    delta_new_rows,
    merge_bloom_words,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"document number {i} with body {i % 7}") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id bigint, text string").persist()


@pytest.fixture(scope="module")
def delta(spark, corpus):
    # 30 exact copies (normalized-equal: extra whitespace + case changes),
    # 40 genuinely new docs
    copies = corpus.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.upper(F.concat(F.lit("  "), F.col("text"))).alias("text"),
    )
    new = corpus.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" fresh suffix")).alias("text"),
    )
    return copies.unionByName(new).persist()


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_gate_result_equals_plain_anti_join(spark, corpus, delta):
    idx = content_hash_index(corpus).persist()
    m, k = 1 << 16, 5
    arr = bloom_array(bloom_words(idx, num_bits=m, num_hashes=k), m)
    plain = delta_new_rows(delta, idx)
    gated = delta_new_rows(delta, idx, bloom=arr, num_bits=m, num_hashes=k)
    assert _ids(gated) == _ids(plain)
    # and the survivors are exactly the planted-new rows
    assert _ids(plain) == sorted(
        r["doc_id"] for r in delta.filter(F.col("doc_id") >= 2000).collect()
    )
    assert gated.columns == delta.columns


def test_exact_under_false_positive_pressure(spark, corpus, delta):
    # 64 bits for 200 distinct keys: the filter is saturated, nearly every
    # delta row becomes a suspect -- the verify join must still be exact.
    idx = content_hash_index(corpus)
    m, k = 64, 2
    arr = bloom_array(bloom_words(idx, num_bits=m, num_hashes=k), m)
    gated = delta_new_rows(delta, idx, bloom=arr, num_bits=m, num_hashes=k)
    assert _ids(gated) == _ids(delta_new_rows(delta, idx))


def test_no_false_negatives(spark, corpus):
    idx = content_hash_index(corpus)
    m, k = 1 << 14, 7
    arr = bloom_array(bloom_words(idx, num_bits=m, num_hashes=k), m)
    g = bloom_gate(idx, arr, m, k, key_col="content_fp")
    assert g.filter(~F.col("maybe_seen")).count() == 0


def test_fpp_is_small_when_sized(spark, corpus):
    # 2^16 bits / 200 keys, k=7: fpp ~ (1 - e^{-kn/m})^k ~ 1e-13 -- expect
    # zero false positives on 1000 fresh probes.
    idx = content_hash_index(corpus)
    m, k = 1 << 16, 7
    arr = bloom_array(bloom_words(idx, num_bits=m, num_hashes=k), m)
    fresh = corpus.sparkSession.range(1000).select(
        F.xxhash64(F.concat(F.lit("unseen-"), F.col("id"))).alias("content_fp")
    )
    g = bloom_gate(fresh, arr, m, k, key_col="content_fp")
    assert g.filter(F.col("maybe_seen")).count() == 0


def test_merge_law(spark, corpus):
    m, k = 1 << 14, 5
    a = corpus.filter(F.col("doc_id") < 100)
    b = corpus.filter(F.col("doc_id") >= 100)
    merged = merge_bloom_words(
        bloom_words(content_hash_index(a), num_bits=m, num_hashes=k),
        bloom_words(content_hash_index(b), num_bits=m, num_hashes=k),
    )
    whole = bloom_words(content_hash_index(corpus), num_bits=m, num_hashes=k)
    assert np.array_equal(bloom_array(merged, m), bloom_array(whole, m))


def test_gate_plan_is_exchange_free(spark, corpus):
    m, k = 1 << 14, 5
    arr = bloom_array(bloom_words(content_hash_index(corpus), num_bits=m, num_hashes=k), m)
    probe = corpus.select(F.xxhash64("text").alias("content_fp"))
    plan = (
        bloom_gate(probe, arr, m, k, key_col="content_fp")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
