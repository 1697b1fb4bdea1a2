"""Prefix-filtered exact Jaccard join (SSJoin/PPJoin family).

Correctness contract: identical output to the full inverted-index exact join
(ngram_jaccard_pairs without max_df pruning) — prefix filtering is a
candidate-pruning technique, never a semantics change."""

import random

import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.dedup import (
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
)


def _random_docs(n=40, vocab=30, length=25, seed=7):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for i in range(n):
        base = [rng.choice(words) for _ in range(length)]
        docs.append((i, " ".join(base)))
        if i % 5 == 0:  # plant a near-duplicate: one word swapped
            mutated = list(base)
            mutated[rng.randrange(length)] = rng.choice(words)
            docs.append((i + 10000, " ".join(mutated)))
    return docs


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_prefix_join_equals_full_inverted_index(spark, threshold):
    df = spark.createDataFrame(_random_docs(), ["doc_id", "text"])
    full = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            df, k=3, threshold=threshold, max_df=2**31 - 1
        ).collect()
    }
    pref = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in prefix_jaccard_pairs(df, k=3, threshold=threshold).collect()
    }
    assert pref == full
    assert len(pref) > 0  # the planted near-dups make this non-vacuous


def test_prefix_join_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon")],
        ["doc_id", "text"],
    )
    rows = prefix_jaccard_pairs(df, k=3, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]


def test_prefix_join_threshold_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="threshold"):
        prefix_jaccard_pairs(df, threshold=0.0)


def test_prefix_index_is_smaller_than_full(spark):
    # the structural claim behind the scale argument: at t=0.9 the prefix
    # table holds ~(1-t) of the shingle rows; check it directly on the
    # intermediate (re-derive prefix length from the operator's formula)
    docs = spark.createDataFrame(_random_docs(n=20), ["doc_id", "text"])
    from pyspark_validator.pipelines.dedup import _shingles

    sizes = docs.select(
        F.size(_shingles(F.col("text"), 3)).alias("n")
    ).collect()
    import math

    t = 0.9
    full = sum(r["n"] for r in sizes)
    prefix = sum(r["n"] - math.ceil(t * r["n"]) + 1 for r in sizes)
    assert prefix < 0.25 * full


def test_prefix_cross_join_matches_brute_force(spark):
    from pyspark_validator.pipelines.dedup import _shingles, prefix_jaccard_join

    left = spark.createDataFrame(_random_docs(n=25, seed=3), ["doc_id", "text"])
    right = spark.createDataFrame(_random_docs(n=25, seed=9), ["doc_id", "text"])
    got = {
        (r["id_l"], r["id_r"], round(r["jaccard"], 9))
        for r in prefix_jaccard_join(left, right, k=3, threshold=0.5).collect()
    }

    def sets(df):
        return {
            r["doc_id"]: set(r["s"])
            for r in df.select("doc_id", _shingles(F.col("text"), 3).alias("s")).collect()
        }

    ls, rs = sets(left), sets(right)
    want = set()
    for li, a in ls.items():
        for ri, b in rs.items():
            j = len(a & b) / len(a | b)
            if j >= 0.5:
                want.add((li, ri, round(j, 9)))
    assert got == want


def _boilerplate_docs(n=30, seed=11):
    """Docs sharing a long boilerplate header (hot prefix shingles at low t)
    plus planted EXACT duplicates (LSH catches identical signatures with
    probability 1, so the prescreen law below is deterministic)."""
    rng = random.Random(seed)
    boiler = "terms of service apply to all content herein respectively"
    docs = []
    for i in range(n):
        tail = " ".join(f"u{i}x{j}{rng.randrange(99)}" for j in range(12))
        docs.append((i, boiler + " " + tail))
        if i % 3 == 0:
            docs.append((i + 10000, boiler + " " + tail))  # exact duplicate
    return docs


def test_prefix_budget_raise_is_descriptive_and_preflight(spark):
    df = spark.createDataFrame(_boilerplate_docs(), ["doc_id", "text"])
    with pytest.raises(ValueError, match="candidate_budget") as ei:
        prefix_jaccard_pairs(df, k=3, threshold=0.5, candidate_budget=5)
    # the message carries the estimate and the remediation options
    assert "prescreen" in str(ei.value) and "minhash_lsh_pairs" in str(ei.value)


def test_prefix_budget_under_budget_identical_to_default(spark):
    df = spark.createDataFrame(_random_docs(), ["doc_id", "text"])
    base = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in prefix_jaccard_pairs(df, k=3, threshold=0.5).collect()
    }
    got, report = prefix_jaccard_pairs(
        df, k=3, threshold=0.5, candidate_budget=10**12, return_report=True
    )
    got = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in got.collect()}
    assert got == base
    assert report["hot_df_cap"] is None  # budget not breached -> exact path
    assert report["estimated_exact_candidates"] >= len(base)


def test_prefix_budget_prescreen_recovers_planted_dups(spark):
    """Forcing the tiniest budget routes the boilerplate shingles through the
    MinHash prescreen; exact duplicates (identical signatures) MUST all
    survive, and every emitted pair is exactly verified (jaccard >= t)."""
    df = spark.createDataFrame(_boilerplate_docs(), ["doc_id", "text"])
    full = {
        (r["id_a"], r["id_b"])
        for r in prefix_jaccard_pairs(df, k=3, threshold=0.9).collect()
    }
    planted = {(i, i + 10000) for i in range(0, 30, 3)}
    assert planted <= full
    got, report = prefix_jaccard_pairs(
        df,
        k=3,
        threshold=0.9,
        candidate_budget=1,
        on_budget="prescreen",
        return_report=True,
    )
    rows = got.collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert planted <= pairs  # exact dups never lost by the prescreen
    assert pairs <= full  # verify stage keeps the output exact-only
    assert all(r["jaccard"] >= 0.9 for r in rows)
    assert report["hot_df_cap"] is not None and report["n_hot_docs"] > 0
    assert 0.0 < report["prescreen_recall_at_t"] <= 1.0


def test_prefix_join_budget_raise_and_identity(spark):
    from pyspark_validator.pipelines.dedup import prefix_jaccard_join

    # the right corpus quotes the left verbatim, so rare prefix shingles ARE
    # shared cross-corpus (different-seed corpora share only boilerplate,
    # which rarest-first prefixing correctly keeps OUT of the index — a
    # budget breach needs genuine overlap)
    left = spark.createDataFrame(_boilerplate_docs(seed=5), ["doc_id", "text"])
    right = spark.createDataFrame(
        [(i + 50000, t) for i, t in _boilerplate_docs(seed=5)],
        ["doc_id", "text"],
    )
    with pytest.raises(ValueError, match="candidate_budget") as ei:
        prefix_jaccard_join(left, right, k=3, threshold=0.5, candidate_budget=3)
    assert "prescreen" in str(ei.value)
    base = {
        (r["id_l"], r["id_r"], round(r["jaccard"], 9))
        for r in prefix_jaccard_join(left, right, k=3, threshold=0.5).collect()
    }
    got, report = prefix_jaccard_join(
        left, right, k=3, threshold=0.5, candidate_budget=10**12,
        return_report=True,
    )
    got = {(r["id_l"], r["id_r"], round(r["jaccard"], 9)) for r in got.collect()}
    assert got == base
    assert report["hot_product_cap"] is None


def test_prefix_join_budget_prescreen_recovers_planted(spark):
    """Left docs quoted verbatim on the right MUST survive the cross-corpus
    prescreen (identical shingle sets -> identical signatures), and output
    stays exact-verified."""
    from pyspark_validator.pipelines.dedup import prefix_jaccard_join

    left = spark.createDataFrame(_boilerplate_docs(seed=7), ["doc_id", "text"])
    right = spark.createDataFrame(
        [(i + 50000, t) for i, t in _boilerplate_docs(seed=7)],
        ["doc_id", "text"],
    )
    full = {
        (r["id_l"], r["id_r"])
        for r in prefix_jaccard_join(left, right, k=3, threshold=0.9).collect()
    }
    planted = {(i, i + 50000) for i, _ in _boilerplate_docs(seed=7)}
    assert planted <= full
    got, report = prefix_jaccard_join(
        left, right, k=3, threshold=0.9, candidate_budget=1,
        on_budget="prescreen", return_report=True,
    )
    rows = got.collect()
    pairs = {(r["id_l"], r["id_r"]) for r in rows}
    assert planted <= pairs
    assert pairs <= full
    assert all(r["jaccard"] >= 0.9 for r in rows)
    assert report["hot_product_cap"] is not None
    assert report["n_hot_docs_left"] > 0 and report["n_hot_docs_right"] > 0


def test_decontaminate_fuzzy_planted(spark):
    from pyspark_validator.pipelines.curation import decontaminate_fuzzy

    bench_text = "the quick brown fox jumps over the lazy dog again and again"
    bench = spark.createDataFrame([(900, bench_text)], ["doc_id", "text"])
    train = spark.createDataFrame(
        [
            (1, bench_text + " zz"),            # near-copy -> flagged
            (2, "completely unrelated words about spark shuffles and joins"),
            (3, bench_text),                    # exact copy -> flagged, j=1.0
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in decontaminate_fuzzy(train, bench, threshold=0.8).collect()}
    assert out[1]["contaminated"] and out[3]["contaminated"]
    assert not out[2]["contaminated"] and out[2]["n_benchmark_matches"] == 0
    assert out[3]["max_benchmark_jaccard"] == 1.0
    assert 0.8 <= out[1]["max_benchmark_jaccard"] < 1.0


def test_prefix_budget_validates_band_divisibility(spark):
    """ADVICE r4: a num_hashes/bands combination the prescreen math cannot
    represent must raise up front when candidate_budget is set (without a
    budget the prescreen never runs, so the legacy signature is unaffected)."""
    from pyspark_validator.pipelines.dedup import prefix_jaccard_join

    df = spark.createDataFrame(_boilerplate_docs(), ["doc_id", "text"])
    with pytest.raises(ValueError, match="divisible"):
        prefix_jaccard_pairs(
            df, k=3, threshold=0.9, candidate_budget=1, num_hashes=64, bands=15
        )
    with pytest.raises(ValueError, match="divisible"):
        prefix_jaccard_join(
            df, df, k=3, threshold=0.9, candidate_budget=1,
            num_hashes=64, bands=15,
        )


def test_prefix_budget_prescreen_reports_dropped_buckets(spark):
    """ADVICE r4: the prescreen report must quantify the max_bucket guard.
    At default max_bucket nothing is dropped (counters 0 -> the recall
    figure is exact); with max_bucket=0 every bucket is dropped and the
    counters account for the full prescreen volume."""
    df = spark.createDataFrame(_boilerplate_docs(), ["doc_id", "text"])
    _, rep = prefix_jaccard_pairs(
        df, k=3, threshold=0.9, candidate_budget=1, on_budget="prescreen",
        return_report=True,
    )
    assert rep["prescreen_dropped_buckets"] == 0
    assert rep["prescreen_dropped_bucket_rows"] == 0
    _, rep0 = prefix_jaccard_pairs(
        df, k=3, threshold=0.9, candidate_budget=1, on_budget="prescreen",
        max_bucket=0, return_report=True,
    )
    assert rep0["prescreen_dropped_buckets"] > 0
    assert rep0["prescreen_dropped_bucket_rows"] > 0
