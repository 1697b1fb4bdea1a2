"""Delta-vs-corpus MinHash dedup (pipelines/dedup.py::delta_minhash_pairs /
delta_dedup_minhash / minhash_band_index): dedup a crawl increment against a
standing corpus without re-pairing the corpus.

Oracles: brute-force python cross Jaccard (no false positives ever — verify is
exact; recall 1 for identical texts — identical signatures collide in every
band), and index-reuse equivalence (precomputed minhash_band_index must give
byte-identical results to the inline path)."""

import re

from pyspark.sql import functions as F

from pyspark_validator.pipelines.dedup import (
    delta_dedup_minhash,
    delta_minhash_pairs,
    minhash_band_index,
)


def _norm(t):
    return re.sub(r"\s+", " ", t.lower()).strip()


def _sh(t, k=3):
    w = _norm(t).split(" ")
    if len(w) <= k:
        return {" ".join(w)}
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _jac(a, b):
    sa, sb = _sh(a), _sh(b)
    return len(sa & sb) / len(sa | sb)


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (1, "pack my box with five dozen liquor jugs before the market closes today"),
    (2, "a completely unrelated sentence about distributed query engines and shuffles"),
    (3, "machine learning corpora need careful deduplication before any training run"),
    (4, "the quick brown fox jumps over the lazy dog near the old river bend"),
]

DELTA = [
    # exact copy of corpus 0 -> always caught (identical signatures)
    (100, "the quick brown fox jumps over the lazy dog near the old river bank"),
    # near copy of corpus 1 (one word changed) -> high jaccard
    (101, "pack my box with five dozen liquor jugs before the market closes tonight"),
    # fresh content -> kept
    (102, "entirely novel text with no counterpart anywhere in the standing corpus"),
    # exact copy of corpus 3 with extra whitespace -> normalization catches it
    (103, "machine  learning corpora need careful deduplication before any training run"),
]


def test_delta_pairs_match_brute_force(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    delta = spark.createDataFrame(DELTA, "doc_id long, text string")
    t = 0.5
    got = {
        (r.id_delta, r.id_corpus): r.jaccard
        for r in delta_minhash_pairs(corpus, delta, threshold=t).collect()
    }
    brute = {
        (di, ci): _jac(dt, ct)
        for di, dt in DELTA
        for ci, ct in CORPUS
        if _jac(dt, ct) >= t
    }
    # exact verification => no false positives, jaccard values exact
    assert set(got) <= set(brute)
    for p, j in got.items():
        assert abs(j - brute[p]) < 1e-12
    # identical-text pairs can never be missed
    assert (100, 0) in got and (103, 3) in got
    # the near-copy shares 13/15 of its shingles; 16 bands of 4 find it whp
    assert (101, 1) in got


def test_delta_dedup_and_index_reuse(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    delta = spark.createDataFrame(DELTA, "doc_id long, text string")
    clean = delta_dedup_minhash(corpus, delta, threshold=0.5)
    surv = sorted(r.doc_id for r in clean.collect())
    assert 102 in surv and 100 not in surv and 103 not in surv
    assert clean.columns == ["doc_id", "text"]
    # a precomputed standing index gives identical pairs to the inline path
    idx = minhash_band_index(corpus)
    assert idx.columns == ["id", "band", "bucket"]
    a = {
        (r.id_delta, r.id_corpus, round(r.jaccard, 12))
        for r in delta_minhash_pairs(corpus, delta, threshold=0.5).collect()
    }
    b = {
        (r.id_delta, r.id_corpus, round(r.jaccard, 12))
        for r in delta_minhash_pairs(
            corpus, delta, threshold=0.5, corpus_index=idx
        ).collect()
    }
    assert a == b


def test_delta_probe_prunes_index(spark):
    # the standing index is only read through the broadcast semi-join on the
    # delta's hit buckets: corpus rows in unhit buckets never reach the join
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    delta = spark.createDataFrame(DELTA[:1], "doc_id long, text string")
    idx = minhash_band_index(corpus)
    p = delta_minhash_pairs(corpus, delta, threshold=0.9, corpus_index=idx)
    plan = p._sc._jvm.PythonSQLUtils.explainString(
        p._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan  # the hit-bucket prune + candidate join
    assert "CartesianProduct" not in plan
    assert {(r.id_delta, r.id_corpus) for r in p.collect()} == {(100, 0)}
