"""BM25 lexical retrieval (pipelines/retrieval.py).

Laws pinned:
  * python oracle: scores match a from-scratch BM25 re-derivation over the
    same normalize_text+whitespace token stream (9 dp);
  * zero-hit docs are dropped; empty query returns no rows;
  * standing-stats reuse: passing precomputed (stats, dfs) reproduces the
    self-computed result bit-for-bit and its plan is Exchange-free;
  * top-k: ordered by (score desc, id asc), TakeOrderedAndProject in plan.
"""

import math
import re

import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.retrieval import (
    bm25_scores,
    bm25_topk,
    corpus_stats,
    term_doc_frequency,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat  sleeps"),
    (2, "a lazy dog and a lazy cat"),
    (3, "FOX fox fox"),
    (4, "nothing relevant here"),
    (5, "   "),
]
QUERY = ["fox", "lazy", "cat"]
K1, B = 1.2, 0.75


def _tok(s):
    return [t for t in re.sub(r"\s+", " ", s.lower()).strip().split(" ") if t]


def _oracle_scores():
    toks = {i: _tok(t) for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for q in QUERY:
            dfq = sum(1 for v in toks.values() if q in v)
            idf = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
            tf = tk.count(q)
            s += idf * tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * len(tk) / avgdl))
        if s > 0:
            out[i] = s
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string").persist()


def test_scores_match_python_oracle(spark, docs):
    got = {r["id"]: r["score"] for r in bm25_scores(docs, QUERY).collect()}
    want = _oracle_scores()
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-9)


def test_empty_query_and_zero_hits(spark, docs):
    assert bm25_scores(docs, []).count() == 0
    got = {r["id"] for r in bm25_scores(docs, QUERY).collect()}
    assert 4 not in got and 5 not in got


def test_standing_stats_reuse_and_plan(spark, docs):
    stats = corpus_stats(docs)
    dfs = term_doc_frequency(docs, QUERY)
    reused = bm25_scores(docs, QUERY, stats=stats, dfs=dfs)
    base = {r["id"]: r["score"] for r in bm25_scores(docs, QUERY).collect()}
    got = {r["id"]: r["score"] for r in reused.collect()}
    assert got == base
    plan = reused._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_topk_order_and_plan(spark, docs):
    t = bm25_topk(docs, QUERY, k=3)
    rows = t.collect()
    want = sorted(_oracle_scores().items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [r["id"] for r in rows] == [i for i, _ in want]
    plan = t._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_rrf_fuse_matches_python_oracle(spark):
    from pyspark_validator.pipelines.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id bigint, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (4, 3)], "id bigint, rank int")
    got = {r["id"]: (r["rrf"], r["n_lists"]) for r in rrf_fuse([a, b], k=60).collect()}
    want = {
        1: (1 / 61 + 1 / 62, 2),
        2: (1 / 62, 1),
        3: (1 / 63 + 1 / 61, 2),
        4: (1 / 63, 1),
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == pytest.approx(want[i][0], abs=1e-12)
        assert got[i][1] == want[i][1]
    order = [r["id"] for r in rrf_fuse([a, b], k=60, topk=2).collect()]
    assert order == sorted(want, key=lambda i: (-want[i][0], i))[:2]


def test_with_rank_and_knn_recall(spark):
    from pyspark_validator.pipelines.retrieval import knn_recall, with_rank

    t = spark.createDataFrame(
        [(5, 0.9), (6, 0.9), (7, 0.1)], "id bigint, score double"
    )
    ranks = {r["id"]: r["rank"] for r in with_rank(t, "score").collect()}
    assert ranks == {5: 1, 6: 2, 7: 3}

    exact = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 12), (1, 20), (1, 21)], "qid bigint, id bigint"
    )
    approx = spark.createDataFrame(
        [(0, 10), (0, 12), (0, 99), (2, 1)], "qid bigint, id bigint"
    )
    got = {r["qid"]: (r["n_exact"], r["n_hit"], r["recall"]) for r in knn_recall(approx, exact).collect()}
    assert got[0] == (3, 2, pytest.approx(2 / 3))
    assert got[1] == (2, 0, 0.0)
    assert 2 not in got  # approx-only queries don't appear (no exact baseline)
