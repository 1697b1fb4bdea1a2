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
