"""Lexical retrieval over the documents table: BM25 keyword scoring.

The complement of the embedding-side ANN operators in
``pipelines/similarity.py`` -- a training-data pipeline uses lexical scoring
for targeted corpus queries ("find the docs about X"), quality-slice
inspection, and hybrid (BM25 + dense) retrieval eval.

Scale design (the 100 TB contract):

  * corpus_stats: N and avgdl from ONE scalar agg over per-row token counts --
    no explode, no shuffle beyond the single-row partial merge.
  * term_doc_frequency: per-query-term document frequencies in the SAME
    single agg (one conditional sum per term; queries are a handful of terms,
    so this is a q-column one-row frame, never a full vocabulary census).
  * bm25_scores: scoring is a pure per-row expression -- per-term tf via
    size(filter(tokens, t == term)) on the already-split token array behind a
    Generate barrier (CollapseProject would otherwise re-split the document
    once per query term), idf/avgdl folded in as literals. ZERO shuffle on
    the corpus; top-k via orderBy().limit() = TakeOrderedAndProject
    (distributed heap, no global sort).

Tokenization matches the unigram-LM module (normalize_text + whitespace) so
lexical scores and perplexity gates see the same token stream.

Formula (Robertson/Lucene BM25, the +1 idf variant so scores stay positive):
  idf(t)   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
  score(d) = sum_t idf(t) * tf_td * (k1 + 1) / (tf_td + k1 * (1 - b + b * dl_d / avgdl))
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize_text

__all__ = [
    "corpus_stats",
    "term_doc_frequency",
    "bm25_scores",
    "bm25_topk",
    "rrf_fuse",
    "with_rank",
    "knn_recall",
]


def _token_array(text_col) -> F.Column:
    return F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")


def corpus_stats(df: DataFrame, text_col: str = "text") -> tuple[int, float]:
    """(N, avgdl): document count and mean token length, one scalar agg."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(_token_array(F.col(text_col)))).alias("avgdl"),
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def term_doc_frequency(
    df: DataFrame, terms: list[str], text_col: str = "text"
) -> dict[str, int]:
    """Document frequency of each query term: ONE agg with one conditional sum
    per term (bounded by the query length, not the vocabulary)."""
    aggs = [
        F.sum(
            F.array_contains(_token_array(F.col(text_col)), t).cast("long")
        ).alias(f"df_{i}")
        for i, t in enumerate(terms)
    ]
    row = df.select(*aggs).collect()[0]
    return {t: int(row[f"df_{i}"] or 0) for i, t in enumerate(terms)}


def bm25_scores(
    df: DataFrame,
    query: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: tuple[int, float] | None = None,
    dfs: dict[str, int] | None = None,
) -> DataFrame:
    """Per-document BM25 score for a bag-of-words query: [id, score], rows
    with score 0 (no term hit) dropped. Pass precomputed ``stats`` /
    ``dfs`` (standing corpus statistics) to skip the two stat scans and make
    scoring a single zero-shuffle pass."""
    terms = list(dict.fromkeys(t for t in query if t))
    n, avgdl = stats if stats is not None else corpus_stats(df, text_col)
    dfs = dfs if dfs is not None else term_doc_frequency(df, terms, text_col)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(_token_array(F.col(text_col)))).alias("__toks"),
    )
    dl = F.size("__toks").cast("double")
    denom_len = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    score = F.lit(0.0)
    for t in terms:
        idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        tf = F.size(F.filter("__toks", lambda x: x == F.lit(t))).cast("double")
        score = score + F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + denom_len)
    return (
        toks.select("id", score.alias("score"))
        .filter(F.col("score") > 0.0)
    )


def bm25_topk(
    df: DataFrame,
    query: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for the query, ties broken by id asc (deterministic):
    TakeOrderedAndProject, no global sort."""
    s = bm25_scores(df, query, k1=k1, b=b, text_col=text_col, id_col=id_col)
    return s.orderBy(F.desc("score"), F.asc("id")).limit(k)


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 60,
    id_col: str = "id",
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of ranked result lists --
    the standard hybrid-retrieval combiner (BM25 + dense k-NN):
    rrf(d) = sum_lists 1 / (k + rank_d).  Each input must carry ``id_col``
    and a ``rank`` column (1-based; ties already broken deterministically
    upstream).  Result: [id, rrf, n_lists] ordered by (rrf desc, id asc).

    Ranked lists are top-k by construction (bounded), so the union +
    groupBy is a few-thousand-row aggregation regardless of corpus size."""
    parts = [
        df.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank").cast("double"))).alias("__c"),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = (
        u.groupBy("id")
        .agg(F.sum("__c").alias("rrf"), F.count(F.lit(1)).alias("n_lists"))
        .orderBy(F.desc("rrf"), F.asc("id"))
    )
    return out.limit(topk) if topk else out


def with_rank(df: DataFrame, order_col: str, id_col: str = "id") -> DataFrame:
    """Attach a deterministic 1-based ``rank`` (order_col desc, id asc) to a
    BOUNDED result list (a top-k output). The single-partition window is safe
    exactly because the input is k rows; never call this on an unbounded
    frame."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc(order_col), F.asc(id_col))
    return df.withColumn("rank", F.row_number().over(w))


def knn_recall(
    approx: DataFrame,
    exact: DataFrame,
    qid_col: str = "qid",
    id_col: str = "id",
) -> DataFrame:
    """Recall@k of an approximate k-NN join against the exact one: per query,
    |approx ∩ exact| / |exact|. Input frames carry (qid, id) pairs (ranks
    irrelevant). One inner join on (qid, id) + two counts -- both sides are
    k·|queries| rows, so this is always small. Returns [qid, n_exact, n_hit,
    recall]."""
    e = exact.select(F.col(qid_col).alias("qid"), F.col(id_col).alias("id"))
    a = approx.select(F.col(qid_col).alias("qid"), F.col(id_col).alias("id"))
    hit = e.join(a, on=["qid", "id"], how="left_semi")
    ec = e.groupBy("qid").agg(F.count(F.lit(1)).alias("n_exact"))
    hc = hit.groupBy("qid").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        ec.join(hc, on="qid", how="left")
        .select(
            "qid",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) / F.col("n_exact")).alias("recall"),
        )
    )
