"""Cross-document duplicate-span detection (pipelines/curation.py::
duplicate_spans / duplicate_span_stats).

Laws pinned here:
  * spans == a python brute-force recomputation (n-gram positions shared by
    >= min_docs distinct docs), on docs with a planted shared paragraph;
  * within-doc repetition alone never fires (distinct-DOC count, not
    occurrence count);
  * min_docs=3 keeps only the triple-shared gram;
  * hash_grams=True == hash_grams=False (the 8-byte key is an identity on
    this data);
  * stats coverage == python interval-merge over the same spans; docs with
    no duplicated spans get explicit zeros.
"""

from pyspark.sql import functions as F

from pyspark_validator.pipelines.curation import (
    delta_duplicate_spans,
    duplicate_span_stats,
    duplicate_spans,
    gram_count_index,
    merge_gram_count_index,
)

SHARED = "the quick brown fox jumps over lazy dogs tonight"  # 9 words
DOCS = [
    (0, "alpha beta gamma " + SHARED + " delta epsilon"),
    (1, SHARED + " zeta eta theta iota kappa"),
    (2, "solo words only here nothing shared at all nine ten"),
    (3, "prefix " + SHARED),  # third carrier of the shared 9 words
    (4, "tiny doc"),  # < n tokens -> zero grams
    (5, "rep rep rep rep rep rep rep rep rep rep"),  # within-doc repeat only
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def _py_spans(n=8, min_docs=2):
    grams: dict[str, set[int]] = {}
    pos_rows = []
    for did, text in DOCS:
        ws = text.lower().split()
        for i in range(len(ws) - n + 1):
            g = " ".join(ws[i : i + n])
            grams.setdefault(g, set()).add(did)
            pos_rows.append((did, i + 1, g))
    return sorted(
        (did, pos, len(grams[g]))
        for did, pos, g in pos_rows
        if len(grams[g]) >= min_docs
    )


def test_spans_match_python_oracle(spark):
    got = sorted(
        (r.doc_id, r.pos, r.n_docs)
        for r in duplicate_spans(_df(spark), n=8).collect()
    )
    want = _py_spans(n=8, min_docs=2)
    assert got == want
    assert want  # non-vacuous: the planted paragraph fires
    # the within-doc-only repeater never appears (doc-count, not occurrences)
    assert all(did != 5 for did, _, _ in got)


def test_min_docs_three(spark):
    got = sorted(
        (r.doc_id, r.pos, r.n_docs)
        for r in duplicate_spans(_df(spark), n=8, min_docs=3).collect()
    )
    assert got == _py_spans(n=8, min_docs=3)
    assert all(nd >= 3 for _, _, nd in got)


def test_hash_and_string_keys_agree(spark):
    a = sorted(map(tuple, duplicate_spans(_df(spark), n=8, hash_grams=True).collect()))
    b = sorted(map(tuple, duplicate_spans(_df(spark), n=8, hash_grams=False).collect()))
    assert a == b


def test_stats_coverage_interval_merge(spark):
    n = 8
    stats = {r.doc_id: r for r in duplicate_span_stats(_df(spark), n=n).collect()}
    spans = _py_spans(n=n, min_docs=2)
    for did, text in DOCS:
        ws = text.lower().split()
        poss = sorted(p for d, p, _ in spans if d == did)
        covered = 0
        prev = None
        for p in poss:
            covered += n if prev is None else min(n, p - prev)
            prev = p
        r = stats[did]
        assert r.n_tokens == len(ws)
        assert r.n_grams == max(len(ws) - n + 1, 0)
        assert r.n_dup_grams == len(poss)
        assert r.covered_tokens == covered
        if r.n_grams:
            assert abs(r.dup_gram_frac - round(len(poss) / r.n_grams, 9)) < 1e-12
        else:
            assert r.dup_gram_frac == 0.0
        assert abs(r.dup_token_frac - round(covered / r.n_tokens, 9)) < 1e-12
    # every input doc present, including the gram-less tiny doc
    assert set(stats) == {d for d, _ in DOCS}


def test_delta_equals_full_recompute(spark):
    df = _df(spark)
    corpus = df.filter(F.col("doc_id") % 2 == 0)
    delta = df.filter(F.col("doc_id") % 2 == 1)
    idx = gram_count_index(corpus, n=8)
    got = sorted(
        (r.doc_id, r.pos, r.n_docs)
        for r in delta_duplicate_spans(delta, idx, n=8, min_docs=2).collect()
    )
    full = duplicate_spans(df, n=8, min_docs=2)
    want = sorted(
        (r.doc_id, r.pos, r.n_docs)
        for r in full.filter(F.col("doc_id") % 2 == 1).collect()
    )
    assert got == want
    assert want  # non-vacuous: docs 1 and 3 carry the shared paragraph


def test_delta_within_delta_only_duplicates_fire(spark):
    # corpus has NONE of the shared grams; docs 1 and 3 (both in the delta)
    # still duplicate each other -> the delta's own counts must contribute
    df = _df(spark)
    corpus = df.filter(F.col("doc_id") == 2)
    delta = df.filter(F.col("doc_id").isin(1, 3))
    idx = gram_count_index(corpus, n=8)
    got = delta_duplicate_spans(delta, idx, n=8, min_docs=2)
    assert got.count() > 0
    assert got.agg(F.max("n_docs")).collect()[0][0] == 2


def test_index_merge_law(spark):
    df = _df(spark)
    corpus = df.filter(F.col("doc_id") % 2 == 0)
    delta = df.filter(F.col("doc_id") % 2 == 1)
    merged = merge_gram_count_index(
        gram_count_index(corpus, n=8), gram_count_index(delta, n=8)
    )
    want = gram_count_index(df, n=8)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, want.collect()))
    assert a == b


def test_delta_plan_broadcast_prunes_index(spark):
    df = _df(spark)
    idx = gram_count_index(df.filter(F.col("doc_id") % 2 == 0), n=8)
    res = delta_duplicate_spans(df.filter(F.col("doc_id") % 2 == 1), idx, n=8)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    ).split("Initial Plan")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the index prune is the broadcast semi
