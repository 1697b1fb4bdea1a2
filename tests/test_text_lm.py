"""Unigram-LM perplexity scoring (pipelines/text.py::train_unigram_lm /
unigram_nll / lm_quality) -- the deterministic CCNet-style quality filter.

Laws pinned here:
  * logp / oov_logp match the closed-form additive-smoothing formula on a
    python Counter oracle, full-vocab and capped;
  * the vocab cap keeps exactly the top-V tokens with (count desc, token asc)
    determinism, and every out-of-vocab token scores oov_logp;
  * per-doc nll == python mean of -logp over that doc's tokens;
  * zero-token documents return n_tokens=0, nll NULL; empty corpus raises;
  * lm_quality == train-on-self + score composition;
  * plan: scoring joins the lm by broadcast and never CartesianProducts.
"""

import math
from collections import Counter

import pytest

from pyspark_validator.pipelines.text import (
    lm_quality,
    train_unigram_lm,
    unigram_nll,
)

ROWS = [
    ("a", "the cat sat on the mat"),
    ("b", "the dog sat on the log and the dog barked"),
    ("c", "a completely different sentence entirely"),
    ("d", "   "),  # whitespace-only: zero tokens
    ("e", "THE   CAT  the cat"),  # normalization: case + whitespace collapse
]


def _tokens(t):
    return [w for w in " ".join(t.lower().split()).split(" ") if w]


def _oracle(rows, vocab_size, alpha):
    cnt = Counter(w for _, t in rows for w in _tokens(t))
    total = sum(cnt.values())
    v = min(len(cnt), vocab_size)
    denom = total + alpha * (v + 1)
    vocab = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    logp = {w: math.log((c + alpha) / denom) for w, c in vocab}
    oov = math.log(alpha / denom)
    nll = {}
    for i, t in rows:
        toks = _tokens(t)
        if toks:
            nll[i] = (
                sum(-(logp.get(w, oov)) for w in toks) / len(toks),
                len(toks),
            )
        else:
            nll[i] = (None, 0)
    return logp, oov, nll


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


@pytest.mark.parametrize("vocab_size", [10_000, 3])
def test_lm_matches_python_oracle(spark, docs, vocab_size):
    want_logp, want_oov, want_nll = _oracle(ROWS, vocab_size, alpha=0.5)
    lm, oov = train_unigram_lm(docs, vocab_size=vocab_size, alpha=0.5)
    got_lm = {r.token: r.logp for r in lm.collect()}
    assert oov == pytest.approx(want_oov)
    assert set(got_lm) == set(want_logp)  # exact top-V incl. tie-breaks
    for w, lp in want_logp.items():
        assert got_lm[w] == pytest.approx(lp)
    got = {r.doc_id: r for r in unigram_nll(docs, lm, oov).collect()}
    assert set(got) == {i for i, _ in ROWS}
    for i, (nll, n) in want_nll.items():
        assert got[i].n_tokens == n
        if nll is None:
            assert got[i].nll is None
        else:
            assert got[i].nll == pytest.approx(nll)


def test_vocab_cap_tie_break(spark):
    # "bb" and "aa" both occur twice; cap=2 must keep ("the", then "aa" by
    # token asc), pushing "bb" to OOV.
    rows = [("x", "the the the aa aa bb bb")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    lm, oov = train_unigram_lm(df, vocab_size=2, alpha=0.5)
    assert [r.token for r in lm.orderBy("token").collect()] == ["aa", "the"]
    want_logp, want_oov, want_nll = _oracle(rows, 2, 0.5)
    assert oov == pytest.approx(want_oov)
    got = unigram_nll(df, lm, oov).collect()[0]
    assert got.nll == pytest.approx(want_nll["x"][0])


def test_empty_corpus_raises(spark):
    df = spark.createDataFrame([("a", "  "), ("b", None)], ["doc_id", "text"])
    with pytest.raises(ValueError, match="no tokens"):
        train_unigram_lm(df)


def test_lm_quality_is_the_composition(spark, docs):
    lm, oov = train_unigram_lm(docs, vocab_size=7, alpha=0.5)
    a = {r.doc_id: (r.n_tokens, r.nll) for r in unigram_nll(docs, lm, oov).collect()}
    b = {
        r.doc_id: (r.n_tokens, r.nll)
        for r in lm_quality(docs, vocab_size=7, alpha=0.5).collect()
    }
    assert set(a) == set(b)
    for i in a:
        assert a[i][0] == b[i][0]
        if a[i][1] is None:
            assert b[i][1] is None
        else:
            assert a[i][1] == pytest.approx(b[i][1], abs=1e-12)


def test_scoring_plan_broadcasts_lm(spark, docs):
    lm, oov = train_unigram_lm(docs, vocab_size=100, alpha=0.5)
    res = unigram_nll(docs, lm, oov)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    ).split("Initial Plan")[0]
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
