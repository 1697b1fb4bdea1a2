"""DSIR importance resampling (pipelines/curation.py::dsir_*).

Pure-python oracle: hashlib md5 re-derives buckets, smoothed log ratios,
per-doc weights and the Gumbel keys bit-for-bit (same double arithmetic),
so weights AND the selected set are compared exactly (1e-9 on floats).
"""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark_validator.pipelines.curation import (
    dsir_bucket_counts,
    dsir_log_ratio,
    dsir_resample,
    dsir_select,
    dsir_weights,
)

RAW = [
    (1, "the cat sat on the mat"),
    (2, "quantum flux capacitors emit tachyon bursts"),
    (3, "the dog sat on the log near the cat"),
    (4, "stock markets rallied as bond yields fell sharply today"),
    (5, "a cat and a dog sat together on a mat"),
    (6, ""),
    (7, "   "),
    (8, "cats"),
]

TARGET = [
    (101, "the cat sat on a mat"),
    (102, "a dog and a cat sat on the mat"),
]


def _grams(text: str, bigrams: bool = True) -> list[str]:
    toks = [t for t in text.strip().lower().split() if t]
    out = list(toks)
    if bigrams:
        out += [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
    return out


def _bucket(gram: str, hex_chars: int) -> str:
    return hashlib.md5(gram.encode()).hexdigest()[-hex_chars:]


def _py_counts(docs, hex_chars, bigrams=True):
    c: dict[str, int] = {}
    for _, text in docs:
        for g in _grams(text, bigrams):
            b = _bucket(g, hex_chars)
            c[b] = c.get(b, 0) + 1
    return c


def _py_ratio(tc, rc, alpha, hex_chars):
    b_total = float(16**hex_chars)
    tden = sum(tc.values()) + alpha * b_total
    rden = sum(rc.values()) + alpha * b_total
    ratio = {
        b: math.log((tc.get(b, 0) + alpha) / tden)
        - math.log((rc.get(b, 0) + alpha) / rden)
        for b in set(tc) | set(rc)
    }
    return ratio, math.log(alpha / tden) - math.log(alpha / rden)


def _py_weights(docs, ratio, default, hex_chars, bigrams=True):
    out = {}
    for doc_id, text in docs:
        gs = _grams(text, bigrams)
        logw = sum(ratio.get(_bucket(g, hex_chars), default) for g in gs)
        out[doc_id] = (len(gs), logw if gs else 0.0)
    return out


def _py_gumbel_key(doc_id, seed, logw):
    h = hashlib.md5(f"{doc_id}|{seed}".encode()).hexdigest()[:12]
    u = (int(h, 16) + 0.5) / float(16**12)
    return logw + (-math.log(-math.log(u)))


HEX = 2


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    return raw, tgt


def test_bucket_counts_match_python(frames):
    raw, _ = frames
    got = {
        r.bucket: r.cnt
        for r in dsir_bucket_counts(raw, hex_chars=HEX).collect()
    }
    assert got == _py_counts(RAW, HEX)


def test_weights_match_python(frames):
    raw, tgt = frames
    tc = dsir_bucket_counts(tgt, hex_chars=HEX)
    rc = dsir_bucket_counts(raw, hex_chars=HEX)
    ratio, default = dsir_log_ratio(tc, rc, alpha=0.5, hex_chars=HEX)
    w = dsir_weights(raw, ratio, default, hex_chars=HEX)
    py_ratio, py_default = _py_ratio(
        _py_counts(TARGET, HEX), _py_counts(RAW, HEX), 0.5, HEX
    )
    exp = _py_weights(RAW, py_ratio, py_default, HEX)
    rows = {r.doc_id: (r.n_grams, r.logw) for r in w.collect()}
    assert set(rows) == set(exp)
    for d, (n, lw) in exp.items():
        assert rows[d][0] == n
        assert rows[d][1] == pytest.approx(lw, abs=1e-9)
    # empty / whitespace docs: zero grams, zero weight
    assert rows[6] == (0, 0.0)
    assert rows[7] == (0, 0.0)


def test_self_ratio_is_zero(frames):
    """target == raw => every bucket ratio is 0 => every logw is 0."""
    raw, _ = frames
    rc = dsir_bucket_counts(raw, hex_chars=HEX)
    ratio, default = dsir_log_ratio(rc, rc, alpha=0.5, hex_chars=HEX)
    w = dsir_weights(raw, ratio, default, hex_chars=HEX)
    for r in w.collect():
        assert r.logw == pytest.approx(0.0, abs=1e-12)


def test_select_topk_and_gumbel(frames):
    raw, tgt = frames
    sel = dsir_resample(raw, tgt, k=3, hex_chars=HEX, seed="s1")
    rows = sel.collect()
    assert len(rows) == 3
    tc, rc = _py_counts(TARGET, HEX), _py_counts(RAW, HEX)
    ratio, default = _py_ratio(tc, rc, 0.5, HEX)
    wts = _py_weights(RAW, ratio, default, HEX)
    keyed = sorted(
        ((_py_gumbel_key(d, "s1", lw), d) for d, (_, lw) in wts.items()),
        key=lambda t: (-t[0], t[1]),
    )
    assert [r.doc_id for r in rows] == [d for _, d in keyed[:3]]
    for r, (k_exp, _) in zip(rows, keyed):
        assert r.select_key == pytest.approx(k_exp, abs=1e-9)
    # argmax variant: plain top-k by logw
    w = dsir_weights(
        raw,
        *dsir_log_ratio(
            dsir_bucket_counts(tgt, hex_chars=HEX),
            dsir_bucket_counts(raw, hex_chars=HEX),
            hex_chars=HEX,
        ),
        hex_chars=HEX,
    )
    sel2 = dsir_select(w, k=2, gumbel=False)
    top2 = sorted(wts.items(), key=lambda t: (-t[1][1], t[0]))[:2]
    assert [r.doc_id for r in sel2.collect()] == [d for d, _ in top2]


def test_counts_are_sum_mergeable(frames, spark):
    """Counts over a union == per-shard counts summed (standing-index law)."""
    raw, tgt = frames
    both = raw.unionByName(tgt)
    merged = {
        r.bucket: r.cnt for r in dsir_bucket_counts(both, hex_chars=HEX).collect()
    }
    a = _py_counts(RAW, HEX)
    b = _py_counts(TARGET, HEX)
    exp = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert merged == exp


def test_plan_broadcast_and_no_cartesian(frames):
    raw, tgt = frames
    sel = dsir_resample(raw, tgt, k=3, hex_chars=HEX)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    w = dsir_weights(
        raw,
        *dsir_log_ratio(
            dsir_bucket_counts(tgt, hex_chars=HEX),
            dsir_bucket_counts(raw, hex_chars=HEX),
            hex_chars=HEX,
        ),
        hex_chars=HEX,
    )
    wplan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in wplan


def test_empty_corpus_raises(frames, spark):
    raw, _ = frames
    empty = spark.createDataFrame([], "doc_id long, text string")
    ec = dsir_bucket_counts(empty, hex_chars=HEX)
    rc = dsir_bucket_counts(raw, hex_chars=HEX)
    with pytest.raises(ValueError):
        dsir_log_ratio(ec, rc, hex_chars=HEX)
