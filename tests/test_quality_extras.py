"""Compression-ratio quality signal (pipelines/text.py::compression_signals)
and the closed-form MinHash-LSH planner (pipelines/dedup.py::minhash_plan)."""

import zlib

import pytest

from pyspark_validator.pipelines.dedup import lsh_collision_prob, minhash_plan


def test_compression_signals_python_oracle(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog " * 3),
        (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
        (2, ""),
        (3, None),
        (4, "z8#kQ!m4 p0X@ r7Yw2% bN9c hJ1v Lt5g"),
    ]
    from pyspark_validator.pipelines.text import compression_signals

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in compression_signals(df).collect()}
    for i, t in rows:
        want = len(zlib.compress((t or "").encode("utf-8"), 6))
        assert got[i]["zlib_bytes"] == want
        raw = len((t or "").encode("utf-8"))
        if raw:
            assert got[i]["zlib_ratio"] == pytest.approx(want / raw)
        else:
            assert got[i]["zlib_ratio"] is None
    # ordering law: pure repetition < natural text < high-entropy noise
    assert got[1]["zlib_ratio"] < got[0]["zlib_ratio"] < got[4]["zlib_ratio"]


def test_lsh_collision_prob_closed_form():
    assert lsh_collision_prob(0.0, 16, 4) == 0.0
    assert lsh_collision_prob(1.0, 16, 4) == 1.0
    s, b, r = 0.8, 16, 4
    assert lsh_collision_prob(s, b, r) == pytest.approx(1 - (1 - s**4) ** 16)


def test_minhash_plan_properties():
    # s50 tracks the threshold: a higher threshold must not pick a LOWER s50
    plans = {t: minhash_plan(t, num_hashes=64) for t in (0.5, 0.7, 0.9)}
    for t, p in plans.items():
        assert p["bands"] * p["rows"] == 64
        assert abs(p["s50"] - t) < 0.35
    assert plans[0.5]["s50"] <= plans[0.7]["s50"] <= plans[0.9]["s50"]
    # recall bias: heavier fn weight never RAISES the curve midpoint
    lo = minhash_plan(0.8, 64, false_negative_weight=10.0)
    hi = minhash_plan(0.8, 64, false_negative_weight=0.1)
    assert lo["s50"] <= hi["s50"]
    # the library defaults (16 bands x 4 rows at t=0.7, num_hashes=64) are on
    # the planner's frontier: planner cost at t=0.7 <= the default's cost
    assert plans[0.7]["cost"] <= 1.0
