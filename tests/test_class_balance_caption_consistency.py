"""Class-balance gate (fixed-baseline categorical PSI) and same-media
caption-consistency audit."""

import math

import pytest
from pyspark.sql import functions as F

from pyspark_validator.checks.drift import class_balance
from pyspark_validator.fused import FusedPass
from pyspark_validator.pipelines.interleaved import (
    caption_consistency,
    caption_consistency_summary,
)


# ---------------------------------------------------------------------------
# class balance


def _psi_oracle(counts, expected, alpha=0.5):
    n = sum(counts.values())
    keys = sorted(expected)
    eps = 1e-12
    q = [max(expected[k], eps) for k in keys]
    other = n - sum(counts.get(k, 0) for k in keys)
    obs = [counts.get(k, 0) for k in keys] + [other]
    q.append(max(1.0 - sum(expected.values()), eps))
    kk = len(keys) + 1
    psi = 0.0
    for o, qi in zip(obs, q):
        p = (o + alpha) / (n + alpha * kk)
        psi += (p - qi) * math.log(p / qi)
    return psi


def test_class_balance_python_oracle(spark):
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 15 + [("zzz",)] * 5
    df = spark.createDataFrame(rows, "cls string")
    exp = {"a": 0.5, "b": 0.3, "c": 0.15}
    s = class_balance(df, "cls", exp, max_psi=0.05).collect()[0]
    assert s["n"] == 100 and s["n_other"] == 5
    assert s["psi"] == pytest.approx(
        _psi_oracle({"a": 50, "b": 30, "c": 15, "zzz": 5}, exp), rel=1e-12
    )
    assert s["holds"]  # perfectly on-distribution


def test_class_balance_shift_detected(spark):
    rows = [("a",)] * 90 + [("b",)] * 10
    df = spark.createDataFrame(rows, "cls string")
    s = class_balance(df, "cls", {"a": 0.5, "b": 0.5}, max_psi=0.1).collect()[0]
    assert not s["holds"]
    # both classes deviate by exactly 0.4; the engine's tie rule is
    # last-tied-label in (sorted classes, __other__) order
    assert s["worst_class"] == "b"
    assert s["max_abs_dev"] == pytest.approx(0.4, rel=1e-12)


def test_class_balance_null_excluded(spark):
    rows = [("a",), (None,), ("a",), (None,)]
    df = spark.createDataFrame(rows, "cls string")
    s = class_balance(df, "cls", {"a": 1.0}).collect()[0]
    assert s["n"] == 2 and s["n_other"] == 0


def test_fused_class_balance_matches_standalone(spark):
    rows = [(i, ["x", "y", "z"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "id int, cls string")
    exp = {"x": 0.34, "y": 0.33, "z": 0.33}
    stand = class_balance(df, "cls", exp).collect()[0]
    fp = FusedPass(df, num_partitions=1, partition_key="id").add_class_balance(
        "cb", "cls", exp
    )
    v = fp.verdict("cb").collect()[0]
    assert v["n"] == stand["n"]
    assert v["psi"] == pytest.approx(stand["psi"], rel=1e-12)
    fp.unpersist()


def test_class_balance_rejects_bad_expected(spark):
    df = spark.createDataFrame([("a",)], "cls string")
    with pytest.raises(ValueError):
        class_balance(df, "cls", {})
    with pytest.raises(ValueError):
        class_balance(df, "cls", {"a": 0.8, "b": 0.4})


# ---------------------------------------------------------------------------
# caption consistency


def _spans(items):
    """items: list of (kind, text, media_ref); offsets auto-increment."""
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i * 10}
        for i, (k, t, m) in enumerate(items)
    ]


@pytest.fixture()
def inconsistent_docs(spark):
    rows = [
        # img1 captioned 'a cat' twice (consistent), img2 captioned two ways
        ("d1", _spans([("text", "a cat", None), ("image", None, "img1")])),
        ("d2", _spans([("image", None, "img1"), ("text", "A  CAT", None)])),
        ("d3", _spans([("image", None, "img2"), ("text", "blue car", None)])),
        ("d4", _spans([("image", None, "img2"), ("text", "red boat", None)])),
        # img3 used once; img4 isolated (no adjacent text -> no pair at all)
        ("d5", _spans([("text", "solo", None), ("image", None, "img3")])),
        ("d6", _spans([("image", None, "img4")])),
    ]
    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    return spark.createDataFrame(rows, schema)


def test_caption_consistency_census(inconsistent_docs):
    c = {r["media_ref"]: r for r in caption_consistency(inconsistent_docs).collect()}
    # img1: two uses, captions 'a cat' and 'A  CAT' normalize identically
    assert c["img1"]["n_uses"] == 2
    assert c["img1"]["n_distinct_captions"] == 1
    assert not c["img1"]["inconsistent"]
    # img2: two conflicting captions
    assert c["img2"]["n_distinct_captions"] == 2 and c["img2"]["inconsistent"]
    assert c["img3"]["n_uses"] == 1
    assert "img4" not in c  # isolated media emits no pair


def test_caption_consistency_summary(inconsistent_docs):
    s = caption_consistency_summary(inconsistent_docs).collect()[0]
    assert s["n_refs"] == 3 and s["n_pairs"] == 5
    assert s["n_reused_refs"] == 2
    assert s["n_inconsistent_refs"] == 1
    assert s["max_distinct_captions"] == 2
    assert s["inconsistent_fraction"] == pytest.approx(0.5)
    assert not s["holds"]


def test_caption_consistency_holds_on_clean(spark):
    rows = [
        ("d1", _spans([("text", "cap", None), ("image", None, "m1")])),
        ("d2", _spans([("image", None, "m1"), ("text", "cap", None)])),
    ]
    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    df = spark.createDataFrame(rows, schema)
    s = caption_consistency_summary(df).collect()[0]
    assert s["holds"] and s["n_inconsistent_refs"] == 0
