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
    other = n - sum(counts.get(k, 0) for k in keys)
    other_p = max(1.0 - sum(expected.values()), eps)
    kk = len(keys)
    psi = 0.0
    for k in keys:
        p = (counts.get(k, 0) + alpha) / (n + alpha * kk)
        qi = max(expected[k], eps)
        psi += (p - qi) * math.log(p / qi)
    if other > 0:  # '__other__' unsmoothed, 0 when empty
        po = other / n
        psi += (po - other_p) * math.log(po / other_p)
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


# ---------------------------------------------------------------------------
# suppression (enforcement counterpart of the k-anonymity audit)


def test_suppress_to_k(spark):
    from pyspark_validator.checks.anon import anon_check, suppress_to_k

    rows = [(i, "z1" if i < 7 else "z2" if i < 9 else None) for i in range(10)]
    df = spark.createDataFrame(rows, "id int, zip string")
    out = suppress_to_k(df, ["zip"], k=3)
    # z1 has 7 rows (kept), z2 has 2 (dropped), NULL cluster has 1 (dropped)
    assert sorted(r["id"] for r in out.collect()) == list(range(7))
    assert out.columns == ["id", "zip"]
    # post-condition: the suppressed frame IS k-anonymous
    s = anon_check(out, ["zip"], k=3).summary().collect()[0]
    assert s["holds"]


def test_suppress_to_k_null_cluster_big_enough_survives(spark):
    from pyspark_validator.checks.anon import suppress_to_k

    rows = [(i, None) for i in range(5)] + [(9, "z")]
    df = spark.createDataFrame(rows, "id int, zip string")
    out = suppress_to_k(df, ["zip"], k=3)
    # the NULL cluster has 5 rows -> survives under NullMode.EQUAL
    assert out.count() == 5
    assert all(r["zip"] is None for r in out.collect())


# ---------------------------------------------------------------------------
# streaming class balance (windowed, event-time)


def test_streaming_class_balance_batch_parity(spark, tmp_path):
    """availableNow stream over two files == the same windowed agg computed
    statically; a window that matches `expected` holds, a skewed one trips."""
    import datetime as dt

    from pyspark_validator.streaming import streaming_class_balance

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # window 0: balanced a/b; window 1: all 'a' (label shift)
    for i in range(20):
        rows.append((t0 + dt.timedelta(seconds=i), "a" if i % 2 else "b"))
    for i in range(20):
        rows.append((t0 + dt.timedelta(minutes=1, seconds=i), "a"))
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, "ts timestamp, cls string").write.parquet(
        str(src / "b0.parquet")
    )
    stream = spark.readStream.schema("ts timestamp, cls string").parquet(
        str(src) + "/*"
    )
    exp = {"a": 0.5, "b": 0.5}
    out = streaming_class_balance(
        stream, "cls", "ts", exp, window_duration="1 minute", max_psi=0.1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cls_bal")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"].isoformat(): (r["n"], r["n_other"], r["psi"], r["holds"])
        for r in spark.table("cls_bal").collect()
    }
    assert len(got) == 2
    w0 = got["2026-01-01T00:00:00"]
    w1 = got["2026-01-01T00:01:00"]
    assert w0[0] == 20 and w0[3] is True
    assert w1[0] == 20 and w1[3] is False
    # parity vs the batch class_balance formula per window slice
    from pyspark_validator.checks.drift import class_balance

    b0 = spark.createDataFrame(rows[:20], "ts timestamp, cls string")
    want = class_balance(b0, "cls", exp).collect()[0]
    assert w0[2] == pytest.approx(want["psi"], rel=1e-12)
