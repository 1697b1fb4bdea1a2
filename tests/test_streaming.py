"""Streaming validation tests: file-source micro-batches drive the incremental
engine; windowed violation counts run as a real stateful streaming agg."""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.incremental import IncrementalUCC
from pyspark_validator.streaming import attach_incremental, streaming_violation_counts


def test_stream_foreachbatch_incremental_ucc(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch files: first unique keys, then a duplicate of 5
    spark.createDataFrame([(i,) for i in range(20)], ["k"]).write.mode(
        "overwrite"
    ).parquet(str(src / "b0.parquet"))
    spark.createDataFrame([(5,), (100,)], ["k"]).write.mode("overwrite").parquet(
        str(src / "b1.parquet")
    )

    stream = spark.readStream.schema("k bigint").parquet(str(src) + "/*")
    eng = IncrementalUCC(spark, str(tmp_path / "state"), ["k"], num_partitions=4)
    seen = []
    q = (
        attach_incremental(
            stream,
            eng,
            str(tmp_path / "ckpt"),
            on_batch_verdicts=lambda v, bid: seen.append((bid, v.count())),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # all files processed; the duplicate of 5 must be visible in final verdicts
    total = eng.verdicts().agg(F.sum("n_violating_clusters").alias("v")).collect()[0]
    assert total.v == 1
    n_rows = eng.verdicts().agg(F.sum("n_rows").alias("n")).collect()[0]
    assert n_rows.n == 22
    assert len(seen) >= 1


def test_streaming_violation_counts_windowed(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        ("2026-01-01 00:00:05", "a"),
        ("2026-01-01 00:00:10", "a"),  # dup inside window 0
        ("2026-01-01 00:00:20", "b"),
        ("2026-01-01 00:01:10", "a"),  # different window -> not a dup there
    ]
    spark.createDataFrame(rows, ["ts_s", "k"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "k"
    ).write.mode("overwrite").parquet(str(src / "p.parquet"))

    stream = spark.readStream.schema("ts timestamp, k string").parquet(str(src) + "/*")
    out = streaming_violation_counts(stream, ["k"], "ts", "1 minute", "2 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("viol")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.isoformat(), r.k): r.occurrences
        for r in spark.table("viol").collect()
    }
    assert got == {("2026-01-01T00:00:00", "a"): 2}


def test_streaming_gap_check_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState: the per-key SD gap check stitches each key's
    last row across micro-batches (file ordering drives two batches when
    maxFilesPerTrigger=1)."""
    from pyspark_validator.streaming import streaming_gap_check

    src = tmp_path / "gap_src"
    src.mkdir()
    # batch 0: key a rising 0->10->20 (ok @ g2=15); key b 0->100 (insertion)
    spark.createDataFrame(
        [("a", 1.0, 0.0), ("a", 2.0, 10.0), ("a", 3.0, 20.0),
         ("b", 1.0, 0.0), ("b", 2.0, 100.0)],
        ["k", "o", "v"],
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    # batch 1: key a continues 20 -> 15 (delta -5 < g1 -> deletion ACROSS
    # batches: needs the state store), then 15 -> 25 (ok)
    spark.createDataFrame(
        [("a", 4.0, 15.0), ("a", 5.0, 25.0)], ["k", "o", "v"]
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))

    stream = (
        spark.readStream.schema("k string, o double, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = streaming_gap_check(stream, ["k"], "o", "v", g1=0.0, g2=15.0)
    q = (
        out.writeStream.format("memory")
        .queryName("gaps")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.k, r.left_o, r.right_o, r.delta, r.kind)
        for r in spark.table("gaps").collect()
    )
    assert ("b", 1.0, 2.0, 100.0, "insertion") in got
    # the cross-batch deletion: a's last row of batch 0 (o=3, v=20) vs the
    # first row of batch 1 (o=4, v=15)
    assert ("a", 3.0, 4.0, -5.0, "deletion") in got
    assert len(got) == 2


def test_streaming_rule_qualities_windowed(spark, tmp_path):
    from pyspark_validator.streaming import streaming_rule_qualities

    src = tmp_path / "rule_events"
    src.mkdir()
    rows = [
        ("2026-01-01 00:00:05", "a", 10.0),
        ("2026-01-01 00:00:15", "a", 90.0),  # fits ante, breaks cons
        ("2026-01-01 00:00:25", "b", 10.0),
        ("2026-01-01 00:01:05", "a", 10.0),  # next window: clean
    ]
    spark.createDataFrame(rows, ["ts_s", "cat", "x"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "cat", "x"
    ).write.mode("overwrite").parquet(str(src / "p.parquet"))

    stream = spark.readStream.schema("ts timestamp, cat string, x double").parquet(
        str(src) + "/*"
    )
    out = streaming_rule_qualities(
        stream, {"cat": ["a"]}, {"x": (0.0, 50.0)}, "ts", "1 minute", "2 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ruleq")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.window_start.isoformat(): (r.n_rows, r.n_fit_ante, r.n_fit_both, r.confidence)
        for r in spark.table("ruleq").collect()
    }
    assert got["2026-01-01T00:00:00"] == (3, 2, 1, 0.5)
    assert got["2026-01-01T00:01:00"] == (1, 1, 1, 1.0)


def test_stream_foreachbatch_incremental_fused(spark, tmp_path):
    """A stream of inserts keeps every member of a FusedPass live: each
    micro-batch is one delta agg job, the callback sees touched-slice verdict
    dicts, and the final state equals a batch FusedPass over all the data."""
    from pyspark_validator.fused import FusedPass, IncrementalFused
    from pyspark_validator.streaming import attach_incremental_fused

    src = tmp_path / "src"
    src.mkdir()
    b0 = [(i, float(i), "x" if i % 3 else None) for i in range(40)]
    b1 = [(i, 2.0 * i, "y") for i in range(40, 55)]
    spark.createDataFrame(b0, ["k", "v", "s"]).write.parquet(str(src / "b0.parquet"))
    spark.createDataFrame(b1, ["k", "v", "s"]).write.parquet(str(src / "b1.parquet"))

    def fp_over(df):
        return (
            FusedPass(df, partition_key="k", num_partitions=4)
            .add_completeness("comp_s", "s", max_null_fraction=0.5)
            .add_numeric_profile("prof_v", "v")
        )

    static = spark.read.schema("k bigint, v double, s string").parquet(
        str(src / "b0.parquet")
    )
    eng = IncrementalFused(fp_over(static), str(tmp_path / "state"))
    # one file per micro-batch so the apply_delta (merge) path runs, not just
    # the initializing full pass
    stream = (
        spark.readStream.schema("k bigint, v double, s string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    seen = []
    q = (
        attach_incremental_fused(
            stream,
            eng,
            str(tmp_path / "ckpt"),
            on_batch_verdicts=lambda vs, bid: seen.append(
                (bid, {n: df.count() for n, df in vs.items()})
            ),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # one batch per part-file: the first initializes, the rest merge deltas
    assert len(seen) >= 2
    for _bid, counts in seen:
        assert set(counts) == {"comp_s", "prof_v"}
        assert all(0 < c <= 4 for c in counts.values())

    full = spark.read.schema("k bigint, v double, s string").parquet(
        str(src) + "/*"
    )
    got = {r.partition_id: r for r in eng.verdict("prof_v").collect()}
    want = {r.partition_id: r for r in fp_over(full).verdict("prof_v").collect()}
    assert set(got) == set(want)
    for pid, w in want.items():
        g = got[pid]
        for field in w.asDict():
            gv, wv = getattr(g, field), getattr(w, field)
            if isinstance(wv, float):
                assert gv == pytest.approx(wv, rel=1e-9), (pid, field)
            else:
                assert gv == wv, (pid, field)
    comp = {r.partition_id: r.holds for r in eng.verdict("comp_s").collect()}
    comp_want = {
        r.partition_id: r.holds for r in fp_over(full).verdict("comp_s").collect()
    }
    assert comp == comp_want


def test_streaming_dedup_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark over the normalized-content key: in-batch
    and cross-batch re-arrivals inside the watermark are dropped once."""
    from pyspark_validator.streaming import streaming_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    # batch 0: A twice (in-batch dup, differing only by case/space), B once
    spark.createDataFrame(
        [
            ("2026-01-01 00:00:01", 1, "hello world"),
            ("2026-01-01 00:00:02", 2, "  Hello   world? no -- different"),
            ("2026-01-01 00:00:03", 3, "hello world  "),
        ],
        ["ts_s", "doc_id", "text"],
    ).selectExpr("cast(ts_s as timestamp) ts", "doc_id", "text").coalesce(
        1
    ).write.parquet(str(src / "b0.parquet"))
    # batch 1: A re-sent (cross-batch dup, needs the state store), C new
    spark.createDataFrame(
        [
            ("2026-01-01 00:00:10", 4, "HELLO WORLD"),
            ("2026-01-01 00:00:11", 5, "brand new content"),
        ],
        ["ts_s", "doc_id", "text"],
    ).selectExpr("cast(ts_s as timestamp) ts", "doc_id", "text").coalesce(
        1
    ).write.parquet(str(src / "b1.parquet"))

    stream = (
        spark.readStream.schema("ts timestamp, doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = streaming_dedup(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    kept = sorted(r.doc_id for r in spark.table("dedup_stream").collect())
    # note: case differs between the two "hello world" dups (normalized key
    # lowercases) and batch order within b0 is file order (doc 1 first)
    assert kept == [1, 2, 5]


def test_streaming_quality_gate_stateless(spark, tmp_path):
    from pyspark_validator.streaming import streaming_quality_gate

    src = tmp_path / "qg_src"
    src.mkdir()
    good = "the quick brown fox jumps over the lazy dog and it is fine " * 3
    spark.createDataFrame(
        [(1, good), (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))")],
        ["doc_id", "text"],
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*"
    )
    out = streaming_quality_gate(stream, min_quality=0.3).select("doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("qgate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert [r.doc_id for r in spark.table("qgate").collect()] == [1]


def test_streaming_numeric_drift_matches_batch(spark, tmp_path):
    from pyspark_validator.checks.drift import numeric_baseline, numeric_drift
    from pyspark_validator.streaming import streaming_numeric_drift

    # baseline: uniform-ish; window 0 mirrors it, window 1 is shifted hard
    base_rows = [(float(i % 10),) for i in range(200)]
    baseline_df = spark.createDataFrame(base_rows, ["v"])
    baseline = numeric_baseline(baseline_df, "v", num_bins=10)
    assert baseline["n"] == 200 and len(baseline["counts"]) == 12

    w0 = [("2026-01-01 00:00:%02d" % (i % 50), float(i % 10)) for i in range(100)]
    w1 = [("2026-01-01 00:01:%02d" % (i % 50), 9.0 + (i % 3)) for i in range(100)]
    src = tmp_path / "drift_src"
    src.mkdir()
    spark.createDataFrame(w0 + w1, ["ts_s", "v"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "v"
    ).write.mode("overwrite").parquet(str(src / "p.parquet"))

    stream = spark.readStream.schema("ts timestamp, v double").parquet(str(src) + "/*")
    out = streaming_numeric_drift(
        stream, "v", "ts", baseline, "1 minute", "2 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("drift_win")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"].strftime("%M"): r
        for r in spark.sql("SELECT * FROM drift_win").collect()
    }
    assert set(got) == {"00", "01"}
    assert not got["00"]["drift_detected"]
    assert got["01"]["drift_detected"]
    assert got["01"]["psi"] > got["00"]["psi"]

    # per-window statistics match the BATCH numeric_drift on the same slice
    for mins, rows in (("00", w0), ("01", w1)):
        cur = spark.createDataFrame(rows, ["ts_s", "v"]).select("v")
        b = numeric_drift(
            baseline_df,
            cur,
            "v",
            num_bins=10,
            bin_edges=(baseline["lo"], baseline["hi"]),
        ).collect()[0]
        s = got[mins]
        assert abs(s["psi"] - b["psi"]) < 1e-9
        assert abs(s["chi2"] - b["chi2"]) < 1e-9
        assert abs(s["ks_stat"] - b["ks_stat"]) < 1e-9
        assert s["n_buckets"] == b["n_buckets"]


def test_streaming_categorical_drift_other_bucket(spark, tmp_path):
    from pyspark_validator.checks.drift import categorical_baseline
    from pyspark_validator.streaming import streaming_categorical_drift

    base_rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20
    baseline = categorical_baseline(spark.createDataFrame(base_rows, ["v"]), "v")
    assert baseline["values"] == ["a", "b", "c"] and baseline["other_count"] == 0

    # window 0 matches the baseline mix; window 1 is all novel vocabulary ->
    # everything pools into OTHER and PSI explodes
    rows0 = [
        (
            "2026-01-01 00:00:%02d" % (i % 50),
            "a" if i % 10 < 5 else ("b" if i % 10 < 8 else "c"),
        )
        for i in range(100)
    ]
    rows1 = [("2026-01-01 00:01:%02d" % (i % 50), "zzz%d" % (i % 4)) for i in range(100)]
    src = tmp_path / "cat_src"
    src.mkdir()
    spark.createDataFrame(rows0 + rows1, ["ts_s", "v"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "v"
    ).write.mode("overwrite").parquet(str(src / "p.parquet"))

    stream = spark.readStream.schema("ts timestamp, v string").parquet(str(src) + "/*")
    out = streaming_categorical_drift(stream, "v", "ts", baseline, "1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("cat_win")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"].strftime("%M"): r
        for r in spark.sql("SELECT * FROM cat_win").collect()
    }
    assert not got["00"]["drift_detected"]
    assert got["01"]["drift_detected"]
    assert got["01"]["n_c"] == 100


def test_streaming_decontaminate_batch_parity(spark):
    # the stateless gate's counts must equal the batch decontaminate join
    # bit-for-bit (same tokenization, same xxhash64 keys)
    from pyspark_validator.pipelines.curation import decontaminate
    from pyspark_validator.streaming import streaming_decontaminate

    bench_txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, bench_txt + " plus a tail"),                 # contains bench 8-grams
        (1, "totally clean text with eight or more words in it"),
        (2, bench_txt),                                   # exact benchmark item
        (3, "short doc"),                                 # < n words -> 0 grams
        (4, "Alpha  beta gamma delta epsilon zeta eta theta extra"),  # case/ws
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(100, bench_txt)], "doc_id long, text string")
    batch = {
        r.doc_id: (r.n_contaminated_grams, r.contaminated)
        for r in decontaminate(train, bench, n=8).collect()
    }
    gate = {
        r.doc_id: (r.n_contaminated_grams, r.contaminated)
        for r in streaming_decontaminate(
            train, bench, n=8, keep_contaminated=True
        ).collect()
    }
    assert gate == batch
    assert batch[2][1] and not batch[1][1] and batch[3] == (0, False)
    # default mode drops contaminated rows
    surv = sorted(
        r.doc_id for r in streaming_decontaminate(train, bench, n=8).collect()
    )
    assert surv == sorted(d for d, v in batch.items() if not v[1])


def test_streaming_decontaminate_is_stateless_on_stream(spark, tmp_path):
    from pyspark_validator.streaming import streaming_decontaminate

    bench_txt = "one two three four five six seven eight nine ten"
    bench = spark.createDataFrame([(0, bench_txt)], "doc_id long, text string")
    src = tmp_path / "deco_src"
    src.mkdir()
    spark.createDataFrame(
        [(1, bench_txt + " contaminated"), (2, "clean words " * 6)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*"
    )
    out = streaming_decontaminate(stream, bench, n=8)
    q = (
        out.writeStream.format("memory")
        .queryName("deco_stream")
        .outputMode("append")  # append with NO watermark proves zero state
        .option("checkpointLocation", str(tmp_path / "deco_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r.doc_id for r in spark.sql("select doc_id from deco_stream").collect()]
    assert got == [2]


def test_streaming_contam_fraction_batch_parity(spark):
    # the stateless gate's per-doc MAX coverage must equal the batch
    # contamination_fraction join's max frac per doc (same tokenization,
    # same xxhash64 keys, same distinct semantics)
    from pyspark_validator.pipelines.curation import contamination_fraction
    from pyspark_validator.streaming import streaming_contamination_fraction

    b1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b2 = "red orange yellow green blue indigo violet ultraviolet infrared"
    rows = [
        (0, b1 + " plus a tail of unrelated words here"),  # covers all of b1
        (1, "totally clean text with eight or more words in it for sure"),
        (2, " ".join(b1.split()[:9]) + " detour"),  # partial coverage of b1
        (3, "short doc"),  # < n words -> 0 grams
        (4, b2 + " " + b2),  # repetition must not inflate coverage of b2
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, b1), (101, b2), (102, "tiny item")],  # 102: < n words, no grams
        "doc_id long, text string",
    )
    pairs = contamination_fraction(train, bench, n=8, min_frac=1e-12).collect()
    batch_max = {d: 0.0 for d, _ in rows}
    for r in pairs:
        batch_max[r.doc_id] = max(batch_max[r.doc_id], r.frac)
    gate = {
        r.doc_id: (r.max_benchmark_coverage, r.contaminated)
        for r in streaming_contamination_fraction(
            train, bench, n=8, min_frac=0.5, keep_contaminated=True
        ).collect()
    }
    assert set(gate) == set(batch_max)
    for d, mf in batch_max.items():
        assert gate[d][0] == pytest.approx(mf, abs=1e-12)
        assert gate[d][1] == (mf >= 0.5)
    assert gate[0] == (pytest.approx(1.0), True)
    assert gate[3] == (0.0, False)
    assert 0.0 < gate[2][0] < 1.0
    assert gate[4][0] == pytest.approx(1.0)
    # default mode drops flagged rows
    surv = sorted(
        r.doc_id
        for r in streaming_contamination_fraction(
            train, bench, n=8, min_frac=0.5
        ).collect()
    )
    assert surv == sorted(d for d, mf in batch_max.items() if mf < 0.5)


def test_streaming_contam_fraction_is_stateless_on_stream(spark, tmp_path):
    from pyspark_validator.streaming import streaming_contamination_fraction

    bench_txt = "one two three four five six seven eight nine ten"
    bench = spark.createDataFrame([(0, bench_txt)], "doc_id long, text string")
    src = tmp_path / "cf_src"
    src.mkdir()
    spark.createDataFrame(
        [(1, bench_txt + " contaminated"), (2, "clean words " * 6)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*"
    )
    out = streaming_contamination_fraction(stream, bench, n=8, min_frac=0.5)
    q = (
        out.writeStream.format("memory")
        .queryName("cf_stream")
        .outputMode("append")  # append with NO watermark proves zero state
        .option("checkpointLocation", str(tmp_path / "cf_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r.doc_id for r in spark.sql("select doc_id from cf_stream").collect()]
    assert got == [2]


def test_streaming_span_gate_stateless_and_batch_parity(spark, tmp_path):
    from pyspark_validator.schema import quarantine_by_integrity
    from pyspark_validator.streaming import streaming_span_gate

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = [
        ("ok", [sp("text", "a", None, 0), sp("image", None, "m://1", 64)]),
        ("bad_kind", [sp("video?", None, "m://2", 0)]),
        ("text_null", [sp("text", None, None, 0)]),
        ("media_null", [sp("image", None, None, 0)]),
        ("disorder", [sp("text", "a", None, 64), sp("text", "b", None, 0)]),
    ]
    batch = spark.createDataFrame(rows, schema)
    src = tmp_path / "sg_src"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    out = streaming_span_gate(stream).select("doc_id", "span_ok")
    q = (
        out.writeStream.format("memory")
        .queryName("sgate")
        .outputMode("append")  # append with NO watermark => provably stateless
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["span_ok"] for r in spark.table("sgate").collect()}
    assert got == {
        "ok": True,
        "bad_kind": False,
        "text_null": False,
        "media_null": False,
        "disorder": False,
    }
    # batch parity: the clean split of quarantine_by_integrity == span_ok rows
    clean, bad = quarantine_by_integrity(batch)
    assert {r["doc_id"] for r in clean.collect()} == {k for k, v in got.items() if v}


def test_streaming_bloom_gate_stateless(spark, tmp_path):
    from pyspark_validator.pipelines.bloom import (
        bloom_array,
        bloom_words,
        content_hash_index,
    )
    from pyspark_validator.streaming import streaming_bloom_gate

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i}") for i in range(50)], "doc_id long, text string"
    )
    m, k = 1 << 16, 7
    arr = bloom_array(bloom_words(content_hash_index(corpus), num_bits=m, num_hashes=k), m)

    src = tmp_path / "bg_src"
    src.mkdir()
    delta = spark.createDataFrame(
        [(100, "corpus doc 7"), (101, "BRAND new doc"), (102, "  Corpus   doc 8 ")],
        "doc_id long, text string",
    )
    delta.coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src) + "/*")
    out = streaming_bloom_gate(stream, arr, m, k).select("doc_id", "maybe_seen")
    q = (
        out.writeStream.format("memory")
        .queryName("bgate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["maybe_seen"] for r in spark.table("bgate").collect()}
    # exact copy and normalized copy flagged; new doc passes (fpp ~ 0 at this sizing)
    assert got == {100: True, 101: False, 102: True}


def test_streaming_layout_gate_stateless(spark, tmp_path):
    from pyspark_validator.pipelines.bloom import bloom_array, bloom_words
    from pyspark_validator.pipelines.interleaved import layout_clusters
    from pyspark_validator.streaming import streaming_layout_gate

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )

    def _sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    # a spam template repeated 3x (different words, same skeleton) -> banned
    def template(i):
        return [
            _sp("text", f"buy {'x' * 10} now{i}", None, 0),  # len 16 -> bucket 1
            _sp("image", None, f"media://image/{i}", 100),
        ]

    corpus = spark.createDataFrame(
        [(f"c{i}", template(i)) for i in range(3)]
        + [("c9", [_sp("text", "a genuinely organic paragraph of text", None, 0)])],
        schema,
    )
    m, k = 1 << 16, 5
    banned = layout_clusters(corpus, min_cluster=3)
    arr = bloom_array(
        bloom_words(banned, key_col="layout_key", num_bits=m, num_hashes=k), m
    )

    src = tmp_path / "lg_src"
    src.mkdir()
    delta = spark.createDataFrame(
        [
            ("d0", template(77)),  # fresh words + fresh media, SAME skeleton
            ("d1", [_sp("text", "short", None, 0)]),  # different skeleton
        ],
        schema,
    )
    delta.coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    out = streaming_layout_gate(stream, arr, m, k).select("doc_id", "banned_layout")
    q = (
        out.writeStream.format("memory")
        .queryName("lgate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["banned_layout"] for r in spark.table("lgate").collect()}
    assert got == {"d0": True, "d1": False}

def test_streaming_quality_gate_interleaved_stateless_and_batch_parity(
    spark, tmp_path
):
    from pyspark_validator.pipelines.interleaved import interleaved_quality_gate
    from pyspark_validator.streaming import streaming_quality_gate_interleaved

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = [
        ("good", [sp("text", "enough words to pass the bar", None, 0),
                  sp("image", None, "m://1", 64)]),
        ("wall", [sp("text", "enough words to pass the bar", None, 0)]
                 + [sp("image", None, f"m://w{i}", 64 * (i + 1)) for i in range(4)]),
        ("thin", [sp("text", "hi", None, 0)]),
        ("empty", []),
    ]
    batch = spark.createDataFrame(rows, schema)
    src = tmp_path / "qg_src"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    out = streaming_quality_gate_interleaved(
        stream, max_media=8, max_media_run=3, min_text_tokens=3
    ).select("doc_id", "keep", "flag_media_run", "flag_low_text")
    q = (
        out.writeStream.format("memory")
        .queryName("qgate")
        .outputMode("append")  # append with NO watermark => provably stateless
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: (r["keep"], r["flag_media_run"], r["flag_low_text"])
           for r in spark.table("qgate").collect()}
    assert got == {
        "good": (True, False, False),
        "wall": (False, True, False),   # 4-image run > 3
        "thin": (False, False, True),
        "empty": (False, False, True),
    }
    # batch parity: identical exprs => identical verdicts
    b = {r["doc_id"]: (r["keep"], r["flag_media_run"], r["flag_low_text"])
         for r in interleaved_quality_gate(
             batch, max_media=8, max_media_run=3, min_text_tokens=3
         ).select("doc_id", "keep", "flag_media_run", "flag_low_text").collect()}
    assert b == got


def test_streaming_media_context_counts_windowed(spark, tmp_path):
    from pyspark_validator.streaming import streaming_media_context_counts

    schema = (
        "ts timestamp, doc_id string, spans array<struct<kind:string,"
        "text:string,media_ref:string,offset:int>>"
    )

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = [
        # window 0: one captioned image + one isolated image
        ("2026-01-01 00:00:05", "a",
         [sp("text", "cap", None, 0), sp("image", None, "m://1", 64)]),
        ("2026-01-01 00:00:20", "b", [sp("image", None, "m://2", 0)]),
        # window 1: alt-text dropped -> two isolated images, ratio 0
        ("2026-01-01 00:01:10", "c",
         [sp("image", None, "m://3", 0), sp("image", None, "m://4", 64)]),
    ]
    src = tmp_path / "mcw_src"
    src.mkdir()
    spark.createDataFrame(
        rows,
        "ts_s string, doc_id string, spans array<struct<kind:string,"
        "text:string,media_ref:string,offset:int>>",
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "doc_id", "spans"
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))

    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    out = streaming_media_context_counts(stream, "ts", "1 minute", "2 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("mcw")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.window_start.isoformat(): (
            r.n_docs, r.n_media, r.n_captioned, r.caption_ratio
        )
        for r in spark.table("mcw").collect()
    }
    assert got == {
        "2026-01-01T00:00:00": (2, 2, 1, 0.5),
        "2026-01-01T00:01:00": (1, 2, 0, 0.0),
    }
