#!/usr/bin/env python
"""Streaming endurance soak: sustained rate-source run through the chained
stream gates with state-store telemetry and an exact batch twin.

The streaming gates are pinned by availableNow batch-parity tests, which
prove semantics but not DYNAMICS: that dropDuplicatesWithinWatermark state
actually stays bounded across many watermark closures, and that a long-lived
query neither leaks state nor drifts from the batch semantics. This harness
runs the pipeline

    rate source -> synthesize docs -> streaming_quality_gate
                -> streaming_contamination_fraction (stateless, benchmark
                   index broadcast)
                -> streaming_dedup (dropDuplicatesWithinWatermark)

for ``--minutes`` (default 12) at ``--rows-per-sec`` (default 500), polling
``query.lastProgress`` every 5 s for the dedup operator's state rows/bytes
and the event-time watermark. Content keys recur every C/rate seconds
(``--cycle`` C, default 15000 -> 30 s), far inside the 2-minute watermark, so
each key is emitted, then suppressed for one watermark horizon, then evicted
and re-emitted -- the state row count saturates near C and MUST NOT grow
monotonically.

Correctness twin: the rate source is deterministic (value 0..N-1, ts = start
+ value/rate), so after the run the EXACT same input is rebuilt as a static
frame; the stateless gates are re-run in batch (they are the same functions),
and the dedup stage is replayed by a greedy per-key scan implementing the
dropDuplicatesWithinWatermark contract (keep first arrival; drop re-arrivals
within the watermark delay of the kept one; re-keep afterwards). Margins are
engineered (30 s recurrence vs 120 s delay vs ~1 s micro-batches) so the
contract has one deterministic outcome; the surviving value sets must match
EXACTLY. Planted rows: src % 97 == 0 docs replicate a benchmark item
verbatim (contamination drop); src % 89 == 0 docs are one repeated word
(quality drop).

Usage: python scripts/streaming_soak.py [--minutes 12] [--rows-per-sec 500]
           [--out /tmp/streaming_soak.json]
Numbers land in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

WATERMARK = "2 minutes"
WATERMARK_SEC = 120


# letter-only token material: digit-bearing tokens push digit_ratio past the
# quality gate's noise threshold and zero EVERY doc's quality (the first run
# of this harness dropped 100% of input that way -- vacuous parity). Content
# words come from a fixed vocab with interleaved stopwords; plant ids encode
# digits as letters (same mapping on the Spark and python sides).
_VOCAB = (
    "spark table column filter window query batch stream value scan sort "
    "group hash join vector data shard index merge"
).split()
_STOPS = ["the", "and", "of", "to", "in", "is"]
_L = str.maketrans("0123456789", "abcdefghij")


def synth_docs(df, cycle: int):
    """Deterministic doc synth from rate rows: src = value % cycle decides
    the content; ts is the rate timestamp (event time)."""
    src = F.pmod(F.col("value"), F.lit(cycle))
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    stops = F.array(*[F.lit(w) for w in _STOPS])
    words = F.transform(
        F.sequence(F.lit(0), F.lit(19)),
        lambda i: F.when(
            F.pmod(i, F.lit(3)) == 0,
            F.element_at(stops, F.pmod(F.xxhash64(src, i), F.lit(len(_STOPS))).cast("int") + 1),
        ).otherwise(
            F.element_at(vocab, F.pmod(F.xxhash64(src, i), F.lit(len(_VOCAB))).cast("int") + 1)
        ),
    )
    sl = F.translate(src.cast("string"), "0123456789", "abcdefghij")
    text = (
        F.when(
            F.pmod(src, F.lit(89)) == 0, F.lit("aa " * 20)  # quality-drop plant
        )
        .when(
            F.pmod(src, F.lit(97)) == 0,
            # contamination plant: verbatim benchmark item text (letter-only)
            F.concat(F.lit("bench item "), F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(11)),
                    lambda i: F.concat(
                        F.lit("b"), sl, F.lit("x"),
                        F.translate(i.cast("string"), "0123456789", "abcdefghij"),
                    ),
                ), " ")),
        )
        .otherwise(F.array_join(words, " "))
    )
    return df.select(
        F.col("value"),
        F.col("timestamp").alias("ts"),
        src.alias("src"),
        text.alias("text"),
    )


def benchmark_frame(spark, cycle: int):
    """The benchmark items the contamination plants replicate."""
    srcs = [s for s in range(cycle) if s % 97 == 0]
    rows = []
    for s in srcs:
        sl = str(s).translate(_L)
        toks = " ".join(f"b{sl}x{str(i).translate(_L)}" for i in range(12))
        rows.append((f"bench{s}", f"bench item {toks}"))
    return spark.createDataFrame(rows, "doc_id string, text string")


def build_pipeline(spark, stream, cycle: int):
    from pyspark_validator.streaming import (
        streaming_contamination_fraction,
        streaming_dedup,
        streaming_quality_gate,
    )

    bench = benchmark_frame(spark, cycle)
    s = synth_docs(stream, cycle)
    s = streaming_quality_gate(s, min_quality=0.3)
    s = streaming_contamination_fraction(s, bench, min_frac=0.7)
    s = streaming_dedup(s, watermark=WATERMARK)
    return s.select("value", "ts", "src")


def greedy_dedup_sim(arrivals, rate: float, threshold: float):
    """Greedy per-key replay of the dedup contract: keep the first arrival,
    drop re-arrivals until event time passes last_kept + threshold, then
    keep again. Two candidate thresholds are compared empirically:
    WATERMARK_SEC (the naive reading) and 2*WATERMARK_SEC (the actual
    engine behavior: state for a key kept at T expires when the WATERMARK
    passes T+delay, and the watermark itself trails max event time by
    delay -- so re-emission starts at T + 2*delay). arrivals = sorted
    values per key; event-time gap between a and b = (b - a) / rate."""
    kept = []
    last_kept_at = None
    for v in arrivals:
        t = v / rate
        if last_kept_at is None or t - last_kept_at > threshold:
            kept.append(v)
            last_kept_at = t
    return kept


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=12.0)
    ap.add_argument("--rows-per-sec", type=int, default=500)
    ap.add_argument("--cycle", type=int, default=16_500)
    ap.add_argument("--out", default="/tmp/streaming_soak.json")
    ap.add_argument("--work-dir", default="/tmp/streaming_soak_data")
    args = ap.parse_args()

    shutil.rmtree(args.work_dir, ignore_errors=True)
    os.makedirs(args.work_dir, exist_ok=True)

    from pyspark_validator.session import get_spark

    spark = get_spark(app_name="streaming-soak", shuffle_partitions=8)
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", args.rows_per_sec)
        .load()
    )
    out = build_pipeline(spark, stream, args.cycle)
    sink = f"{args.work_dir}/sink"
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", f"{args.work_dir}/ckpt")
        .trigger(processingTime="2 seconds")
        .start()
    )

    telemetry = []
    t_end = time.time() + args.minutes * 60
    last_batch = -1
    while time.time() < t_end:
        time.sleep(5)
        p = q.lastProgress
        if not p or p.get("batchId") == last_batch:
            continue
        last_batch = p.get("batchId")
        ops = p.get("stateOperators") or []
        dedup_op = next(
            (o for o in ops if "dedupe" in (o.get("operatorName") or "").lower()),
            ops[0] if ops else {},
        )
        telemetry.append(
            {
                "t": round(time.time() - (t_end - args.minutes * 60), 1),
                "batch": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "state_rows": dedup_op.get("numRowsTotal"),
                "state_bytes": dedup_op.get("memoryUsedBytes"),
                "evicted": dedup_op.get("numRowsRemoved"),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
            }
        )
    q.stop()
    q.awaitTermination(60)

    survivors = spark.read.parquet(sink)
    got_values = sorted(r.value for r in survivors.select("value").collect())
    n_input = (max(got_values) + 1) if got_values else 0

    # ---- exact batch twin over the SAME reconstructed input --------------
    from pyspark_validator.streaming import (
        streaming_contamination_fraction,
        streaming_quality_gate,
    )

    batch_in = synth_docs(
        spark.range(n_input).select(
            F.col("id").alias("value"),
            F.timestamp_seconds(
                F.lit(0) + F.col("id") / F.lit(float(args.rows_per_sec))
            ).alias("timestamp"),
        ),
        args.cycle,
    )
    bench = benchmark_frame(spark, args.cycle)
    gated = streaming_quality_gate(batch_in, min_quality=0.3)
    gated = streaming_contamination_fraction(gated, bench, min_frac=0.7)
    gated_vals = [r.value for r in gated.select("value", "src").collect()]
    gated_src = {r.value: r.src for r in gated.select("value", "src").collect()}
    per_key: dict = {}
    for v in sorted(gated_vals):
        per_key.setdefault(gated_src[v], []).append(v)
    expects = {
        thr: sorted(
            v
            for arr in per_key.values()
            for v in greedy_dedup_sim(arr, float(args.rows_per_sec), thr)
        )
        for thr in (WATERMARK_SEC, 2 * WATERMARK_SEC)
    }
    expect = expects[2 * WATERMARK_SEC]
    # the final in-flight watermark horizon is legitimately ambiguous: rows
    # the stream had not yet re-emitted when stopped. Compare on the prefix
    # both sides fully processed (values below the last closed horizon).
    horizon = n_input - int(2 * WATERMARK_SEC * args.rows_per_sec) - args.rows_per_sec * 30
    got_cmp = [v for v in got_values if v < horizon]
    exp_cmp = [v for v in expect if v < horizon]
    exp_cmp_1x = [v for v in expects[WATERMARK_SEC] if v < horizon]
    # a run shorter than the final-horizon margin compares nothing -- report
    # None rather than a vacuous True (needs >= ~6 min at the defaults)
    comparable = horizon > 0 and len(exp_cmp) > 0

    state_rows = [t["state_rows"] for t in telemetry if t.get("state_rows") is not None]
    res = {
        "minutes": args.minutes,
        "rows_per_sec": args.rows_per_sec,
        "cycle": args.cycle,
        "watermark": WATERMARK,
        "input_rows": n_input,
        "survivors": len(got_values),
        "twin_survivors": len(expect),
        "compared_below_horizon": len(exp_cmp),
        "exact_match_below_horizon": (got_cmp == exp_cmp) if comparable else None,
        "match_1x_delay_contract": (got_cmp == exp_cmp_1x) if comparable else None,
        "twin_survivors_1x": len(expects[WATERMARK_SEC]),
        "n_batches": len(telemetry),
        "state_rows_max": max(state_rows) if state_rows else None,
        "state_rows_final": state_rows[-1] if state_rows else None,
        "state_bytes_max": max(
            (t["state_bytes"] for t in telemetry if t.get("state_bytes") is not None),
            default=None,
        ),
        "watermark_closures": (
            int((args.minutes * 60) // WATERMARK_SEC)
        ),
        "telemetry": telemetry,
    }
    print(json.dumps({k: v for k, v in res.items() if k != "telemetry"}, indent=2))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    spark.stop()
    shutil.rmtree(args.work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
