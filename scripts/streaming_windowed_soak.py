#!/usr/bin/env python
"""Windowed-aggregation streaming endurance soak: the four stateful
operators the round-4 endurance run did NOT cover — native session windows
(``streaming_session_stats``) and the three windowed-histogram monitors
(``streaming_numeric_drift``, ``streaming_categorical_drift``,
``streaming_class_balance``) — run concurrently for ``--minutes`` on the
rate source, with per-batch state-store telemetry and an EXACT batch twin.

What it proves (VERDICT round-4 task 4):
  * state is bounded by design-constant counts (open windows x one counter
    row, open sessions x one row per active user), never by stream length —
    asserted dynamically from ``lastProgress.stateOperators``, with the
    max/final/first-half-max comparison that catches monotonic growth;
  * every CLOSED window/session the stream emitted is byte-identical to
    the batch twin run over the reconstructed input (event time here is a
    pure function of the rate source's ``value``, so the twin is exact by
    construction, not sampled);
  * the planted drift pattern lands where it must: numeric windows with odd
    window-parity carry an x->x^2 skew (drift_detected True), even windows
    are the baseline distribution (False); categorical windows with
    parity %3==2 collapse the label vocabulary to 3 of 10 (drift True);
    the class-balance label stream is stationary (holds True everywhere).

Event time is synthetic and deterministic: ts = EPOCH0 + value/rate, with
EPOCH0 a multiple of 3600 so tumbling windows of any divisor-of-3600
duration align exactly; the watermark advances with max event time, which
grows with processing time because the rate source emits values in order.

Sessions use a bursty schedule: user = value %% n_users, 30 s epochs, a
user is active only in epochs where (user + epoch) %% 3 == 0 — so each
active burst is one session (intra-burst gap 0.6 s << gap) and the 60 s
idle between bursts (> gap) splits sessions deterministically.

Usage: python scripts/streaming_windowed_soak.py [--minutes 12]
           [--rows-per-sec 500] [--out /tmp/streaming_windowed_soak.json]
Smoke (~2.5 min): --minutes 2 --window-sec 15 --watermark-sec 30
           --epoch-sec 10 --session-gap-sec 6 --session-wm-sec 15
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

# multiple of 3600 -> windows of 60/30/15/10/6 s all align to ts = EPOCH0
EPOCH0 = 1_755_820_800

N_LABELS = 10
NUM_BINS = 10


def synth_events(df, rate: float, window_sec: int, epoch_sec: int, n_users: int):
    """Deterministic event synth from rate rows (only ``value`` is used —
    the twin reconstructs the identical frame from spark.range):
      ts     = EPOCH0 + value/rate                       (event time)
      u      = xxhash64(value) -> uniform [0,1)          (numeric base)
      x      = u, except odd-window-parity rows use u^2  (planted skew)
      label  = 'l<h%%10>' stationary                      (class balance)
      labeld = label, except parity%%3==2 windows map h%%10 -> h%%3 (plant)
      user   = value %% n_users, rows kept only in the user's active epochs
               (sessions input; the other streams keep every row).
    """
    v = F.col("value")
    ts_sec = F.lit(float(EPOCH0)) + v / F.lit(rate)
    wpar = F.floor(ts_sec / F.lit(window_sec))
    h = F.pmod(F.xxhash64(v, F.lit(1)), F.lit(100_000))
    u = h.cast("double") / F.lit(100_000.0)
    x = F.when(F.pmod(wpar, F.lit(2)) == 1, u * u).otherwise(u)
    h2 = F.pmod(F.xxhash64(v, F.lit(2)), F.lit(N_LABELS))
    label = F.concat(F.lit("l"), h2.cast("string"))
    labeld = F.when(
        F.pmod(wpar, F.lit(3)) == 2,
        F.concat(F.lit("l"), F.pmod(h2, F.lit(3)).cast("string")),
    ).otherwise(label)
    epoch = F.floor(ts_sec / F.lit(epoch_sec))
    user = F.pmod(v, F.lit(n_users))
    active = F.pmod(user + epoch, F.lit(3)) == 0
    return df.select(
        v.alias("value"),
        F.timestamp_seconds(ts_sec).alias("ts"),
        x.alias("x"),
        label.alias("label"),
        labeld.alias("labeld"),
        user.alias("user_id"),
        active.alias("active"),
    )


def analytic_baselines():
    """Frozen baselines in the exact dict shapes numeric_baseline /
    categorical_baseline emit, built from the ANALYTIC distributions the
    even-parity stream draws from (uniform [0,1) for x, uniform over the
    10 labels). Count magnitude only scales the smoothing term, so a round
    1e6-sample census is used for both."""
    n = 1_000_000
    numeric = {
        "lo": 0.0,
        "hi": 1.0,
        "num_bins": NUM_BINS,
        "bins": list(range(-1, NUM_BINS + 1)),
        # sentinel bins (underflow, overflow) empty; hi is exclusive for
        # u in [0,1) except u==1.0 never occurs (h < 100000)
        "counts": [0] + [n // NUM_BINS] * NUM_BINS + [0],
        "n": n,
    }
    categorical = {
        "values": [f"l{i}" for i in range(N_LABELS)],
        "counts": [n // N_LABELS] * N_LABELS,
        "other_count": 0,
        "n": n,
    }
    expected = {f"l{i}": 1.0 / N_LABELS for i in range(N_LABELS)}
    return numeric, categorical, expected


def build_queries(spark, args, work):
    from pyspark_validator.streaming import (
        streaming_categorical_drift,
        streaming_class_balance,
        streaming_numeric_drift,
        streaming_session_stats,
    )

    numeric_b, categorical_b, expected = analytic_baselines()
    wdur = f"{args.window_sec} seconds"
    wm = f"{args.watermark_sec} seconds"

    def mk_stream():
        raw = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", args.rows_per_sec)
            .load()
        )
        return synth_events(
            raw, float(args.rows_per_sec), args.window_sec, args.epoch_sec,
            args.n_users,
        )

    defs = {
        "numdrift": lambda s: streaming_numeric_drift(
            s, "x", "ts", numeric_b, window_duration=wdur, watermark=wm
        ),
        "catdrift": lambda s: streaming_categorical_drift(
            s.withColumnRenamed("labeld", "lab"), "lab", "ts", categorical_b,
            window_duration=wdur, watermark=wm,
        ),
        "classbal": lambda s: streaming_class_balance(
            s, "label", "ts", expected, window_duration=wdur, watermark=wm
        ),
        "sessions": lambda s: streaming_session_stats(
            s.where("active"), user_col="user_id", ts_col="ts",
            gap=f"{args.session_gap_sec} seconds",
            watermark=f"{args.session_wm_sec} seconds",
        ),
    }
    queries = {}
    for name, fn in defs.items():
        out = fn(mk_stream())
        queries[name] = (
            out.writeStream.format("parquet")
            .option("path", f"{work}/{name}/sink")
            .option("checkpointLocation", f"{work}/{name}/ckpt")
            .trigger(processingTime="2 seconds")
            .queryName(name)
            .start()
        )
    return queries, (numeric_b, categorical_b, expected)


def batch_twins(spark, args, n_rows: int, baselines):
    """The same four operators over the reconstructed static input."""
    from pyspark_validator.streaming import (
        streaming_categorical_drift,
        streaming_class_balance,
        streaming_numeric_drift,
        streaming_session_stats,
    )

    numeric_b, categorical_b, expected = baselines
    static = synth_events(
        spark.range(n_rows).select(F.col("id").alias("value")),
        float(args.rows_per_sec), args.window_sec, args.epoch_sec,
        args.n_users,
    )
    wdur = f"{args.window_sec} seconds"
    wm = f"{args.watermark_sec} seconds"
    return {
        "numdrift": streaming_numeric_drift(
            static, "x", "ts", numeric_b, window_duration=wdur, watermark=wm
        ),
        "catdrift": streaming_categorical_drift(
            static.withColumnRenamed("labeld", "lab"), "lab", "ts",
            categorical_b, window_duration=wdur, watermark=wm,
        ),
        "classbal": streaming_class_balance(
            static, "label", "ts", expected, window_duration=wdur, watermark=wm
        ),
        "sessions": streaming_session_stats(
            static.where("active"), user_col="user_id", ts_col="ts",
            gap=f"{args.session_gap_sec} seconds",
            watermark=f"{args.session_wm_sec} seconds",
        ),
    }


def rows_key(r):
    """Deterministic sort/compare key: floats via repr of round(12) — the
    twin evaluates the IDENTICAL column expressions over identical longs, so
    12 digits only guards against printing noise, not real divergence."""
    out = []
    for v in r:
        if isinstance(v, float):
            out.append(repr(round(v, 12)))
        else:
            out.append(repr(v))
    return tuple(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=12.0)
    ap.add_argument("--rows-per-sec", type=int, default=500)
    ap.add_argument("--window-sec", type=int, default=60)
    ap.add_argument("--watermark-sec", type=int, default=120)
    ap.add_argument("--epoch-sec", type=int, default=30)
    ap.add_argument("--session-gap-sec", type=int, default=20)
    ap.add_argument("--session-wm-sec", type=int, default=60)
    ap.add_argument("--n-users", type=int, default=300)
    ap.add_argument("--out", default="/tmp/streaming_windowed_soak.json")
    ap.add_argument("--work-dir", default="/tmp/streaming_windowed_soak_data")
    args = ap.parse_args()

    shutil.rmtree(args.work_dir, ignore_errors=True)
    os.makedirs(args.work_dir, exist_ok=True)

    from pyspark_validator.session import get_spark

    spark = get_spark(app_name="streaming-windowed-soak", shuffle_partitions=8)
    queries, baselines = build_queries(spark, args, args.work_dir)

    telemetry = {name: [] for name in queries}
    last_batch = {name: -1 for name in queries}
    t0 = time.time()
    t_end = t0 + args.minutes * 60
    while time.time() < t_end:
        time.sleep(5)
        for name, q in queries.items():
            p = q.lastProgress
            if not p or p.get("batchId") == last_batch[name]:
                continue
            last_batch[name] = p.get("batchId")
            ops = p.get("stateOperators") or []
            op = ops[0] if ops else {}
            telemetry[name].append(
                {
                    "t": round(time.time() - t0, 1),
                    "batch": p.get("batchId"),
                    "input_rows": p.get("numInputRows"),
                    "state_rows": op.get("numRowsTotal"),
                    "state_bytes": op.get("memoryUsedBytes"),
                    "evicted": op.get("numRowsRemoved"),
                    "watermark": (p.get("eventTime") or {}).get("watermark"),
                }
            )
    for q in queries.values():
        q.stop()
    for q in queries.values():
        q.awaitTermination(60)

    # ---- exact batch twins over the reconstructed input ------------------
    # The comparison is keyed off each query's FINAL WATERMARK W (the
    # engine's own guarantee, read from the last progress event — polling
    # can miss batches, so input-row sums are NOT reliable):
    #   * every emitted window has end <= W and its content is fully
    #     determined by events with ts < W, so a twin rebuilt out to
    #     W + delay + margin contains it EXACTLY ("got subset of twin");
    #   * every twin window with end <= W - eps MUST have been emitted
    #     (append mode emits a window in the batch whose watermark passes
    #     its end; sessions additionally wait out the merge gap).
    from datetime import datetime

    def _wm_epoch(tel):
        wm = next(
            (t["watermark"] for t in reversed(tel) if t.get("watermark")), None
        )
        if not wm:
            return None
        return datetime.fromisoformat(wm.replace("Z", "+00:00")).timestamp()

    res_ops = {}
    for name in queries:
        tel = telemetry[name]
        w_last = _wm_epoch(tel)
        wm_sec = (
            args.watermark_sec if name != "sessions" else args.session_wm_sec
        )
        close_lag = 1.0 + (
            args.session_gap_sec if name == "sessions" else 0
        )
        n = (
            int((w_last + wm_sec + 2 * args.window_sec - EPOCH0)
                * args.rows_per_sec)
            if w_last
            else 0
        )
        twin_df = batch_twins(spark, args, n, baselines)[name]
        got_df = spark.read.parquet(f"{args.work_dir}/{name}/sink")
        cols = sorted(got_df.columns)
        end_col = "window_end" if "window_end" in cols else "session_end"
        got = sorted(rows_key(r) for r in got_df.select(*cols).collect())
        # tz-proof window-end epoch via unix_micros, outside the row key
        twin_rows = twin_df.select(
            *cols,
            (F.unix_micros(F.col(end_col).cast("timestamp")) / 1e6).alias(
                "__end_unix"
            ),
        ).collect()
        twin_keyed = [rows_key(r[: len(cols)]) for r in twin_rows]
        got_set = set(got)
        twin_set = set(twin_keyed)
        emitted_in_twin = [k for k in got if k in twin_set]
        must_emit = [
            k
            for r, k in zip(twin_rows, twin_keyed)
            if w_last is not None and r["__end_unix"] <= w_last - close_lag
        ]
        missing = [k for k in must_emit if k not in got_set]
        state_rows = [t["state_rows"] for t in tel if t["state_rows"] is not None]
        half = len(state_rows) // 2
        res_ops[name] = {
            "twin_input_rows": n,
            "final_watermark_epoch": w_last,
            "batches": len(tel),
            "emitted": len(got),
            "twin_total": len(twin_keyed),
            "emitted_all_in_twin": len(emitted_in_twin) == len(got),
            "emitted_mismatches": len(got) - len(emitted_in_twin),
            "below_horizon_expected": len(must_emit),
            "below_horizon_missing": len(missing),
            "exact": len(emitted_in_twin) == len(got) and not missing,
            "state_rows_max": max(state_rows) if state_rows else None,
            "state_rows_final": state_rows[-1] if state_rows else None,
            "state_rows_first_half_max": max(state_rows[:half]) if half else None,
            "state_bytes_max": max(
                (t["state_bytes"] for t in tel if t["state_bytes"] is not None),
                default=None,
            ),
            "telemetry": tel,
        }

    # ---- planted drift truths off the emitted rows -----------------------
    def flag_by_parity(name, flag_col, mod):
        df = spark.read.parquet(f"{args.work_dir}/{name}/sink")
        rows = df.select(
            (
                F.floor(F.unix_timestamp("window_start") / args.window_sec)
                % mod
            ).alias("par"),
            F.col(flag_col),
        ).collect()
        out = {}
        for r in rows:
            out.setdefault(int(r["par"]), set()).add(bool(r[flag_col]))
        return {k: sorted(v) for k, v in sorted(out.items())}

    planted = {
        "numdrift_flag_by_parity2": flag_by_parity("numdrift", "drift_detected", 2),
        "catdrift_flag_by_parity3": flag_by_parity("catdrift", "drift_detected", 3),
        "classbal_holds_by_parity2": flag_by_parity("classbal", "holds", 2),
    }
    planted["numdrift_exact"] = planted["numdrift_flag_by_parity2"] == {
        0: [False],
        1: [True],
    }
    planted["catdrift_exact"] = planted["catdrift_flag_by_parity3"] in (
        {0: [False], 1: [False], 2: [True]},
    )
    planted["classbal_all_hold"] = all(
        v == [True] for v in planted["classbal_holds_by_parity2"].values()
    )

    # state bounds (design constants, independent of stream length):
    #  * windowed aggs: one counter row per open window; a window stays in
    #    state from first event until the watermark (delay behind max event
    #    time) passes its end -> <= watermark/window + in-flight slack.
    #  * sessions: one row per not-yet-evicted session; a session lives
    #    session_len (=epoch) + gap + watermark + batch slack seconds, and
    #    n_users/3 sessions start per epoch.
    import math

    sess_life = args.epoch_sec + args.session_gap_sec + args.session_wm_sec + 5
    bounds = {
        "windowed_bound": args.watermark_sec // args.window_sec + 3,
        "sessions_bound": math.ceil(args.n_users / 3)
        * (math.ceil(sess_life / args.epoch_sec) + 1),
    }
    for name in res_ops:
        b = (
            bounds["sessions_bound"]
            if name == "sessions"
            else bounds["windowed_bound"]
        )
        m = res_ops[name]["state_rows_max"]
        res_ops[name]["state_bound"] = b
        res_ops[name]["state_bounded"] = m is not None and m <= b

    res = {
        "minutes": args.minutes,
        "rows_per_sec": args.rows_per_sec,
        "window_sec": args.window_sec,
        "watermark_sec": args.watermark_sec,
        "n_users": args.n_users,
        "watermark_closures": int(args.minutes * 60) // args.watermark_sec,
        "ops": res_ops,
        "planted": planted,
        "all_exact": all(o["exact"] for o in res_ops.values()),
        "all_bounded": all(o["state_bounded"] for o in res_ops.values()),
    }
    print(
        json.dumps(
            {
                **{k: v for k, v in res.items() if k != "ops"},
                "ops": {
                    n: {k: v for k, v in o.items() if k != "telemetry"}
                    for n, o in res_ops.items()
                },
            },
            indent=2,
        )
    )
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    spark.stop()
    shutil.rmtree(args.work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
