"""Streaming validation: continuous constraint checking over a document stream.

The reference has no streaming operators; its dynamic verifiers (batch
insert/delete deltas, dynamic_fd_verifier.h:20-45) are the semantic precedent --
see SURVEY.md section 2.8. This module lifts the incremental count-state engine
(incremental.py) into Structured Streaming two ways:

  * ``attach_incremental`` -- readStream -> foreachBatch(apply_delta): every
    micro-batch is an insert delta; the versioned state advances per batch and
    per-partition verdicts for TOUCHED partitions are appended to a verdict sink.
    This is exactly the "dynamic verifier" loop, with Spark's checkpointLocation
    giving exactly-once batch replay on restart.
  * ``streaming_violation_counts`` -- a pure Structured Streaming aggregation:
    windowed duplicate-key counts with a watermark (late data handled by Spark's
    state store), for dashboards that want live violation pressure rather than
    exact global verdicts.
  * ``streaming_rule_qualities`` -- windowed NAR support/confidence
    monitoring (checks/nar.py semantics) for "is this invariant degrading"
    dashboards.
  * ``attach_incremental_fused`` -- the same foreachBatch loop over a
    fused.IncrementalFused engine: EVERY member check of a FusedPass (NAR, AC,
    completeness, numeric profile, drift, ...) stays live over the stream for
    one delta-sized agg job per micro-batch, and the callback receives the
    touched-partition slice of each member's verdicts.
  * ``streaming_dedup`` -- exact content dedup on a stream via
    ``dropDuplicatesWithinWatermark`` over the batch pipeline's 8-byte
    normalized-content key; state bounded by rate x watermark horizon.
  * ``streaming_quality_gate`` -- the batch quality gate as a stateless
    streaming filter (pure per-row JVM exprs, no state, no watermark).
  * ``streaming_gap_check`` -- a CUSTOM STATEFUL operator via
    applyInPandasWithState: the per-key sequential-dependency gap check
    (checks/sd.py single-scan semantics) continued ACROSS micro-batches by
    keeping each key's last (order, value) in the state store. Not expressible
    as a windowed agg -- the transition depends on the previous row however
    long ago it arrived.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from pyspark_validator.incremental import IncrementalFD, IncrementalUCC


def attach_incremental(
    stream: DataFrame,
    engine: IncrementalUCC | IncrementalFD,
    checkpoint_location: str,
    on_batch_verdicts: Callable[[DataFrame, int], None] | None = None,
) -> DataStreamWriter:
    """Wire a streaming DataFrame of inserts into an incremental engine.

    Returns the un-started DataStreamWriter so callers pick the trigger
    (``.trigger(availableNow=True)`` for backfill, processingTime for live).
    ``on_batch_verdicts(verdicts_df, batch_id)`` receives the touched-partition
    verdicts after each batch merge.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if engine.state.current_version() < 0:
            engine.initialize(batch_df)
            verdicts = engine.verdicts()
        else:
            verdicts = engine.apply_delta(inserts=batch_df)
        if on_batch_verdicts is not None:
            on_batch_verdicts(verdicts, batch_id)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("update")
    )


def attach_incremental_fused(
    stream: DataFrame,
    engine: "IncrementalFused",  # noqa: F821 -- imported lazily below
    checkpoint_location: str,
    on_batch_verdicts: Callable[[dict[str, DataFrame], int], None] | None = None,
) -> DataStreamWriter:
    """Wire a streaming DataFrame of inserts into a fused incremental engine.

    Each micro-batch folds into the shared per-partition state with ONE
    delta-sized agg job (fused.IncrementalFused.apply_delta), so k member
    checks are maintained for the cost of one scan of the batch.
    ``on_batch_verdicts({name: verdicts_df}, batch_id)`` receives every
    member's verdicts restricted to the partitions the batch touched (the
    full slice on the initializing batch).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if engine.state.current_version() < 0:
            engine.initialize(batch_df)
            touched = None  # every stored partition is from this batch
        else:
            touched = engine.apply_delta(batch_df)
            if not touched:
                return
        if on_batch_verdicts is not None:
            on_batch_verdicts(engine.verdicts(touched), batch_id)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("update")
    )


def streaming_gap_check(
    stream: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    g1: float = 0.0,
    g2: float = float("inf"),
) -> DataFrame:
    """Per-key streaming SD gap check (custom stateful operator).

    Each key's rows are consumed in ``order_col`` order within a batch and
    stitched to the key's last row from ANY previous batch via the state
    store; every adjacent gap outside [g1, g2] emits a violation row
    (kind 'deletion' for delta < g1 -- which also covers out-of-order
    arrivals -- and 'insertion' for delta > g2, the same single-scan
    classification as checks/sd.py violations()). State per key is four
    scalars, so the state store stays O(#keys) regardless of stream length.

    Returns the transformed streaming DataFrame; write it with outputMode
    'append'.
    """
    import pandas as pd  # noqa: PLC0415 -- worker-side import kept local
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    key_fields = [stream.schema[c] for c in key_cols]
    out_schema = StructType(
        key_fields
        + [
            StructField("left_o", DoubleType()),
            StructField("right_o", DoubleType()),
            StructField("val_left", DoubleType()),
            StructField("val_right", DoubleType()),
            StructField("delta", DoubleType()),
            StructField("kind", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_o", DoubleType()),
            StructField("last_v", DoubleType()),
            StructField("n_seen", LongType()),
            StructField("n_violations", LongType()),
        ]
    )
    g1_f, g2_f = float(g1), float(g2)

    def check(key: tuple, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(order_col, kind="mergesort")
        if state.exists:
            last_o, last_v, n_seen, n_viol = state.get
        else:
            last_o = last_v = None
            n_seen = n_viol = 0
        out = []
        for o, v in zip(
            rows[order_col].astype("float64"), rows[value_col].astype("float64")
        ):
            if last_o is not None:
                delta = v - last_v
                kind = (
                    "deletion"
                    if delta < g1_f
                    else ("insertion" if delta > g2_f else None)
                )
                if kind is not None:
                    out.append(
                        key + (last_o, o, last_v, v, delta, kind)
                    )
            last_o, last_v = float(o), float(v)
            n_seen += 1
        n_viol += len(out)
        state.update((last_o, last_v, n_seen, n_viol))
        yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return (
        stream.groupBy(*key_cols)
        .applyInPandasWithState(
            check, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def streaming_violation_counts(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed duplicate pressure: per (window, key) occurrence counts > 1.

    Pure Structured Streaming stateful aggregation -- watermarked, so late rows
    within ``watermark`` still land in their window and older state is evicted.
    Emit mode is the caller's choice; 'update' shows counts as they grow.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") > 1)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *key_cols,
            "occurrences",
        )
    )


def streaming_rule_qualities(
    stream: DataFrame,
    ante: dict,
    cons: dict,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed NAR rule monitoring: per-window support/confidence of a rule
    (checks/nar.py semantics) over a document stream -- live "is this
    invariant degrading" pressure, the streaming analog of NARCheck.

    Pure watermarked aggregation (conditional sums are map-side combinable in
    the state store); confidence is null for windows with no antecedent rows.
    """
    from pyspark_validator.checks.nar import _fits

    fits_ante = _fits(stream, ante)
    fits_both = fits_ante & _fits(stream, cons)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(fits_ante.cast("long")).alias("n_fit_ante"),
            F.sum(fits_both.cast("long")).alias("n_fit_both"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_rows",
            "n_fit_ante",
            "n_fit_both",
            (F.col("n_fit_both") / F.col("n_rows")).alias("support"),
            F.when(
                F.col("n_fit_ante") > 0,
                F.col("n_fit_both") / F.col("n_fit_ante"),
            ).alias("confidence"),
        )
    )


def streaming_dedup(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming exact dedup: drop re-arrivals of the same content.

    The dedup key defaults to ``xxhash64(lower(trim(text)))`` -- the same
    normalized-content key as the batch exact dedup
    (pipelines/dedup.py::exact_duplicates) -- so the state store keeps ONE
    8-byte key per distinct document, never the text.
    ``dropDuplicatesWithinWatermark`` evicts a key once the watermark passes
    its arrival time, so state is bounded by rate x watermark horizon; plain
    ``dropDuplicates`` on a stream would grow state forever.  Pass
    ``key_cols`` to dedup on explicit columns instead (no derived key).
    """
    if key_cols is None:
        from pyspark_validator.pipelines.text import normalize_text

        stream = stream.withColumn(
            "_content_key", F.xxhash64(normalize_text(F.col(text_col)))
        )
        key_cols = ["_content_key"]
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def streaming_quality_gate(
    stream: DataFrame, text_col: str = "text", min_quality: float = 0.3
) -> DataFrame:
    """Stateless quality filter for a document stream.

    ``pipelines/text.py::quality_score`` is pure per-row JVM expressions, so
    it composes with Structured Streaming with zero state and no watermark --
    this wrapper exists to pin that property with a test (and to give the
    stream the same gate semantics as the batch pipeline).
    """
    from pyspark_validator.pipelines.text import quality_score

    return quality_score(stream, text_col=text_col).where(
        F.col("quality") >= min_quality
    )
