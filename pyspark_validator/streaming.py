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
