"""Event sessionization: gap-based session assignment over an event stream.

The training-data/analytics-pipeline companion to the AR mining and drift
checks that already consume the events table: both the reference's
association-rule transactions and real feature pipelines start from "group
this user's events into visits".  A session breaks when the user's
inter-event gap exceeds ``gap_seconds`` (industry-standard 30-minute default).

Scale design (10^12 events): ONE shuffle on the user key; the two window
functions (lag + running sum) run inside each user's sorted partition slice,
so cost is bounded by the hottest user's event count — sessionization is
inherently sequential per user, so that bound is intrinsic, not an
implementation artifact.  Gap comparison and session ordinals are integer
microsecond arithmetic end-to-end (no float drift between engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def _micros(ts: Column) -> Column:
    """Integer microseconds since epoch. Parquet event times usually load as
    TIMESTAMP_NTZ, which unix_micros rejects — cast through TIMESTAMP first;
    the engine session is pinned to UTC (session.py), so the cast is the
    identity on the stored micros (no DST shear inside a user's stream)."""
    return F.unix_micros(ts.cast("timestamp"))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    order_cols: list[str] | None = None,
    session_col: str = "session_seq",
) -> DataFrame:
    """Adds ``session_col``: the 1-based ordinal of the session each event
    belongs to within its user (a new session starts on the first event and
    whenever the gap since the user's previous event EXCEEDS ``gap_seconds``).

    ``order_cols`` breaks timestamp ties deterministically (default: any
    column named ``event_id``, else ties keep input order per Spark's sort,
    which is not deterministic — pass explicit tiebreakers for exactness).
    """
    if order_cols is None:
        order_cols = ["event_id"] if "event_id" in df.columns else []
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = int(round(gap_seconds * 1_000_000))
    prev_us = F.lag(_micros(F.col(ts_col))).over(w)
    brk = F.when(
        prev_us.isNull() | (_micros(F.col(ts_col)) - prev_us > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(brk).over(running).cast("bigint"))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """One row per (user, session): event count, start/end, duration seconds
    (exact microsecond arithmetic).  The groupBy reuses the sessionize
    shuffle's partitioning — Catalyst sees the child is already hash-partitioned
    on the user key, so no second exchange for the aggregation."""
    s = sessionize(df, user_col, ts_col, gap_seconds, order_cols)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (_micros(F.max(ts_col)) - _micros(F.min(ts_col)))
            / F.lit(1_000_000.0)
        ).alias("duration_sec"),
    )
