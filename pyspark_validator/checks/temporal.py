"""Temporal-integrity validation: interval overlaps and event precedence.

Two constraint shapes the tabular DC/OD machinery can express only as pair
joins, implemented here as single window passes (the efficient physical plan
for order-dependent constraints -- same reasoning as checks/sd.py's gap scan
vs the reference's pairwise definition):

  * interval_overlap_check -- "no two intervals of the same key overlap"
    (sessions, bookings, validity ranges). Sorted by start within key, an
    overlap exists iff a running max of previous ends exceeds the next start
    -- one window pass, no self-join; the naive DC pair join is O(n^2) per
    key.
  * precedence_check -- "event B must be preceded by event A within the same
    key" (click-before-purchase, open-before-close). A running count of
    antecedents turns the existential look-back into one window pass.

Scale: both shuffle ONCE keyed by the entity key; per-key data is window-
local. A pathologically hot key (one user with 10^9 events) serializes its
own partition -- the standard caveat for order-dependent checks, stated here
because salting cannot preserve cross-row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def _order_key(df: DataFrame, ts_col: str) -> Column:
    """Numeric sort key for RANGE window frames (timestamps -> micros,
    dates -> epoch days): precedence strictness is defined on the TIME AXIS,
    so ties must be handled by a range frame -- a rows frame would make
    same-timestamp outcomes depend on nondeterministic tie order."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.unix_micros(F.col(ts_col).cast("timestamp"))
    if isinstance(dt, DateType):
        return F.datediff(F.col(ts_col), F.to_date(F.lit("1970-01-01")))
    return F.col(ts_col)


def interval_overlap_check(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    allow_touching: bool = True,
) -> DataFrame:
    """Single-row summary: [n_intervals, n_keys, n_overlaps, n_bad_bounds,
    holds]. An interval overlaps when its start is strictly before the
    running max of previous ends within its key (ties allowed when
    ``allow_touching``); intervals with end < start are counted separately
    as n_bad_bounds (and excluded from overlap detection -- they are their
    own violation class).

    Deterministic tie order: (start, end) sort within key.
    """
    s, e = F.col(start_col), F.col(end_col)
    bad = e < s
    w = (
        Window.partitionBy(*keys)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.when(~bad, e)).over(w)
    overlap = F.when(
        prev_end.isNotNull() & ~bad,
        (s < prev_end) if allow_touching else (s <= prev_end),
    ).otherwise(F.lit(False))
    flagged = df.select(
        *keys, bad.alias("__bad"), overlap.alias("__ov")
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("n_keys"),
        F.sum(F.col("__ov").cast("long")).alias("n_overlaps"),
        F.sum(F.col("__bad").cast("long")).alias("n_bad_bounds"),
    ).withColumn(
        "holds", (F.col("n_overlaps") == 0) & (F.col("n_bad_bounds") == 0)
    )


def interval_overlap_violations(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    allow_touching: bool = True,
) -> DataFrame:
    """The overlapping rows: [keys..., start, end, prev_end] for every
    interval that starts before the running max of previous ends in its key.
    Output bounded by the number of violations, never materializing pairs."""
    s, e = F.col(start_col), F.col(end_col)
    bad = e < s
    w = (
        Window.partitionBy(*keys)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.when(~bad, e)).over(w)
    cond = (
        prev_end.isNotNull()
        & ~bad
        & ((s < prev_end) if allow_touching else (s <= prev_end))
    )
    return (
        df.select(*keys, s.alias("start"), e.alias("end"), prev_end.alias("prev_end"),
                  cond.alias("__v"))
        .filter(F.col("__v"))
        .drop("__v")
    )


def precedence_check(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    antecedent: Column,
    consequent: Column,
    strict: bool = True,
) -> DataFrame:
    """Single-row summary of "every ``consequent`` event is preceded by an
    ``antecedent`` event within its key": [n_rows, n_consequents,
    n_unpreceded, n_keys_violating, holds].

    ``antecedent`` / ``consequent`` are boolean Columns over the row (e.g.
    F.col('event_type') == 'click'). ``strict`` demands a STRICTLY earlier
    antecedent; non-strict accepts same-timestamp antecedents (simultaneous
    events count as preceding each other). RANGE frame, so same-timestamp
    outcomes never depend on tie order. One window pass: running antecedent
    count per key ordered by ts.
    """
    bound = -1 if strict else 0
    w = (
        Window.partitionBy(*keys)
        .orderBy(_order_key(df, ts_col))
        .rangeBetween(Window.unboundedPreceding, bound)
    )
    seen = F.sum(antecedent.cast("long")).over(w)
    unpreceded = consequent & F.coalesce(seen, F.lit(0)).eqNullSafe(0)
    flagged = df.select(
        *keys,
        consequent.alias("__c"),
        unpreceded.alias("__u"),
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("__c").cast("long")).alias("n_consequents"),
        F.sum(F.col("__u").cast("long")).alias("n_unpreceded"),
        F.count_distinct(
            *[F.when(F.col("__u"), F.col(k)) for k in keys]
        ).alias("n_keys_violating"),
    ).withColumn("holds", F.col("n_unpreceded") == 0)


def precedence_violations(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    antecedent: Column,
    consequent: Column,
    strict: bool = True,
) -> DataFrame:
    """The unpreceded consequent rows: [keys..., ts] -- bounded by violation
    count."""
    bound = -1 if strict else 0
    w = (
        Window.partitionBy(*keys)
        .orderBy(_order_key(df, ts_col))
        .rangeBetween(Window.unboundedPreceding, bound)
    )
    seen = F.sum(antecedent.cast("long")).over(w)
    unpreceded = consequent & F.coalesce(seen, F.lit(0)).eqNullSafe(0)
    return (
        df.select(*keys, F.col(ts_col).alias("ts"), unpreceded.alias("__u"))
        .filter(F.col("__u"))
        .drop("__u")
    )
