"""Sequential-dependency (SD) validation.

Reference (sd/sd_verifier/sd_verifier.h:17-76): rows ordered by X; the SD holds iff
every adjacent gap in Y lies within [g1, g2]. Violations are typed:
  * SDDeletion  -- a gap < g1 (the right row must be deleted),
  * SDInsertion -- a gap > g2, bridgeable with min_insertions = ceil(d/g2)-1 and
    max_insertions = floor(d/g1)-1 (infinite when g1 == 0).
Confidence = (N - ops) / N where ops = #deletions + sum(min_insertions).

Two modes:
  * summary()/violations() -- single-scan gap semantics (each adjacent gap
    scored independently): a distributed, streaming-cheap violation SCORE.
    ``holds`` is exact (score 0 <=> no violating gap <=> SD holds), and the
    per-gap insertion counts are exact (insertions never affect neighboring
    gaps), but cascading DELETIONS can make the score either side of the
    true minimum: deleting a gap's right row merges two gaps, which may
    itself violate ([1,4,0,1] under [1,3] scores 1 yet needs 2 ops).
  * optimal() -- the reference's exact minimum (sd_verifier.h:69-80,
    sd_verifier.cpp CalculateOps): Fenwick-per-residue-class DP for the exact
    gap case (g1 == g2) and a coordinate-compressed segment-tree RMQ DP for
    the interval case, reimplemented in Python and run inside applyInPandas.
    The DP is inherently sequential (every element's best predecessor ranges
    over the whole prefix), so each sequence/group runs on one executor task;
    use it per group (the common SD shape: one sequence per device/session)
    or on sequences that fit an executor, and the gap mode for a cheap
    distributed screen of 10^12-row global sequences.

Spark design -- a global order without a global sort bottleneck:
  1. repartitionByRange(X) + sortWithinPartitions(X): Spark's range partitioner
     samples split points, so partitions hold contiguous, sorted X-ranges.
  2. lag() windows *partitioned* by spark_partition_id -- per-partition windows, no
     single-reducer global window.
  3. The P-1 cross-partition boundary gaps come from a tiny per-partition
     first/last aggregation (P rows, broadcast-joined back) -- the classic
     distributed adjacent-difference pattern.
At 10^12 rows this is one range shuffle + map-local windows + a P-row rollup.
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact-minimum DP (sd_verifier.cpp CalculateOps / ReconstructPath)

_EPS100 = 100.0 * 2.220446049250313e-16
_BIG = (1 << 62)


def _almost_equal(a: float, b: float) -> bool:
    diff = abs(a - b)
    if diff <= _EPS100:
        return True
    return diff <= max(abs(a), abs(b)) * _EPS100


def _lround(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _dcost(d: float, g1: float, g2: float) -> int:
    """Min insertions+1 ("steps") covering distance d with per-step gap in
    [g1, g2]; -1 if impossible (sd_verifier.cpp CalculateDCost)."""
    if d < 0:
        return -1
    if math.isinf(g2):
        return 1 if d >= g1 else -1
    k = max(int(math.ceil(d / g2)), 1)
    return k if k * g1 <= d else -1


class _MinFenwick:
    """Prefix-min Fenwick keyed by value rank; payload (key, source, t, j)."""

    def __init__(self, n: int):
        self.n = n
        self.t = [(_BIG, -1, 0, 0)] * (n + 1)

    def update(self, pos: int, key: int, source: int, tv: int, jv: int) -> None:
        pos += 1
        while pos <= self.n:
            if key < self.t[pos][0]:
                self.t[pos] = (key, source, tv, jv)
            pos += pos & (-pos)

    def query(self, pos: int):
        res = (_BIG, -1, 0, 0)
        pos += 1
        while pos > 0:
            if self.t[pos][0] < res[0]:
                res = self.t[pos]
            pos -= pos & (-pos)
        return None if res[1] == -1 else res


class _MinSegTree:
    """Range-min tree over value ranks; payload (key, rank, source, t, j)."""

    def __init__(self, n: int):
        self.n = n
        self.t = [(math.inf, -1, -1, 0, 0)] * (2 * n)

    def update(self, pos: int, key: float, rank: int, source: int, tv: int, jv: int) -> None:
        pos += self.n
        self.t[pos] = (key, rank, source, tv, jv)
        pos >>= 1
        while pos > 0:
            l, r = self.t[pos << 1], self.t[(pos << 1) | 1]
            self.t[pos] = l if l[0] <= r[0] else r
            pos >>= 1

    def query(self, lo: int, hi: int):
        """Min over ranks [lo, hi); replacement only on strictly smaller key,
        same traversal as the reference's iterative Query."""
        res = None
        lo += self.n
        hi += self.n
        while lo < hi:
            if lo & 1:
                if res is None or self.t[lo][0] < res[0]:
                    res = self.t[lo]
                lo += 1
            if hi & 1:
                hi -= 1
                if res is None or self.t[hi][0] < res[0]:
                    res = self.t[hi]
            lo >>= 1
            hi >>= 1
        return None if res is None or res[2] == -1 else res


def _exact_gap_classes(values: list[float], g1: float) -> list[int]:
    """Residue classes of value mod g1 with AlmostEqual boundaries and the
    0 ~ g1 wrap-around merge (sd_verifier.cpp InitExactGap)."""
    n = len(values)
    rem = sorted(
        ((math.fmod(v, g1) + g1) if math.fmod(v, g1) < 0 else math.fmod(v, g1), i)
        for i, v in enumerate(values)
    )
    class_id = [0] * n
    cid = 0
    class_id[rem[0][1]] = 0
    for k in range(1, n):
        if not _almost_equal(rem[k][0], rem[k - 1][0]):
            cid += 1
        class_id[rem[k][1]] = cid
    if cid > 0 and _almost_equal(g1 + rem[0][0], rem[-1][0]):
        last_cid, first_cid = class_id[rem[-1][1]], class_id[rem[0][1]]
        class_id = [first_cid if c == last_cid else c for c in class_id]
    remap: dict[int, int] = {}
    for i in range(n):
        remap.setdefault(class_id[i], len(remap))
        class_id[i] = remap[class_id[i]]
    return class_id


def _optimal_ops(values: list[float], g1: float, g2: float):
    """Exact minimum deletions+insertions and the optimal path's violations
    (positions into `values`): returns (ops, deletions, insertions) where
    insertions are (left_pos, right_pos, min_ins, max_ins) gap records."""
    n = len(values)
    if n <= 1:
        return 0, [], []
    exact = (not math.isinf(g2)) and _almost_equal(g1, g2)
    zero_g1 = _almost_equal(g1, 0.0)

    if exact:
        class_id = _exact_gap_classes(values, g1)
        ncls = max(class_id) + 1
        class_vals = [sorted({values[i] for i in range(n) if class_id[i] == c}) for c in range(ncls)]
        fenwicks = [_MinFenwick(len(cv)) for cv in class_vals]
        uniq, tree, best_prefix = [], None, []
    else:
        class_id, class_vals, fenwicks = [], [], []
        uniq = sorted(set(values))
        tree = _MinSegTree(len(uniq))
        best_prefix = [(_BIG, -1, 0, 0)] * len(uniq)

    t = [0] * n
    ops = [0] * n
    t_prev = [-1] * n
    ops_from_t = [True] * n

    def seed():
        if exact:
            c = class_id[0]
            r0 = bisect.bisect_left(class_vals[c], values[0])
            fenwicks[c].update(r0, -_lround(values[0] / g1), 0, 0, 0)
        else:
            r0 = bisect.bisect_left(uniq, values[0])
            best_prefix[r0] = (0, 0, 0, 0)
            key = 0.0 if math.isinf(g2) else -uniq[r0] / g2
            tree.update(r0, key, r0, 0, 0, 0)

    def interval_candidate(cur: float, i: int, lo: int, hi: int, best):
        res = tree.query(lo, hi)
        if res is None:
            return best
        dc = _dcost(cur - uniq[res[1]], g1, g2)
        if dc == -1:
            return best
        cost = res[3] + (i - 1 - res[4]) + (dc - 1)
        if best is None or cost <= best[0]:
            return (cost, res[2])
        return best

    def interval_bands(cur: float, i: int):
        """(min2_cost, min2_j) via the reference's band walk
        (ProcessIntervalBands)."""
        best = None
        if math.isinf(g2):
            r = bisect.bisect_right(uniq, cur - g1)
            if r > 0:
                best = interval_candidate(cur, i, 0, r, best)
            return best
        if zero_g1:
            r = bisect.bisect_left(uniq, cur)
            if r > 0:
                best = interval_candidate(cur, i, 0, r, best)
            return best
        k = 1
        while True:
            high, low = cur - k * g1, cur - k * g2
            if high < uniq[0]:
                break
            lo_i = bisect.bisect_left(uniq, low)
            hi_i = bisect.bisect_right(uniq, high)
            if lo_i < hi_i:
                best = interval_candidate(cur, i, lo_i, hi_i, best)
            if k * (g2 - g1) >= g1:
                r = bisect.bisect_right(uniq, high)
                if r > 0:
                    best = interval_candidate(cur, i, 0, r, best)
                break
            k += 1
        return best

    seed()
    for i in range(1, n):
        cur = values[i]
        t[i] = i  # delete every earlier element
        t_prev[i] = -1
        if exact:
            c = class_id[i]
            ri = bisect.bisect_left(class_vals[c], cur)
            if ri > 0:
                res = fenwicks[c].query(ri - 1)  # (key, source, t_val, j_val)
                if res is not None:
                    dc = _lround((cur - values[res[3]]) / g1)
                    cost = res[2] + (i - 1 - res[3]) + (dc - 1)
                    if cost <= t[i]:
                        t[i], t_prev[i] = cost, res[1]
        else:
            cand = interval_bands(cur, i)
            if cand is not None and cand[0] <= t[i]:
                t[i], t_prev[i] = cand
            if zero_g1:
                r = bisect.bisect_left(uniq, cur)
                if best_prefix[r][1] != -1:
                    m3 = best_prefix[r][0] + (i - 1)
                    if m3 <= t[i]:
                        t[i], t_prev[i] = m3, best_prefix[r][1]
        if ops[i - 1] + 1 < t[i]:
            ops[i] = ops[i - 1] + 1
            ops_from_t[i] = False
        else:
            ops[i] = t[i]
            ops_from_t[i] = True
        if exact:
            c = class_id[i]
            ri = bisect.bisect_left(class_vals[c], cur)
            fenwicks[c].update(ri, t[i] - i - _lround(cur / g1), i, t[i], i)
        else:
            ri = bisect.bisect_left(uniq, cur)
            tm = t[i] - i
            if tm < best_prefix[ri][0]:
                best_prefix[ri] = (tm, i, t[i], i)
                key = float(tm) if math.isinf(g2) else tm - cur / g2
                tree.update(ri, key, ri, i, t[i], i)

    deletions, insertions = _reconstruct(values, ops_from_t, t_prev, exact, g1, g2, zero_g1)
    return ops[n - 1], deletions, insertions


def _reconstruct(values, ops_from_t, t_prev, exact, g1, g2, zero_g1):
    """Optimal path -> violation positions (sd_verifier.cpp ReconstructPath)."""
    deletions: list[int] = []
    insertions: list[tuple[int, int, int, int]] = []
    cur = len(values) - 1
    while cur >= 0 and not ops_from_t[cur]:
        deletions.append(cur)
        cur -= 1
    while cur >= 0:
        prev = t_prev[cur]
        if prev == -1:
            deletions.extend(range(cur - 1, -1, -1))
            break
        if exact:
            dc = _lround((values[cur] - values[prev]) / g1)
        else:
            dc = _dcost(values[cur] - values[prev], g1, g2)
        if dc > 1:
            max_ins = dc - 1
            if not exact and not zero_g1:
                max_ins = int(math.floor((values[cur] - values[prev]) / g1)) - 1
            insertions.append((prev, cur, dc - 1, max_ins))
        deletions.extend(range(cur - 1, prev, -1))
        cur = prev
    deletions.reverse()
    insertions.reverse()
    return deletions, insertions


@dataclass
class SDCheck:
    """Lazy SD check: order by ``order_col``, gaps on ``value_col`` in [g1, g2]."""

    df: DataFrame
    order_col: str
    value_col: str
    g1: float = 0.0
    g2: float = float("inf")
    num_partitions: int = 64

    @cached_property
    def _gaps(self) -> DataFrame:
        """One row per adjacent pair: [left_o, right_o, val_left, val_right, delta].

        Within-partition pairs via lag over (pid-partitioned, X-ordered) windows;
        boundary pairs via per-partition (first,last) rollup self-joined on pid+1.
        """
        d = (
            self.df.select(
                F.col(self.order_col).cast("double").alias("__o"),
                F.col(self.value_col).cast("double").alias("__v"),
            )
            .filter(F.col("__o").isNotNull() & F.col("__v").isNotNull())
            .repartitionByRange(self.num_partitions, F.col("__o"))
            .sortWithinPartitions("__o")
            .withColumn("__pid", F.spark_partition_id())
        )
        w = Window.partitionBy("__pid").orderBy("__o")
        inner = d.select(
            F.lag("__o").over(w).alias("left_o"),
            F.col("__o").alias("right_o"),
            F.lag("__v").over(w).alias("val_left"),
            F.col("__v").alias("val_right"),
        ).filter(F.col("left_o").isNotNull())
        # boundary pairs: last row of pid k joined to first row of the next
        # non-empty pid -- rank pids densely first so empty range buckets don't
        # drop boundary gaps.
        edges = d.groupBy("__pid").agg(
            F.min_by(F.struct("__o", "__v"), "__o").alias("first"),
            F.max_by(F.struct("__o", "__v"), "__o").alias("last"),
        )
        # P rows total (one per range partition): a single-partition window is
        # exactly right and bounded by num_partitions. pmod(__pid, 1) is a
        # constant-0 partition key that Catalyst cannot constant-fold away
        # (lit(0) would be pruned, resurfacing the WindowExec warning).
        wp = Window.partitionBy(F.pmod(F.col("__pid"), F.lit(1))).orderBy("__pid")
        seq = edges.withColumn("__rank", F.row_number().over(wp))
        a, b = seq.alias("a"), seq.alias("b")
        boundary = a.join(
            b, F.col("b.__rank") == F.col("a.__rank") + 1, "inner"
        ).select(
            F.col("a.last.__o").alias("left_o"),
            F.col("b.first.__o").alias("right_o"),
            F.col("a.last.__v").alias("val_left"),
            F.col("b.first.__v").alias("val_right"),
        )
        return inner.unionByName(boundary).withColumn(
            "delta", F.col("val_right") - F.col("val_left")
        )

    def violations(self) -> DataFrame:
        """Typed violations (SDDeletion/SDInsertion analog):
        [kind, left_o, right_o, val_left, val_right, delta, min_insertions,
        max_insertions]."""
        d = F.col("delta")
        g1, g2 = F.lit(float(self.g1)), F.lit(float(self.g2))
        kind = F.when(d < g1, F.lit("deletion")).when(d > g2, F.lit("insertion"))
        min_ins = F.when(
            d > g2, F.greatest(F.ceil(d / g2) - 1, F.lit(1)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        max_ins = F.when(
            d > g2,
            F.when(g1 > 0, (F.floor(d / g1) - 1).cast("long")).otherwise(
                F.lit(None).cast("long")  # unbounded when g1 == 0
            ),
        ).otherwise(F.lit(0).cast("long"))
        return (
            self._gaps.withColumn("kind", kind)
            .filter(F.col("kind").isNotNull())
            .select(
                "kind",
                "left_o",
                "right_o",
                "val_left",
                "val_right",
                "delta",
                min_ins.alias("min_insertions"),
                max_ins.alias("max_insertions"),
            )
        )

    def summary(self) -> DataFrame:
        """Single row: holds, n_gaps, n_deletions, n_insertion_gaps, ops,
        confidence = (N - ops) / N (sd_verifier.h:64-66). ``holds`` is exact;
        ``ops`` is the per-gap score (see module docstring) -- use optimal()
        when the exact minimum matters."""
        n_rows = self.df.select(
            F.count(
                F.when(
                    F.col(self.order_col).isNotNull()
                    & F.col(self.value_col).isNotNull(),
                    F.lit(1),
                )
            ).alias("n")
        )
        # ONE aggregation over the gap stream (classifications are cheap
        # conditional sums; a separate violations() pass would re-derive the
        # whole range-partition + window lineage)
        d = F.col("delta")
        g1, g2 = F.lit(float(self.g1)), F.lit(float(self.g2))
        is_del = d < g1
        is_ins = d > g2
        min_ins = F.when(
            is_ins, F.greatest(F.ceil(d / g2) - 1, F.lit(1)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        v = self._gaps.agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum(is_del.cast("long")).alias("n_deletions"),
            F.sum(is_ins.cast("long")).alias("n_insertion_gaps"),
            F.sum(min_ins).alias("total_min_insertions"),
        )
        out = v.crossJoin(n_rows)
        ops = F.coalesce(F.col("n_deletions"), F.lit(0)) + F.coalesce(
            F.col("total_min_insertions"), F.lit(0)
        )
        return out.select(
            (ops == 0).alias("holds"),
            "n_gaps",
            F.coalesce("n_deletions", F.lit(0)).alias("n_deletions"),
            F.coalesce("n_insertion_gaps", F.lit(0)).alias("n_insertion_gaps"),
            ops.alias("ops"),
            F.when(F.col("n") > 0, (F.col("n") - ops) / F.col("n"))
            .otherwise(F.lit(1.0))
            .alias("confidence"),
        )


    def optimal(
        self,
        id_col: str | None = None,
        by: list[str] | None = None,
        violation_cap: int = 1000,
    ) -> DataFrame:
        """Exact minimum operation count per sequence (sd_verifier.cpp
        CalculateOps parity): rows sorted by (order_col, value_col), DP over
        the value sequence. One row per group (single row when by=None).

        ``deletions`` holds the id_col values (or 0-based sorted positions
        when id_col is None) of rows the optimal repair deletes;
        ``insertions`` the bridged gaps with min/max insertion counts
        (SDInsertion semantics, sd_verifier.h:22-38)."""
        from pyspark.sql.types import (
            ArrayType,
            BooleanType,
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        g1, g2 = float(self.g1), float(self.g2)
        if g1 < 0:
            raise ValueError("g1 must be non-negative")
        if not math.isinf(g2):
            if g2 < g1:
                raise ValueError("g2 must be >= g1 (or infinite)")
            if _almost_equal(g1, 0.0) and _almost_equal(g2, 0.0):
                raise ValueError("g1 and g2 cannot both be zero")
        by = list(by or [])
        sel = [F.col(c) for c in by] + [
            F.col(self.order_col).cast("double").alias("__x"),
            F.col(self.value_col).cast("double").alias("__v"),
            (
                F.col(id_col).cast("long") if id_col else F.lit(None).cast("long")
            ).alias("__id"),
        ]
        d = self.df.select(*sel).filter(
            F.col("__x").isNotNull() & F.col("__v").isNotNull()
        )
        ins_type = StructType(
            [
                StructField("left_id", LongType()),
                StructField("right_id", LongType()),
                StructField("min_insertions", LongType()),
                StructField("max_insertions", LongType()),
            ]
        )
        schema = StructType(
            [self.df.schema[c] for c in by]
            + [
                StructField("n_rows", LongType()),
                StructField("ops", LongType()),
                StructField("holds", BooleanType()),
                StructField("confidence", DoubleType()),
                StructField("n_deletions", LongType()),
                StructField("n_insertion_gaps", LongType()),
                StructField("deletions", ArrayType(LongType())),
                StructField("insertions", ArrayType(ins_type)),
            ]
        )
        cap = violation_cap

        def run(pdf):
            import pandas as pd

            pdf = pdf.sort_values(["__x", "__v"], kind="mergesort").reset_index(
                drop=True
            )
            values = pdf["__v"].tolist()
            n = len(values)
            ids = (
                [int(v) for v in pdf["__id"].tolist()]
                if id_col
                else list(range(n))
            )
            ops_, dels, ins = _optimal_ops(values, g1, g2)
            row = {c: pdf[c].iloc[0] for c in by}
            row.update(
                n_rows=n,
                ops=ops_,
                holds=ops_ == 0,
                confidence=(n - ops_) / n if n else 1.0,
                n_deletions=len(dels),
                n_insertion_gaps=len(ins),
                deletions=[ids[p] for p in dels[:cap]],
                insertions=[
                    {
                        "left_id": ids[a],
                        "right_id": ids[b],
                        "min_insertions": mi,
                        "max_insertions": mx,
                    }
                    for a, b, mi, mx in ins[:cap]
                ],
            )
            return pd.DataFrame([row])

        grouped = d.groupBy(*by) if by else d.groupBy(F.lit(1).alias("__g"))
        return grouped.applyInPandas(run, schema=schema)


def sd_check(
    df: DataFrame,
    order_col: str,
    value_col: str,
    g1: float = 0.0,
    g2: float = float("inf"),
    num_partitions: int = 64,
) -> SDCheck:
    """Validate a sequential dependency. See SDCheck."""
    return SDCheck(
        df=df,
        order_col=order_col,
        value_col=value_col,
        g1=g1,
        g2=g2,
        num_partitions=num_partitions,
    )
