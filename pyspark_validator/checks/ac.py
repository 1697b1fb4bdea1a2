"""Algebraic-constraint (AC) validation.

Reference (algebraic_constraints/ac_algorithm.h:19-33, BHUNT, VLDB'03
S20P03): an AC over a numeric column pair (A, B) under a binary operation
op is a set of disjoint value ranges covering op(a_i, b_i) for row-paired
values; a row is an *exception* (ac_exception_finder.cpp:36-62) when its
result falls outside every range. Ranges are built by sorting the results
and splitting where the gap between neighbours exceeds
``delta = (max - min) * weight / (1 - weight)``
(ac_algorithm.cpp ConstructDisjunctiveRanges); if there are more than
``bumps_limit`` ranges, the closest pair is merged repeatedly
(RestrictRangesAmount). NULL/empty operands are skipped, as are division
rows with a zero divisor (ac_exception_finder.cpp:47-56). Columns pair
only with columns of the same numeric type (ExecuteInternal), and integer
columns use integer arithmetic (TestZeros golden: 2/20 == 0).

Spark design -- distributed gap clustering without a global sort choke:
  1. one scan computes (n_valid, min, max) -> delta on the driver;
  2. each result maps to one of P contiguous equal-width value buckets
     computed from the known (min, max) -- no repartitionByRange, so no
     boundary-sampling pass, and the bucket column doubles as the window
     partition key so the window's own hash shuffle is the ONLY shuffle.
     Duplicates are KEPT (their gap is 0, which never exceeds delta >= 0,
     so they cannot split a cluster; a pre-clustering ``distinct()`` would
     cost a full extra hash shuffle for nothing);
  3. per-bucket lag windows flag splits (gap > delta); the running-sum
     window's default RANGE frame makes value-ties share one cluster id;
  4. cross-bucket offsets come from a P-row per-bucket rollup stitched on
     the driver (buckets are contiguous in value space by construction)
     and broadcast-joined back -- the boundary-stitch pattern of
     checks/sd.py, minus the range partitioner;
  5. groupBy(cluster) -> [lo, hi, countDistinct -> n_values].
At 10^12 rows: one hash shuffle + map-local windows + P-row driver work.
Equal-width buckets trade the range-sampler's skew resistance for a whole
saved shuffle; raise ``num_partitions`` if one value region is hot.
Exceptions broadcast the (small,
bumps-limited) range list as a literal array and filter with
``F.exists`` -- a single scan, no join.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INT_TYPES = {"tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"}
_BINOPS = ("+", "-", "*", "/")


def _is_integral(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes)[col] in _INT_TYPES


def _res_expr(df: DataFrame, lhs: str, rhs: str, binop: str):
    """(result expr cast to double, validity filter) with reference parity:
    null operands skipped; division by zero skipped; integer columns use
    integer arithmetic (C++ Int div truncates -- Spark's ``div`` ditto)."""
    if binop not in _BINOPS:
        raise ValueError(f"binop must be one of {_BINOPS}, got {binop!r}")
    l, r = F.col(lhs), F.col(rhs)
    valid = l.isNotNull() & r.isNotNull()
    int_mode = _is_integral(df, lhs) and _is_integral(df, rhs)
    if binop == "/":
        valid = valid & (r != 0)
    if int_mode:
        ll, rl = l.cast("long"), r.cast("long")
        # try_* arithmetic: ANSI mode would otherwise FAIL the whole job on
        # one overflowing row pair; overflow yields null and the row is
        # skipped (the C++ reference silently wraps -- skipping is the
        # defensible distributed behavior and is documented here)
        res = {
            "+": F.try_add(ll, rl),
            "-": F.try_subtract(ll, rl),
            "*": F.try_multiply(ll, rl),
            "/": F.try_divide(ll, rl).cast("long"),  # trunc-toward-zero int div
        }[binop]
    else:
        ld, rd = l.cast("double"), r.cast("double")
        res = {"+": ld + rd, "-": ld - rd, "*": ld * rd, "/": F.try_divide(ld, rd)}[
            binop
        ]
    return res.cast("double"), valid


def _merge_to_limit(ranges: list[tuple[float, float]], bumps_limit: int):
    """RestrictRangesAmount parity: while > limit, merge the two ranges
    separated by the smallest gap (never merges when only one range)."""
    ranges = list(ranges)
    if bumps_limit <= 0 or len(ranges) <= 1:
        return ranges
    while len(ranges) > bumps_limit:
        gaps = [ranges[i + 1][0] - ranges[i][1] for i in range(len(ranges) - 1)]
        i = min(range(len(gaps)), key=gaps.__getitem__)
        ranges[i : i + 2] = [(ranges[i][0], ranges[i + 1][1])]
    return ranges


@dataclass
class ACCheck:
    """Lazy AC over one column pair: build ranges, then flag exceptions."""

    df: DataFrame
    lhs: str
    rhs: str
    binop: str = "+"
    weight: float = 0.1
    bumps_limit: int = 0
    num_partitions: int = 64
    sample_fraction: float | None = None
    seed: int = 0

    def __post_init__(self) -> None:
        if not (0.0 < self.weight <= 1.0):
            raise ValueError("weight must lie in (0, 1]")
        if self.sample_fraction is not None and not (0.0 < self.sample_fraction <= 1.0):
            raise ValueError("sample_fraction must lie in (0, 1]")

    @cached_property
    def _valid(self) -> DataFrame:
        """Single-column result projection, persisted: the stats agg and the
        clustering shuffle both read it -- without the persist each would
        rescan the source (1 column of the table; spills to disk at scale).

        ``sample_fraction`` is the BHUNT sampled mode (the reference's
        fuzziness/p_fuzz machinery sizes a random sample,
        ac_algorithm.cpp:96-133): ranges come from the sample, exceptions()
        always sees full data. The sample is a deterministic value hash
        (all duplicates of a value in or out together) so re-runs and
        resumed jobs agree -- an mt19937 row sample would not be
        reproducible across partitionings."""
        res, valid = _res_expr(self.df, self.lhs, self.rhs, self.binop)
        # result-null filter: overflow rows (try_* arithmetic) are skipped
        out = (
            self.df.filter(valid)
            .select(res.alias("__r"))
            .filter(F.col("__r").isNotNull())
        )
        if self.sample_fraction is not None and self.sample_fraction < 1.0:
            m = 1 << 20
            out = out.filter(
                F.pmod(F.xxhash64(F.col("__r"), F.lit(self.seed)), F.lit(m))
                < F.lit(int(self.sample_fraction * m))
            )
        return out.persist()

    @cached_property
    def _stats(self):
        """(n_valid_rows, min, max) -- one single-row agg."""
        row = self._valid.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__r").alias("mn"),
            F.max("__r").alias("mx"),
        ).collect()[0]
        return int(row["n"]), row["mn"], row["mx"]

    @cached_property
    def _clustered(self) -> DataFrame:
        """Distinct results tagged with a global cluster id (sorted-gap
        clustering at delta = (max-min) * w/(1-w))."""
        n, mn, mx = self._stats
        spark = self.df.sparkSession
        if n < 2:  # ConstructDisjunctiveRanges: <2 pairs -> no ranges
            return spark.createDataFrame([], "__r double, __cluster long")
        if self.weight == 1.0:
            return self._valid.select(
                "__r", F.lit(0).cast("long").alias("__cluster")
            )
        delta = (mx - mn) * (self.weight / (1.0 - self.weight))
        width = (mx - mn) / self.num_partitions
        if width > 0:
            bucket = F.least(
                F.lit(self.num_partitions - 1),
                F.floor((F.col("__r") - F.lit(mn)) / F.lit(width)),
            ).cast("int")
        else:  # all results equal -> one bucket, one cluster
            bucket = F.lit(0)
        vals = self._valid.withColumn("__b", bucket)
        w = Window.partitionBy("__b").orderBy("__r")
        flagged = vals.withColumn(
            "__split",
            F.when(F.col("__r") - F.lag("__r").over(w) > F.lit(delta), 1).otherwise(0),
        ).withColumn("__local", F.sum("__split").over(w))
        flagged = flagged.persist()
        edges = (
            flagged.groupBy("__b")
            .agg(
                F.min("__r").alias("first"),
                F.max("__r").alias("last"),
                F.sum("__split").alias("nsplits"),
            )
            .orderBy("__b")
            .collect()
        )  # <= P rows: one per non-empty value bucket
        offsets, run, prev_last = {}, 0, None
        for e in edges:
            if prev_last is not None and e["first"] - prev_last > delta:
                run += 1
            offsets[e["__b"]] = run
            run += int(e["nsplits"])
            prev_last = e["last"]
        off = F.broadcast(
            spark.createDataFrame(
                [(int(b), int(o)) for b, o in offsets.items()], "__b int, __off long"
            )
        )
        return flagged.join(off, "__b").select(
            "__r", (F.col("__off") + F.col("__local")).alias("__cluster")
        )

    def ranges(self) -> DataFrame:
        """One row per range, ordered by lo: [range_id, lo, hi, n_values].

        Stays distributed (groupBy over cluster ids); ``bumps_limit`` is not
        applied here -- use ranges_list() for the merged driver-side list
        (the merge needs the whole, provably small, range set at once)."""
        # the result set is small (<= #clusters); pmod keeps the ordering
        # window single-partitioned without the constant-folding warning.
        wp = Window.partitionBy(F.pmod(F.col("__cluster"), F.lit(1))).orderBy("lo")
        return (
            self._clustered.groupBy("__cluster")
            .agg(
                F.min("__r").alias("lo"),
                F.max("__r").alias("hi"),
                F.countDistinct("__r").alias("n_values"),
            )
            .withColumn("range_id", F.row_number().over(wp).cast("long"))
            .select("range_id", "lo", "hi", "n_values")
        )

    def ranges_list(self) -> list[tuple[float, float]]:
        """[(lo, hi), ...] sorted, with RestrictRangesAmount applied."""
        rows = self.ranges().orderBy("lo").collect()
        return _merge_to_limit([(r["lo"], r["hi"]) for r in rows], self.bumps_limit)

    def exceptions(
        self, id_cols: list[str], ranges: list[tuple[float, float]] | None = None
    ) -> DataFrame:
        """Rows whose result lies outside every range (borders inclusive,
        ValueBelongsToRanges parity): [*id_cols, lhs, rhs, res].

        ``ranges`` defaults to this check's own (then exceptions only exist
        if the ranges came from a sample); pass a discovered/agreed list to
        validate fresh data against a standing constraint."""
        if ranges is None:
            ranges = self.ranges_list()
        res, valid = _res_expr(self.df, self.lhs, self.rhs, self.binop)
        if ranges:
            bounds = F.array(
                *[
                    F.struct(
                        F.lit(float(lo)).alias("lo"), F.lit(float(hi)).alias("hi")
                    )
                    for lo, hi in ranges
                ]
            )
            inside = F.exists(
                bounds,
                lambda b: (F.col("__res") >= b["lo"]) & (F.col("__res") <= b["hi"]),
            )
        else:
            inside = F.lit(False)
        return (
            self.df.filter(valid)
            .withColumn("__res", res)
            .filter(~inside)
            .select(
                *id_cols,
                F.lit(self.lhs).alias("lhs"),
                F.lit(self.rhs).alias("rhs"),
                F.col("__res").alias("res"),
            )
        )


@dataclass
class ACSuite:
    """All-pairs AC in the reference's ExecuteInternal shape: every ordered
    pair of same-type numeric columns (i < j; both directions for the
    asymmetric, zero-skipping division -- ac_algorithm.cpp:219-236)."""

    df: DataFrame
    binop: str = "+"
    weight: float = 0.1
    bumps_limit: int = 0
    columns: list[str] | None = None
    num_partitions: int = 64
    _checks: dict[tuple[str, str], ACCheck] = field(default_factory=dict, init=False)

    def pairs(self) -> list[tuple[str, str]]:
        cols = self.columns or [
            c
            for c, t in self.df.dtypes
            if t in _INT_TYPES or t in ("float", "double") or t.startswith("decimal")
        ]
        kinds = {c: ("int" if _is_integral(self.df, c) else "float") for c in cols}
        out = []
        for i, a in enumerate(cols):
            for b in cols[i + 1 :]:
                if kinds[a] == kinds[b]:
                    out.append((a, b))
                    if self.binop == "/":
                        out.append((b, a))
        return out

    def check(self, lhs: str, rhs: str) -> ACCheck:
        key = (lhs, rhs)
        if key not in self._checks:
            self._checks[key] = ACCheck(
                self.df,
                lhs,
                rhs,
                self.binop,
                self.weight,
                self.bumps_limit,
                self.num_partitions,
            )
        return self._checks[key]

    def all_ranges(self, parallelism: int = 4) -> DataFrame:
        """Union of per-pair range frames: [lhs, rhs, range_id, lo, hi,
        n_values]. Each pair's clustering runs its own driver-side actions
        (stats + bucket-offset collects), so pairs are built from
        ``parallelism`` driver threads -- Spark interleaves the concurrent
        jobs and a wide table does not serialize on per-job latency."""
        from concurrent.futures import ThreadPoolExecutor

        pairs = self.pairs()
        checks = [self.check(*p) for p in pairs]  # fill the cache sequentially
        if parallelism > 1 and len(checks) > 1:
            with ThreadPoolExecutor(max_workers=parallelism) as ex:
                # force each pair's driver-side collects concurrently
                list(ex.map(lambda c: c._clustered, checks))
        frames = []
        for lhs, rhs in pairs:
            frames.append(
                self.check(lhs, rhs)
                .ranges()
                .select(
                    F.lit(lhs).alias("lhs"), F.lit(rhs).alias("rhs"), "*"
                )
            )
        if not frames:
            raise ValueError("no same-type numeric column pairs to check")
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out

    def exception_rows(
        self, id_cols: list[str], ranges_by_pair: dict[tuple[str, str], list] | None = None
    ) -> DataFrame:
        """ACException-shaped rollup: [*id_cols, column_pairs] where
        column_pairs is the sorted array of (lhs, rhs) structs violated by
        the row (ac_exception.h:12-23)."""
        frames = []
        for lhs, rhs in self.pairs():
            given = (ranges_by_pair or {}).get((lhs, rhs))
            frames.append(self.check(lhs, rhs).exceptions(id_cols, given))
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out.groupBy(*id_cols).agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("lhs"), F.col("rhs")))
            ).alias("column_pairs")
        )


def ac_check(
    df: DataFrame,
    lhs: str,
    rhs: str,
    binop: str = "+",
    weight: float = 0.1,
    bumps_limit: int = 0,
    num_partitions: int = 64,
    sample_fraction: float | None = None,
    seed: int = 0,
) -> ACCheck:
    """Validate an algebraic constraint over one column pair. See ACCheck."""
    return ACCheck(
        df, lhs, rhs, binop, weight, bumps_limit, num_partitions, sample_fraction, seed
    )


def _bhunt_sample_size(
    k_bumps: int, fuzziness: float, p_fuzz: float, n_rows: int
) -> int:
    """ACAlgorithm::CalculateSampleSize (ac_algorithm.cpp:96-127): the
    BHUNT formula (7) sizing via Abramowitz & Stegun 26.2.23 / 26.4.17,
    truncated to size_t and capped at the table size."""
    import math

    if fuzziness == 0:
        return n_rows
    c0, c1, c2 = 2.515517, 0.802853, 0.010328
    d1, d2, d3 = 1.432788, 0.189269, 0.001308
    t = math.sqrt(math.log(1.0 / (1.0 - p_fuzz) ** 2.0))
    xp = t - (c0 + c1 * t + c2 * t * t) / (1 + d1 * t + d2 * t * t + d3 * t**3)
    fd = 2.0 * (k_bumps + 1)
    tmp1 = 2.0 / (9.0 * fd)
    xp2 = fd * (1.0 - tmp1 + xp * math.sqrt(tmp1)) ** 3.0
    size = int((xp2 * (2.0 - fuzziness)) / (4.0 * fuzziness) + k_bumps / 2.0)
    return min(size, n_rows)


def ac_reference_ranges(
    df: DataFrame,
    lhs: str,
    rhs: str,
    binop: str = "+",
    weight: float = 0.1,
    bumps_limit: int = 0,
    fuzziness: float = 0.2,
    p_fuzz: float = 0.85,
    iterations_limit: int = 10,
    ac_seed: int = 0,
    order_col: str = "id",
    num_partitions: int = 64,
) -> list[tuple[float, float]]:
    """Reference-exact seeded BHUNT sampling (ACAlgorithm::Sampling,
    ac_algorithm.cpp:129-196): each iteration reseeds std::mt19937(ac_seed)
    and Bernoulli-samples every row at p = sample_size/n (two 32-bit draws
    per row, libstdc++ generate_canonical<double,53>), grows k_bumps from
    the discovered range count, and stops when the sample stops growing;
    RestrictRangesAmount applies bumps_limit once at the end.  Snapshot
    goldens tests/test_ac_example_snapshot_golden.py.

    ``order_col`` must hold the 0-based file row order the reference's
    draw sequence walks.  The default ACCheck sampling (value-hash,
    engine-reproducible across partitionings) remains the scale path;
    this mode exists for bit-parity with reference runs and replays the
    driver-side loop with one bounded subset aggregation per iteration."""
    from pyspark_validator.nar_discovery import RefRNG

    n_rows = df.count()
    spark = df.sparkSession

    def iteration(probability: float) -> list[tuple[float, float]]:
        rng = RefRNG(ac_seed)
        accepted = [i for i in range(n_rows) if rng.next() < probability]
        if not accepted:
            return []
        ids = F.broadcast(
            spark.createDataFrame([(i,) for i in accepted], f"{order_col} long")
        )
        sub = df.join(ids, order_col, "left_semi")
        chk = ACCheck(
            sub, lhs, rhs, binop, weight, 0, num_partitions, None, 0
        )
        try:
            return chk.ranges_list()
        finally:
            chk._valid.unpersist()

    k_bumps, new_k, i = 1, 1, 0
    ranges: list[tuple[float, float]] = []
    sample_size = _bhunt_sample_size(k_bumps, fuzziness, p_fuzz, n_rows)
    while i < iterations_limit and (
        not ranges
        or sample_size < _bhunt_sample_size(new_k, fuzziness, p_fuzz, n_rows)
    ):
        k_bumps = new_k
        sample_size = _bhunt_sample_size(k_bumps, fuzziness, p_fuzz, n_rows)
        ranges = iteration(sample_size / n_rows)
        new_k = len(ranges) if ranges else k_bumps + 1
        i += 1
    return _merge_to_limit(ranges, bumps_limit)
