"""Differential-dependency (DD) validation.

Reference (dd/dd_verifier/dd_verifier.h + dd_verifier.cpp): a DD
``{X:[lo,hi], ...} -> {Y:[lo,hi], ...}`` holds iff for every tuple pair whose
LHS differences |s.x - t.x| all lie within their ranges, every RHS difference
also lies within its range. Outputs: error = violating pairs / LHS-satisfying
pairs, num_error_rhs (pairs breaking the RHS), highlight pairs.

Spark design -- a band join, not a cross join: the first LHS constraint
|s.x - t.x| <= hi admits only pairs within ``hi`` of each other, so we bucket
that column with width hi and equi-join on adjacent buckets (each left row
probes 3 buckets: k-1, k, k+1 -- the standard distributed band-join trick;
at 10^12 rows this turns O(n^2) into O(n * density)). Remaining constraints are
post-join filters (JVM whole-stage codegen). Pairs are deduped by requiring
(bucket ordering, rid ordering) so each unordered pair appears exactly once.

Column types follow the reference's metric table (dd.h:19-39 via the
verifier): numeric and date columns use the absolute difference (dates in
days), string columns the Levenshtein distance.  Blocking picks the best
LHS constraint: an exact [0, 0] range of ANY type hash-buckets on the value
itself (pure equi-join, no neighbor probes); otherwise the first numeric
range bands as above; a string range bands on string LENGTH with width hi
(levenshtein >= |len(a) - len(b)|, so the band is complete).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Range = tuple[float, float]


@dataclass
class DDCheck:
    """Lazy DD check: ``lhs`` / ``rhs`` map column -> (lo, hi) difference range."""

    df: DataFrame
    lhs: dict[str, Range]
    rhs: dict[str, Range]
    row_ref: str | None = None
    highlight_cap: int = 100
    #: max rows per band bucket admitted to the pair join: a degenerate value
    #: distribution (one dominant band value) would otherwise square. Oversized
    #: buckets are excluded and surfaced via n_oversized_buckets; a summary with
    #: oversized buckets cannot certify holds=True.
    bucket_cap: int = 100_000

    def __post_init__(self) -> None:
        if not self.lhs or not self.rhs:
            raise ValueError("DD check needs at least one LHS and one RHS range")
        for col, (lo, hi) in {**self.lhs, **self.rhs}.items():
            if lo < 0 or hi < lo:
                raise ValueError(f"bad range for {col}: [{lo}, {hi}] (need 0<=lo<=hi)")

    @cached_property
    def _kinds(self) -> dict[str, str]:
        """column -> 'num' (abs diff; dates as days) | 'str' (levenshtein)."""
        from pyspark.sql import types as T

        kinds = {}
        by_name = {f.name: f.dataType for f in self.df.schema.fields}
        for c in dict.fromkeys(list(self.lhs) + list(self.rhs)):
            t = by_name.get(c)
            kinds[c] = "str" if isinstance(t, T.StringType) else "num"
        return kinds

    @cached_property
    def _blocking(self) -> tuple[str, str]:
        """(column, mode): mode 'eq' = hash-equality bucket (a [0,0] LHS of
        any type), 'band' = numeric band, 'len' = string-length band."""
        for c, (lo, hi) in self.lhs.items():
            if lo == 0 and hi == 0:
                return c, "eq"
        for c, rng in self.lhs.items():
            if self._kinds[c] == "num":
                return c, "band"
        return next(iter(self.lhs)), "len"

    def _dist(self, c: str, a: Column, b: Column) -> Column:
        if self._kinds[c] == "str":
            return F.levenshtein(a, b).cast("double")
        return F.abs(a - b)

    @cached_property
    def _base(self) -> DataFrame:
        """Projected rows with their blocking bucket."""
        band_col, mode = self._blocking
        cols = list(dict.fromkeys(list(self.lhs) + list(self.rhs)))
        rid = (
            F.col(self.row_ref)
            if self.row_ref
            else F.monotonically_increasing_id()
        )

        def proj(c):
            from pyspark.sql import types as T

            t = self.df.schema[c].dataType
            if self._kinds[c] == "str":
                return F.col(c)
            if isinstance(t, T.DateType):
                return F.datediff(F.col(c), F.lit("1970-01-01").cast("date")).cast("double").alias(c)
            if isinstance(t, T.TimestampType):
                return (F.unix_timestamp(F.col(c)) / F.lit(86400.0)).alias(c)
            return F.col(c).cast("double").alias(c)

        if mode == "eq":
            bucket = F.xxhash64(F.col(band_col))
        elif mode == "band":
            width = float(self.lhs[band_col][1]) or 1.0
            bucket = F.floor(F.col(band_col) / F.lit(width))
        else:  # len: levenshtein band on string length
            width = float(self.lhs[band_col][1]) or 1.0
            bucket = F.floor(F.length(F.col(band_col)) / F.lit(width))
        base = self.df.select(rid.alias("__rid"), *[proj(c) for c in cols]).withColumn(
            "__bucket", bucket
        )
        if self.row_ref is None:
            # monotonically_increasing_id is only stable if the two join branches
            # see one materialization -- pin it.
            base = base.persist()
        return base

    @cached_property
    def _oversized(self) -> DataFrame:
        """Band buckets exceeding bucket_cap (excluded from the pair join)."""
        return (
            self._base.groupBy("__bucket")
            .agg(F.count(F.lit(1)).alias("__bs"))
            .filter(F.col("__bs") > self.bucket_cap)
        )

    @cached_property
    def _pairs(self) -> DataFrame:
        """All unordered tuple pairs satisfying the LHS ranges, with per-RHS
        difference columns. Band join on the first LHS constraint."""
        base = self._base.join(
            F.broadcast(self._oversized.select("__bucket")), on="__bucket", how="left_anti"
        )
        # left side probes its own bucket and, for banded modes, neighbors
        if self._blocking[1] == "eq":
            probe = base
        else:
            probe = base.withColumn(
                "__probe", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
            ).withColumn("__bucket", F.col("__bucket") + F.col("__probe"))
        a, b = probe.alias("a"), base.alias("b")
        cond: Column = (F.col("a.__bucket") == F.col("b.__bucket")) & (
            F.col("a.__rid") < F.col("b.__rid")
        )
        for c, (lo, hi) in self.lhs.items():
            d = self._dist(c, F.col(f"a.{c}"), F.col(f"b.{c}"))
            cond = cond & (d >= F.lit(float(lo))) & (d <= F.lit(float(hi)))
        out = a.join(b, cond, "inner").select(
            F.col("a.__rid").alias("rid_a"),
            F.col("b.__rid").alias("rid_b"),
            *[
                self._dist(c, F.col(f"a.{c}"), F.col(f"b.{c}")).alias(f"__d_{c}")
                for c in self.rhs
            ],
        )
        # each unordered pair may match in up to 3 probe offsets of a; keep one
        return out.dropDuplicates(["rid_a", "rid_b"])

    @cached_property
    def _judged(self) -> DataFrame:
        ok: Column = F.lit(True)
        n_bad: Column = F.lit(0)
        for c, (lo, hi) in self.rhs.items():
            d = F.col(f"__d_{c}")
            in_range = (d >= F.lit(float(lo))) & (d <= F.lit(float(hi)))
            ok = ok & in_range
            n_bad = n_bad + (~in_range).cast("int")
        return self._pairs.withColumn("__ok", ok).withColumn("__n_bad_rhs", n_bad)

    def summary(self) -> DataFrame:
        """Single row: holds / n_lhs_pairs / n_violating_pairs / num_error_rhs
        (total RHS-range breaks, dd_verifier.h:24) / error (dd_verifier.h:27)."""
        agg = self._judged.agg(
            F.count(F.lit(1)).alias("n_lhs_pairs"),
            F.coalesce(F.sum((~F.col("__ok")).cast("long")), F.lit(0)).alias(
                "n_violating_pairs"
            ),
            F.coalesce(F.sum("__n_bad_rhs"), F.lit(0)).alias("num_error_rhs"),
        )
        over = self._oversized.agg(F.count(F.lit(1)).alias("n_oversized_buckets"))
        return agg.crossJoin(over).select(
            (
                (F.coalesce(F.col("n_violating_pairs"), F.lit(0)) == 0)
                & (F.col("n_oversized_buckets") == 0)
            ).alias("holds"),
            "n_lhs_pairs",
            "n_violating_pairs",
            "num_error_rhs",
            F.when(
                F.col("n_lhs_pairs") > 0,
                F.col("n_violating_pairs") / F.col("n_lhs_pairs"),
            )
            .otherwise(F.lit(0.0))
            .alias("error"),
            "n_oversized_buckets",
        )

    def highlights(self) -> DataFrame:
        """Violating pairs (rid_a, rid_b, per-RHS diffs), capped."""
        return (
            self._judged.filter(~F.col("__ok"))
            .select(
                "rid_a",
                "rid_b",
                *[F.col(f"__d_{c}").alias(f"diff_{c}") for c in self.rhs],
            )
            .orderBy("rid_a", "rid_b")
            .limit(self.highlight_cap)
        )


def dd_check(
    df: DataFrame,
    lhs: dict[str, Range],
    rhs: dict[str, Range],
    row_ref: str | None = None,
    highlight_cap: int = 100,
    bucket_cap: int = 10_000_000,
) -> DDCheck:
    """Validate a differential dependency. See DDCheck; ``bucket_cap`` bounds
    the band-join bucket size for degenerate LHS distributions."""
    return DDCheck(
        df=df,
        lhs=dict(lhs),
        rhs=dict(rhs),
        row_ref=row_ref,
        highlight_cap=highlight_cap,
        bucket_cap=bucket_cap,
    )
