"""Benford first-digit conformance check.

Benford's law (Newcomb 1881 / Benford 1938): in many naturally-occurring
numeric populations the first significant digit d occurs with probability
log10(1 + 1/d). Deviation is a classic data-quality / fabrication signal
(Nigrini 2012); for a validation engine it is a distribution-shape check in
the same family as checks/drift.py, with a FIXED analytic baseline instead of
an observed one.

Spark design: one scan computing the first-digit census -- the digit of a
non-zero value v is floor(|v| / 10^floor(log10 |v|)), pure JVM exprs -- then
a groupBy over at most 9 (first digit) or 90 (first two digits) buckets.
The census is a pure-sum partial: it is mergeable across partitions, deltas
fold in, deletes retract, which is why the same census is also exposed as a
fused member (fused.py add_benford). Verdict statistics follow the published
practice:

  * chi2 = n * sum((p_obs - p_exp)^2 / p_exp), gated at chi2_ppf(1-alpha, dof)
    with dof = #digits - 1 (checks/sfd.py supplies the exact ppf);
  * MAD = mean |p_obs - p_exp| with Nigrini's first-digit conformity bands
    (<=0.006 close, <=0.012 acceptable, <=0.015 marginal, else nonconformity;
    two-digit bands are the published /3-ish variants).

At 10^12 rows: the shuffle carries <= 9 (or 90) rows per map task -- the scan
is the entire cost; skew-immune by construction.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from math import log10

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_validator.checks.sfd import chi2_ppf

#: Nigrini MAD conformity thresholds (first digit / first-two digits).
_MAD_BANDS = {
    1: (0.006, 0.012, 0.015),
    2: (0.0012, 0.0018, 0.0022),
}


def first_digit_expr(col: Column, digits: int = 1) -> Column:
    """First ``digits`` significant digits of |col| as an int (NULL for
    NULL/zero/non-finite input). digits=1 -> 1..9, digits=2 -> 10..99.

    floor(log10) + division only -- deterministic IEEE math, reproducible
    bit-for-bit across engines (the DuckDB oracle uses the same formula).
    """
    v = F.abs(col.cast("double"))
    ok = v.isNotNull() & (v > 0) & ~F.isnan(v) & (v != F.lit(float("inf")))
    mag = F.floor(F.log10(v))  # exponent of the leading digit
    lead = F.floor(v / F.pow(F.lit(10.0), (mag - (digits - 1)).cast("double")))
    return F.when(ok, lead.cast("int")).otherwise(F.lit(None).cast("int"))


def benford_expected(digits: int = 1) -> dict[int, float]:
    """Analytic Benford probabilities for the leading-``digits`` census."""
    lo, hi = (1, 10) if digits == 1 else (10, 100)
    return {d: log10(1.0 + 1.0 / d) for d in range(lo, hi)}


@dataclass
class BenfordCheck:
    """Lazy Benford conformance check over a numeric column."""

    df: DataFrame
    column: str
    digits: int = 1
    alpha: float = 0.05
    mad_gate: str = "acceptable"  # close | acceptable | marginal

    def __post_init__(self) -> None:
        if self.digits not in (1, 2):
            raise ValueError("digits must be 1 or 2")
        if self.mad_gate not in ("close", "acceptable", "marginal"):
            raise ValueError("mad_gate must be close|acceptable|marginal")

    @cached_property
    def census(self) -> DataFrame:
        """[digit, cnt] for usable (non-null, non-zero, finite) values --
        the mergeable partial state. Persisted: both the total and the
        expected-table join read it, and without the persist each branch
        would RE-SCAN the full table (2 scans of 100 TB for a <= 90-row
        census; pinned single-scan in test_plan_audit.py)."""
        d = first_digit_expr(F.col(self.column), self.digits)
        return (
            self.df.select(d.alias("digit"))
            .filter(F.col("digit").isNotNull())
            .groupBy("digit")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .persist()
        )

    def table(self) -> DataFrame:
        """Per-digit comparison: [digit, cnt, p_obs, p_exp, dev].

        Digits absent from the data appear with cnt=0 (the chi2 needs them);
        the expected table is a literal inline frame (<= 90 rows, broadcast).
        """
        spark = self.df.sparkSession
        exp = spark.createDataFrame(
            [(d, p) for d, p in benford_expected(self.digits).items()],
            "digit int, p_exp double",
        )
        tot = self.census.agg(F.sum("cnt").alias("n"))
        return (
            exp.join(F.broadcast(self.census), "digit", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "digit",
                F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
                (F.coalesce(F.col("cnt"), F.lit(0)) / F.col("n")).alias("p_obs"),
                "p_exp",
                (
                    F.coalesce(F.col("cnt"), F.lit(0)) / F.col("n") - F.col("p_exp")
                ).alias("dev"),
            )
            .orderBy("digit")
        )

    def summary(self) -> DataFrame:
        """Single row: [n, chi2, chi2_critical, mad, mad_conformity,
        chi2_conforms, holds]. ``holds`` gates on the MAD band (Nigrini's
        recommendation for large n, where chi2 over-rejects) -- the chi2
        verdict is reported alongside."""
        n_digits = 9 if self.digits == 1 else 90
        crit = chi2_ppf(1.0 - self.alpha, n_digits - 1)
        close, acceptable, marginal = _MAD_BANDS[self.digits]
        gate = {"close": close, "acceptable": acceptable, "marginal": marginal}[
            self.mad_gate
        ]
        t = self.table()
        return (
            t.agg(
                F.sum("cnt").alias("n"),
                F.sum(
                    F.col("dev") * F.col("dev") / F.col("p_exp")
                ).alias("__chi2_per_n"),
                F.avg(F.abs(F.col("dev"))).alias("mad"),
            )
            .select(
                F.col("n").cast("bigint").alias("n"),
                (F.col("__chi2_per_n") * F.col("n")).alias("chi2"),
                F.lit(crit).alias("chi2_critical"),
                "mad",
                F.when(F.col("mad") <= close, F.lit("close"))
                .when(F.col("mad") <= acceptable, F.lit("acceptable"))
                .when(F.col("mad") <= marginal, F.lit("marginal"))
                .otherwise(F.lit("nonconformity"))
                .alias("mad_conformity"),
                ((F.col("__chi2_per_n") * F.col("n")) <= F.lit(crit)).alias(
                    "chi2_conforms"
                ),
                (F.col("mad") <= F.lit(gate)).alias("holds"),
            )
        )


    def unpersist(self) -> None:
        """Release the cached census (mirrors FusedPass.unpersist /
        CanonicalDocs.unpersist); safe to call before census materializes."""
        if "census" in self.__dict__:
            self.census.unpersist()

    def __enter__(self) -> "BenfordCheck":
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()


def benford_check(
    df: DataFrame,
    column: str,
    digits: int = 1,
    alpha: float = 0.05,
    mad_gate: str = "acceptable",
) -> BenfordCheck:
    """Validate Benford first-digit conformance of a numeric column."""
    return BenfordCheck(
        df=df, column=column, digits=digits, alpha=alpha, mad_gate=mad_gate
    )
