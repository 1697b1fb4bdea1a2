"""Numerical-association-rule (NAR) validation.

Reference (nar/nar.h:23-75, nar/value_range.h): a NAR is an antecedent and
a consequent, each a map feature -> ValueRange, where a numeric range
includes v iff lower <= v <= upper (value_range.h:50-53) and a string
range is a category set (value_range.cpp:17-20). Qualities
(nar.cpp SetQualities / CalcQualities):
  support    = |ante AND cons| / n_rows
  confidence = |ante AND cons| / |ante|
  fitness    = (confidence + support + inclusion) / 3,
  inclusion  = (|ante| + |cons| features) / n_features,
with the zero guards: empty ante or cons -> all zeros; no row fits the
ante -> all zeros; support 0 -> all zeros.

The reference mines NARs with differential evolution (nar/des/) -- a
discovery search outside the validation tier; verifying a *given* rule is
the validation-shaped half and is one Spark scan: both fit-predicates are
plain boolean column expressions, so qualities come from a single
conditional-sum aggregation (map-side combinable, no shuffle beyond the
1-row agg) and violations() is a filter. NULL values fit no range
(the reference's typed columns carry no NULL at this call site).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fits(df: DataFrame, conditions: dict[str, object]) -> Column:
    """AND over feature conditions; {} -> true. A condition is a (lo, hi)
    numeric range (inclusive), a list/set of allowed category values, or --
    for JSON suite specs, where tuples and lists are indistinguishable --
    the explicit dict forms {"between": [lo, hi]} / {"in": [...]}."""
    out = F.lit(True)
    for col, cond in conditions.items():
        c = F.col(col)
        if isinstance(cond, dict):
            if set(cond) == {"between"}:
                cond = tuple(cond["between"])
            elif set(cond) == {"in"}:
                cond = list(cond["in"])
            else:
                raise ValueError(
                    f"dict condition for {col!r} must be "
                    '{"between": [lo, hi]} or {"in": [...]}'
                )
        if isinstance(cond, tuple) and len(cond) == 2:
            lo, hi = cond
            term = (c >= F.lit(lo)) & (c <= F.lit(hi))
        elif isinstance(cond, (list, set, frozenset)):
            term = c.isin(*sorted(cond))
        else:
            raise ValueError(f"condition for {col!r} must be (lo, hi) or a category list")
        out = out & term.isNotNull() & term  # NULL fits nothing
    return out


@dataclass
class NARCheck:
    """Lazy NAR verification: qualities rollup + violating rows."""

    df: DataFrame
    ante: dict[str, object]
    cons: dict[str, object]
    feature_count: int | None = None

    def qualities(self) -> DataFrame:
        """Single row [n_rows, n_fit_ante, n_fit_both, support, confidence,
        fitness] (CalcQualities parity, nar.cpp:10-24)."""
        n_features = self.feature_count or len(self.df.columns)
        inclusion = (len(self.ante) + len(self.cons)) / n_features
        if not self.ante or not self.cons:
            # SetQualities: degenerate rule -> all-zero qualities
            return self.df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.lit(0).cast("long").alias("n_fit_ante"),
                F.lit(0).cast("long").alias("n_fit_both"),
                F.lit(0.0).alias("support"),
                F.lit(0.0).alias("confidence"),
                F.lit(0.0).alias("fitness"),
            )
        fits_ante = _fits(self.df, self.ante)
        fits_both = fits_ante & _fits(self.df, self.cons)
        agg = self.df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(fits_ante.cast("long")).alias("n_fit_ante"),
            F.sum(fits_both.cast("long")).alias("n_fit_both"),
        )
        support = F.col("n_fit_both") / F.col("n_rows")
        zero = (F.col("n_fit_ante") == 0) | (F.col("n_fit_both") == 0)
        confidence = F.col("n_fit_both") / F.col("n_fit_ante")
        fitness = (confidence + support + F.lit(inclusion)) / F.lit(3.0)
        return agg.select(
            "n_rows",
            "n_fit_ante",
            "n_fit_both",
            F.when(zero, 0.0).otherwise(support).alias("support"),
            F.when(zero, 0.0).otherwise(confidence).alias("confidence"),
            F.when(zero, 0.0).otherwise(fitness).alias("fitness"),
        )

    def violations(self) -> DataFrame:
        """Rows that fit the antecedent but break the consequent -- the
        actionable residue of a failed rule."""
        return self.df.filter(_fits(self.df, self.ante) & ~_fits(self.df, self.cons))


def nar_check(
    df: DataFrame,
    ante: dict[str, object],
    cons: dict[str, object],
    feature_count: int | None = None,
) -> NARCheck:
    """Verify a numerical association rule. See NARCheck."""
    return NARCheck(df, ante, cons, feature_count)
