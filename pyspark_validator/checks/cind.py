"""Conditional inclusion-dependency (CIND) validation.

Reference (cind/cind_verifier/cind_verifier.cpp): a CIND restricts an IND to
the LHS rows matching a condition pattern; the verifier groups LHS rows into
*baskets* (one per distinct LHS inclusion key) and reports

  validity      = included_support / supporting_baskets
  completeness  = included_support / included_baskets_total

where a basket *supports* the CIND when >= 1 of its rows matches the condition,
is *included* when its key appears in the RHS, and ``included_support`` counts
baskets that are both. ``condition_type`` picks the contribution unit:
``group`` counts baskets (CondType::kGroup, the default), ``item`` counts rows
(kItem). Violating clusters are supporting-but-not-included baskets; violating
rows count their matching rows (row-level in both modes,
cind_verifier.cpp ExecuteInternal). validity is -1.0 when nothing supports the
condition and completeness 0.0 when nothing is included — the same sentinel
the reference's early "condition value absent from column" return produces.

Spark design: ONE groupBy over the LHS inclusion key computes per-basket row
and matching-row counts (the condition is a plain Column predicate, pushed to
the scan by Catalyst), then a single left join against the distinct RHS keys
(broadcast-able — distinct keys, not rows) marks inclusion, and one agg folds
the basket counters. No per-row Python, no driver-side cluster maps: at 10^12
rows the basket frame is bounded by distinct keys, and every counter is an
algebraic sum.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CINDCheck:
    """Lazy CIND check with the reference's basket semantics."""

    lhs_df: DataFrame
    lhs_cols: list[str]
    rhs_df: DataFrame
    rhs_cols: list[str]
    lhs_condition: Column | str | None = None
    rhs_condition: Column | str | None = None
    condition_type: str = "group"  # CondType::kGroup | kItem
    violation_cap: int = 1000

    def __post_init__(self):
        if self.condition_type not in ("group", "item"):
            raise ValueError("condition_type must be 'group' or 'item'")

    @staticmethod
    def _cond_col(cond: Column | str | None) -> Column:
        if cond is None:
            return F.lit(True)
        return F.expr(cond) if isinstance(cond, str) else cond

    @cached_property
    def _baskets(self) -> DataFrame:
        """One row per distinct LHS inclusion key:
        [__k0.., basket_rows_n, matching_rows_n, included]."""
        keys = [f"__k{i}" for i in range(len(self.lhs_cols))]
        per_key = (
            self.lhs_df.select(
                *[F.col(c).alias(k) for c, k in zip(self.lhs_cols, keys)],
                self._cond_col(self.lhs_condition).alias("__m"),
            )
            .groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("basket_rows_n"),
                F.sum(F.when(F.col("__m"), 1).otherwise(0)).alias("matching_rows_n"),
            )
        )
        rhs = self.rhs_df
        if self.rhs_condition is not None:
            rhs = rhs.filter(self._cond_col(self.rhs_condition))
        rhs_keys = rhs.select(
            *[F.col(c).alias(f"__r{i}") for i, c in enumerate(self.rhs_cols)]
        ).distinct().withColumn("__inc", F.lit(True))
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(k).eqNullSafe(F.col(f"__r{i}"))
                for i, k in enumerate(keys)
            ],
        )
        return (
            per_key.join(rhs_keys, on=cond, how="left")
            .select(
                *keys,
                "basket_rows_n",
                "matching_rows_n",
                F.coalesce(F.col("__inc"), F.lit(False)).alias("included"),
            )
        )

    def summary(self) -> DataFrame:
        """[holds, n_violating_clusters, n_violating_rows, error,
        n_distinct_lhs, n_rows_lhs, support, total_lhs_rows, validity,
        completeness, supporting_baskets, included_support,
        included_baskets_total].

        The first eight keep this module's original IND-over-conditioned-rows
        surface (holds / g3' error over conditioned distinct values); the last
        five are the reference getters (GetRealValidity/GetRealCompleteness/
        GetSupportingBaskets/GetIncludedSupportingBaskets/
        GetIncludedBasketsTotal)."""
        is_group = self.condition_type == "group"
        unit = F.lit(1) if is_group else F.col("matching_rows_n")
        inc_unit = F.lit(1) if is_group else F.col("basket_rows_n")
        supports = F.col("matching_rows_n") > 0
        agg = self._baskets.agg(
            F.sum(F.when(supports & ~F.col("included"), 1).otherwise(0)).alias(
                "n_violating_clusters"
            ),
            F.sum(
                F.when(supports & ~F.col("included"), F.col("matching_rows_n")).otherwise(0)
            ).alias("n_violating_rows"),
            F.sum(F.when(supports, unit).otherwise(0)).alias("supporting_baskets"),
            F.sum(F.when(supports & F.col("included"), unit).otherwise(0)).alias(
                "included_support"
            ),
            F.sum(F.when(F.col("included"), inc_unit).otherwise(0)).alias(
                "included_baskets_total"
            ),
            F.sum(F.when(supports, 1).otherwise(0)).alias("n_distinct_lhs"),
            F.sum("matching_rows_n").alias("support"),
            F.sum("basket_rows_n").alias("total_lhs_rows"),
        )
        return agg.select(
            (F.col("n_violating_clusters") == 0).alias("holds"),
            "n_violating_clusters",
            "n_violating_rows",
            F.when(F.col("n_distinct_lhs") > 0,
                   F.col("n_violating_clusters") / F.col("n_distinct_lhs"))
            .otherwise(F.lit(0.0))
            .alias("error"),
            "n_distinct_lhs",
            F.col("support").alias("n_rows_lhs"),
            "support",
            "total_lhs_rows",
            F.when(
                F.col("supporting_baskets") > 0,
                F.col("included_support") / F.col("supporting_baskets"),
            )
            .otherwise(F.lit(-1.0))
            .alias("validity"),
            F.when(
                F.col("included_baskets_total") > 0,
                F.col("included_support") / F.col("included_baskets_total"),
            )
            .otherwise(F.lit(0.0))
            .alias("completeness"),
            "supporting_baskets",
            "included_support",
            "included_baskets_total",
        )

    def violations(self) -> DataFrame:
        """Violating baskets (supporting, not included) as the LHS tuples with
        their matching-row occurrences; deterministic order, capped."""
        b = self._baskets.filter(
            (F.col("matching_rows_n") > 0) & ~F.col("included")
        )
        keys = [f"__k{i}" for i in range(len(self.lhs_cols))]
        out = b.select(
            *[F.col(k).alias(c) for k, c in zip(keys, self.lhs_cols)],
            F.col("matching_rows_n").alias("occurrences"),
            F.col("basket_rows_n").alias("basket_rows"),
        )
        return out.orderBy(
            F.desc("occurrences"), *[F.asc_nulls_first(c) for c in self.lhs_cols]
        ).limit(self.violation_cap)


def cind_check(
    lhs_df: DataFrame,
    lhs_cols: list[str],
    rhs_df: DataFrame | None = None,
    rhs_cols: list[str] | None = None,
    lhs_condition: Column | str | None = None,
    rhs_condition: Column | str | None = None,
    condition_type: str = "group",
    violation_cap: int = 1000,
) -> CINDCheck:
    """Validate a conditional IND. See CINDCheck."""
    if rhs_df is None:
        rhs_df = lhs_df
    if rhs_cols is None:
        raise ValueError("rhs_cols is required")
    return CINDCheck(
        lhs_df=lhs_df,
        lhs_cols=list(lhs_cols),
        rhs_df=rhs_df,
        rhs_cols=list(rhs_cols),
        lhs_condition=lhs_condition,
        rhs_condition=rhs_condition,
        condition_type=condition_type,
        violation_cap=violation_cap,
    )
