"""Association-rule (AR) validation over transactional data.

Reference (ar/ar_verifier/ar_verifier.h + ar_stats_calculator.cpp:33-70):
  * support     = #transactions containing ALL of left u right / #transactions
  * confidence  = support / lhs_support, where lhs_support = #transactions
                  containing all LHS items / #transactions (0 if lhs_support == 0)
  * holds       <=> support >= minsup AND confidence >= minconf
  * violating clusters: transactions with the LHS at least partially present that
    are not (full left & full right), bucketed by coverage priority
    (ar_stats_calculator.cpp:8-21): {full|partial} left x {full|partial|no} right.

Transactional model (model/transaction/transactional_data.h): rows = (tid, item)
pairs or (tid, items array). Spark: per-transaction coverage flags from ONE
groupBy(tid) with conditional counts -- no collect_set materialization needed for
the verdict; coverage classes are algebraic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ARCheck:
    """Lazy AR check of rule left -> right over (tid, item) rows.

    ``df`` must have columns ``tid_col`` and ``item_col`` (one row per item
    occurrence; duplicates within a transaction are fine -- countDistinct is used).
    """

    df: DataFrame
    left: list[str]
    right: list[str]
    tid_col: str = "tid"
    item_col: str = "item"
    minsup: float = 0.0
    minconf: float = 0.0

    @cached_property
    def _coverage(self) -> DataFrame:
        """Per transaction: n_left / n_right distinct rule items present."""
        item = F.col(self.item_col)
        return self.df.groupBy(F.col(self.tid_col).alias("tid")).agg(
            F.count_distinct(
                F.when(item.isin(self.left), item)
            ).alias("n_left"),
            F.count_distinct(
                F.when(item.isin(self.right), item)
            ).alias("n_right"),
        )

    def clusters(self) -> DataFrame:
        """Violating-cluster counts by coverage priority class
        (ClusterPriority analog): [priority, n_transactions]."""
        nl, nr = F.col("n_left"), F.col("n_right")
        full_l, full_r = nl == len(self.left), nr == len(self.right)
        priority = (
            F.when(full_l & full_r, "full_left_full_right")
            .when(full_l & (nr > 0), "full_left_partial_right")
            .when(full_l, "full_left_no_right")
            .when((nl > 0) & full_r, "partial_left_full_right")
            .when((nl > 0) & (nr > 0), "partial_left_partial_right")
            .when(nl > 0, "partial_left_no_right")
        )
        return (
            self._coverage.withColumn("priority", priority)
            .filter(F.col("priority").isNotNull())
            .filter(F.col("priority") != "full_left_full_right")
            .groupBy("priority")
            .agg(F.count(F.lit(1)).alias("n_transactions"))
        )

    def summary(self) -> DataFrame:
        """Single row: holds / support / confidence / n_transactions /
        n_satisfying (full-full) / n_violating (left-presented, not full-full)."""
        nl, nr = F.col("n_left"), F.col("n_right")
        full_l, full_r = nl == len(self.left), nr == len(self.right)
        agg = self._coverage.agg(
            F.count(F.lit(1)).alias("n_transactions"),
            F.sum((full_l & full_r).cast("long")).alias("n_satisfying"),
            F.sum(full_l.cast("long")).alias("n_full_left"),
            F.sum(((nl > 0) & ~(full_l & full_r)).cast("long")).alias(
                "n_violating"
            ),
        )
        support = F.col("n_satisfying") / F.col("n_transactions")
        confidence = F.when(
            F.col("n_full_left") > 0, F.col("n_satisfying") / F.col("n_full_left")
        ).otherwise(F.lit(0.0))
        return agg.select(
            ((support >= self.minsup) & (confidence >= self.minconf)).alias("holds"),
            support.alias("support"),
            confidence.alias("confidence"),
            "n_transactions",
            "n_satisfying",
            "n_violating",
        )


def ar_check(
    df: DataFrame,
    left: list[str],
    right: list[str],
    tid_col: str = "tid",
    item_col: str = "item",
    minsup: float = 0.0,
    minconf: float = 0.0,
) -> ARCheck:
    """Verify one association rule. See ARCheck."""
    return ARCheck(
        df=df,
        left=list(left),
        right=list(right),
        tid_col=tid_col,
        item_col=item_col,
        minsup=minsup,
        minconf=minconf,
    )
