"""Conditional functional dependency (CFD) validation.

Reference (cfd/cfd_verifier/cfd_verifier.h:16-75 + cfd_stats_calculator.cpp):
a CFD is (X -> Y, pattern): LHS is a list of (attr, const-or-wildcard), RHS is one
(attr, const-or-wildcard).
  * support mask: rows matching every *constant* LHS item (wildcards always match)
    (cfd_stats_calculator.cpp:9-19);
  * supported rows group by the LHS attributes; per group, the most frequent RHS
    value is the implied standard (cfd_stats_calculator.cpp:38-56);
  * a row satisfies the rule iff RHS is a constant and row matches it, or RHS is a
    wildcard and the row carries its group's most frequent RHS value
    (cfd_stats_calculator.cpp:58-80);
  * support  = #supported rows, confidence = 1 - violations / support,
    holds <=> support >= minsup AND confidence >= minconf (cfd_verifier.h:57-60).

Spark design: a filter (constant patterns -> pushed to the scan) + the same
two-level groupBy chain as the FD check; "most frequent RHS" is max_by over the
(X, Y)-level counts. One shuffle, all-JVM, map-side combinable.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Wildcard marker in patterns (reference encodes wildcards as id <= 0).
WILDCARD = None


@dataclass
class CFDCheck:
    """Lazy CFD check.

    ``lhs``: list of (column, constant or None for wildcard).
    ``rhs``: (column, constant or None for wildcard).
    """

    df: DataFrame
    lhs: list[tuple[str, object]]
    rhs: tuple[str, object]
    minsup: int = 1
    minconf: float = 1.0
    highlight_cap: int = 100

    @property
    def _lhs_cols(self) -> list[str]:
        return [c for c, _ in self.lhs]

    @cached_property
    def _supported(self) -> DataFrame:
        cond: Column = F.lit(True)
        for c, v in self.lhs:
            if v is not None:
                cond = cond & (F.col(c) == F.lit(v))
        return self.df.filter(cond)

    @cached_property
    def _x_level(self) -> DataFrame:
        """Per LHS-value group: size, the most frequent RHS value, its count, and
        the constant-RHS match count."""
        rhs_col, rhs_const = self.rhs
        xy = self._supported.groupBy(
            *self._lhs_cols, F.col(rhs_col).alias("__y")
        ).agg(F.count(F.lit(1)).alias("ycnt"))
        return xy.groupBy(*self._lhs_cols).agg(
            F.sum("ycnt").alias("cluster_size"),
            F.max_by("__y", F.struct(F.col("ycnt"), F.col("__y"))).alias(
                "most_frequent_rhs"
            ),
            F.max("ycnt").alias("max_ycnt"),
            F.sum(
                F.when(F.col("__y") == F.lit(rhs_const), F.col("ycnt")).otherwise(0)
            ).alias("const_match"),
        )

    @cached_property
    def _per_cluster(self) -> DataFrame:
        rhs_const = self.rhs[1]
        satisfied = (
            F.col("max_ycnt") if rhs_const is None else F.col("const_match")
        )
        return self._x_level.withColumn(
            "violations", F.col("cluster_size") - satisfied
        )

    def summary(self) -> DataFrame:
        """Single row matching the reference getters: holds / support /
        confidence / num_rows_violating / num_clusters_violating."""
        agg = self._per_cluster.agg(
            F.coalesce(F.sum("cluster_size"), F.lit(0)).alias("support"),
            F.coalesce(F.sum("violations"), F.lit(0)).alias("n_violating_rows"),
            F.coalesce(
                F.sum((F.col("violations") > 0).cast("long")), F.lit(0)
            ).alias("n_violating_clusters"),
        )
        conf = F.when(
            F.col("support") > 0,
            F.lit(1.0) - F.col("n_violating_rows") / F.col("support"),
        ).otherwise(F.lit(0.0))
        return agg.select(
            ((F.col("support") >= self.minsup) & (conf >= self.minconf)).alias(
                "holds"
            ),
            "support",
            conf.alias("confidence"),
            "n_violating_rows",
            "n_violating_clusters",
        )

    def highlights(self) -> DataFrame:
        """Violating clusters desc by violation count, capped: [<lhs...>,
        cluster_size, most_frequent_rhs, violations]."""
        return (
            self._per_cluster.filter(F.col("violations") > 0)
            .select(
                *self._lhs_cols, "cluster_size", "most_frequent_rhs", "violations"
            )
            .orderBy(F.desc("violations"))
            .limit(self.highlight_cap)
        )


def cfd_check(
    df: DataFrame,
    lhs: list[tuple[str, object]],
    rhs: tuple[str, object],
    minsup: int = 1,
    minconf: float = 1.0,
    highlight_cap: int = 100,
) -> CFDCheck:
    """Validate a conditional FD. See CFDCheck."""
    return CFDCheck(
        df=df,
        lhs=list(lhs),
        rhs=rhs,
        minsup=minsup,
        minconf=minconf,
        highlight_cap=highlight_cap,
    )
