"""Conditional inclusion-dependency (CIND) validation.

Reference (cind/cind_verifier/): a CIND restricts an IND to the rows matching a
condition pattern on the LHS table (and optionally the RHS): "for rows WHERE
<cond>, X subseteq Y". The verifier reports the same violation surface as the
plain IND (missing distinct LHS tuples, per-occurrence rows, g3' error) plus the
condition's support (how many LHS rows the condition selects).

Spark design: the condition is a plain Column predicate -- Catalyst pushes it to
the scan (PushedFilters) -- then the filtered frames feed the exact same
distinct + LEFT ANTI plan as `ind_check` (checks/ind.py). Zero new shuffle
machinery; this module is deliberately a thin composition, mirroring how the
reference's CINDVerifier reuses the IND core.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_validator.checks.ind import INDCheck, ind_check


@dataclass
class CINDCheck:
    """Lazy CIND check: IND on condition-filtered sides."""

    lhs_df: DataFrame
    lhs_cols: list[str]
    rhs_df: DataFrame
    rhs_cols: list[str]
    lhs_condition: Column | str | None = None
    rhs_condition: Column | str | None = None
    violation_cap: int = 1000

    @staticmethod
    def _filt(df: DataFrame, cond: Column | str | None) -> DataFrame:
        if cond is None:
            return df
        return df.filter(F.expr(cond) if isinstance(cond, str) else cond)

    @cached_property
    def _ind(self) -> INDCheck:
        return ind_check(
            self._filt(self.lhs_df, self.lhs_condition),
            self.lhs_cols,
            self._filt(self.rhs_df, self.rhs_condition),
            self.rhs_cols,
            violation_cap=self.violation_cap,
        )

    def summary(self) -> DataFrame:
        """IND summary over the conditioned rows + condition support:
        [holds, n_violating_clusters, n_violating_rows, error, n_distinct_lhs,
        n_rows_lhs, support, total_lhs_rows]."""
        total = self.lhs_df.agg(F.count(F.lit(1)).alias("total_lhs_rows"))
        s = self._ind.summary()
        return s.crossJoin(total).select(
            "holds",
            "n_violating_clusters",
            "n_violating_rows",
            "error",
            "n_distinct_lhs",
            "n_rows_lhs",
            F.col("n_rows_lhs").alias("support"),
            "total_lhs_rows",
        )

    def violations(self) -> DataFrame:
        return self._ind.violations()


def cind_check(
    lhs_df: DataFrame,
    lhs_cols: list[str],
    rhs_df: DataFrame | None = None,
    rhs_cols: list[str] | None = None,
    lhs_condition: Column | str | None = None,
    rhs_condition: Column | str | None = None,
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
        violation_cap=violation_cap,
    )
