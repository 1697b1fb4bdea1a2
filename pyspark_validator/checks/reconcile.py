"""Cross-table aggregate reconciliation (rollup-consistency audit).

The classic warehouse integrity check the dependency families don't cover:
a parent table carries a STORED aggregate (orders.o_totalprice, an account
balance, a denormalized count) that must equal an aggregate RE-DERIVED from
the child table (sum over lineitems, ledger entries, members). Drift between
the two is the canonical symptom of a broken ingest or a lost delta.

Spark design: ONE child-side groupBy(key) (map-side combinable -- the same
partial-agg shape as every census in this engine), then an outer join with
the parent keyed by the same columns. At 10^12 child rows the shuffle carries
one row per parent key post-combine. Joint verdict classes:

  * matched       -- |stored - derived| within tolerance
  * mismatched    -- both present, outside tolerance
  * orphan_child  -- child rows whose key has no parent (referential echo)
  * missing_child -- parent rows with no child rows (stored aggregate of
                     nothing; only a violation when expect_children=True)

Tolerance: absolute (abs_tol) OR relative (rel_tol) -- a row matches when
EITHER bound accepts it, the reconciliation convention (floating-point sums
need rel_tol at scale; small amounts need abs_tol near zero).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class ReconciliationCheck:
    """Lazy parent-vs-child aggregate reconciliation."""

    parent: DataFrame
    child: DataFrame
    parent_keys: list[str]
    child_keys: list[str]
    stored: Column  # expression over the parent row
    derived_agg: Column  # aggregate expression over child rows (e.g. F.sum(...))
    abs_tol: float = 0.0
    rel_tol: float = 0.0
    expect_children: bool = True

    def __post_init__(self) -> None:
        if len(self.parent_keys) != len(self.child_keys):
            raise ValueError("parent_keys and child_keys must align")
        if not self.parent_keys:
            raise ValueError("reconciliation requires at least one key column")

    @cached_property
    def compared(self) -> DataFrame:
        """Per-key comparison frame: [key..., stored, derived, status]."""
        derived = (
            self.child.groupBy(
                *[F.col(c).alias(f"__k_{i}") for i, c in enumerate(self.child_keys)]
            )
            .agg(self.derived_agg.alias("derived"))
        )
        parent = self.parent.select(
            *[F.col(c).alias(f"__k_{i}") for i, c in enumerate(self.parent_keys)],
            self.stored.cast("double").alias("stored"),
        )
        knames = [f"__k_{i}" for i in range(len(self.parent_keys))]
        j = parent.join(derived, on=knames, how="full_outer")
        diff = F.abs(F.col("stored") - F.col("derived"))
        ok = (diff <= F.lit(self.abs_tol)) | (
            diff <= F.lit(self.rel_tol) * F.abs(F.col("stored"))
        )
        status = (
            F.when(F.col("stored").isNull(), F.lit("orphan_child"))
            .when(F.col("derived").isNull(), F.lit("missing_child"))
            .when(ok, F.lit("matched"))
            .otherwise(F.lit("mismatched"))
        )
        out = j.select(
            *[
                F.col(k).alias(c)
                for k, c in zip(knames, self.parent_keys)
            ],
            "stored",
            F.col("derived").cast("double").alias("derived"),
            status.alias("status"),
        )
        return out

    def summary(self) -> DataFrame:
        """Single row: [n_parent_keys, n_child_keys, n_matched, n_mismatched,
        n_orphan_child, n_missing_child, max_abs_diff, holds]."""
        c = self.compared
        is_ = lambda s: (F.col("status") == s).cast("long")  # noqa: E731
        out = c.agg(
            F.sum((F.col("status") != "orphan_child").cast("long")).alias(
                "n_parent_keys"
            ),
            F.sum((F.col("status") != "missing_child").cast("long")).alias(
                "n_child_keys"
            ),
            F.sum(is_("matched")).alias("n_matched"),
            F.sum(is_("mismatched")).alias("n_mismatched"),
            F.sum(is_("orphan_child")).alias("n_orphan_child"),
            F.sum(is_("missing_child")).alias("n_missing_child"),
            F.max(
                F.when(
                    F.col("status").isin("matched", "mismatched"),
                    F.abs(F.col("stored") - F.col("derived")),
                )
            ).alias("max_abs_diff"),
        )
        holds = (F.col("n_mismatched") == 0) & (F.col("n_orphan_child") == 0)
        if self.expect_children:
            holds = holds & (F.col("n_missing_child") == 0)
        return out.withColumn("holds", holds)

    def violations(self, cap: int = 1000) -> DataFrame:
        """Non-matched keys, worst absolute difference first, capped."""
        return (
            self.compared.filter(F.col("status") != "matched")
            .withColumn(
                "abs_diff", F.abs(F.col("stored") - F.col("derived"))
            )
            .orderBy(
                F.col("abs_diff").desc_nulls_last(),
                *[F.col(k) for k in self.parent_keys],
            )
            .limit(cap)
        )


def reconciliation_check(
    parent: DataFrame,
    child: DataFrame,
    parent_keys: list[str],
    child_keys: list[str],
    stored: Column,
    derived_agg: Column,
    abs_tol: float = 0.0,
    rel_tol: float = 0.0,
    expect_children: bool = True,
) -> ReconciliationCheck:
    """Validate a stored parent aggregate against its child-table derivation.
    See ReconciliationCheck."""
    return ReconciliationCheck(
        parent=parent,
        child=child,
        parent_keys=list(parent_keys),
        child_keys=list(child_keys),
        stored=stored,
        derived_agg=derived_agg,
        abs_tol=abs_tol,
        rel_tol=rel_tol,
        expect_children=expect_children,
    )
