"""Order-dependency (set-based AOD) validation.

Reference (od/set_based_verifier/verifier.h:17-50, verifier.cpp:70-120): an AOD is
verified as one or both of
  * OC  (order compatibility) context : left ~ right -- within every context-
    partition, the rows can be ordered so left is non-decreasing (or non-increasing,
    per ``ordering``) AND right is simultaneously non-decreasing;
  * OFD (order functional dependency) context : [] -> right -- right is constant
    within every context-partition.
The verifier computes a minimal *removal set* (rows to delete so the OD holds);
error = |removal set| / n (verifier.cpp:117).

Spark design:
  * OFD: removals per context group = cluster_size - max value frequency -- two
    chained aggregations, identical single-shuffle shape to the FD check. Pure JVM.
  * OC: the minimal removal count per group = group_size - longest non-decreasing
    subsequence (LNDS) of right-values taken in (left asc, right asc) order (ties on
    left let us pick the right-friendly arrangement, hence the secondary sort). LNDS
    is inherently sequential per group -> applyInPandas per context group (Arrow-
    batched, O(c log c) bisect per group), the canonical "PLI-cluster refinement in
    Python" pattern from SURVEY.md section 2.8. Groups are hash-partitioned; a
    ``group_cap`` bounds worst-case skew.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ofd_removals(df: DataFrame, context: list[str], right: str) -> DataFrame:
    """Per-context-group removal count for OFD: size - most frequent right count."""
    vc = df.groupBy(*context, right).agg(F.count(F.lit(1)).alias("__vcnt"))
    return vc.groupBy(*context).agg(
        F.sum("__vcnt").alias("group_size"),
        (F.sum("__vcnt") - F.max("__vcnt")).alias("removals"),
    )


def _oc_removals(
    df: DataFrame,
    context: list[str],
    left: str,
    right: str,
    descending: bool,
    group_cap: int = 5_000_000,
) -> DataFrame:
    """Per-context-group removal count for OC via LNDS (applyInPandas).

    ``group_cap`` guards the per-group pandas materialization: a context group
    larger than the cap would funnel its rows into ONE Arrow batch sequence on
    one executor (LNDS is inherently sequential per group). Oversized groups
    are excluded here and surfaced via the `oversized` marker column (-1
    removals) so callers re-run them with a bespoke strategy instead of
    silently OOMing."""
    sign = -1.0 if descending else 1.0
    proj = df.select(
        *context,
        (F.col(left).cast("double") * F.lit(sign)).alias("__l"),
        F.col(right).cast("double").alias("__r"),
    )
    sizes = proj.groupBy(*context).agg(F.count(F.lit(1)).alias("__gsz"))
    oversized = sizes.filter(F.col("__gsz") > group_cap)
    proj = proj.join(oversized.select(*context), on=context, how="left_anti")

    def lnds(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(["__l", "__r"], kind="mergesort")
        tails: list[float] = []  # patience sorting: longest non-decreasing subsequence
        for v in s["__r"].to_numpy():
            i = bisect.bisect_right(tails, v)
            if i == len(tails):
                tails.append(v)
            else:
                tails[i] = v
        n = len(s)
        out = {c: [pdf[c].iloc[0]] for c in context}
        out["group_size"] = [n]
        out["removals"] = [n - len(tails)]
        return pd.DataFrame(out)

    schema = ", ".join(
        [f"`{c}` {dict(proj.dtypes)[c]}" for c in context]
        + ["group_size long", "removals long"]
    )
    computed = proj.groupBy(*context).applyInPandas(lnds, schema=schema)
    skipped = oversized.select(
        *context,
        F.col("__gsz").alias("group_size"),
        F.lit(-1).cast("long").alias("removals"),  # oversized marker
    )
    return computed.unionByName(skipped)


def _ofd_removal_rows(
    df: DataFrame, context: list[str], right: str, row_ref: str
) -> DataFrame:
    """Row refs removed for OFD: every row whose right value is not the group's
    most frequent one (ties broken toward the smallest value, deterministic --
    the removal COUNT is tie-invariant, the row SET needs a canonical pick).
    Pure JVM: value counts -> per-group argmax -> null-safe mismatch join."""
    vc = df.groupBy(*context, right).agg(F.count(F.lit(1)).alias("__vcnt"))
    maxc = vc.groupBy(*context).agg(F.max("__vcnt").alias("__maxc"))
    winners = vc.join(maxc, on=context, how="inner").filter(
        F.col("__vcnt") == F.col("__maxc")
    )
    canonical = winners.groupBy(*context).agg(F.min(right).alias("__mode"))
    return (
        df.join(canonical, on=context, how="inner")
        .filter(~F.col(right).eqNullSafe(F.col("__mode")))
        .select(*context, F.col(row_ref).alias("row_ref"))
    )


def _oc_removal_rows(
    df: DataFrame,
    context: list[str],
    left: str,
    right: str,
    descending: bool,
    row_ref: str,
    group_cap: int = 5_000_000,
) -> DataFrame:
    """Row refs removed for OC: rows outside one maximal non-decreasing
    subsequence of right in (left asc, right asc) order, reconstructed by
    patience sorting with predecessor links (same subsequence the counting
    kernel measures). Oversized groups (> group_cap) are excluded here and
    surfaced by removals()/summary() as n_oversized."""
    sign = -1.0 if descending else 1.0
    proj = df.select(
        *context,
        (F.col(left).cast("double") * F.lit(sign)).alias("__l"),
        F.col(right).cast("double").alias("__r"),
        F.col(row_ref).alias("row_ref"),
    )
    sizes = proj.groupBy(*context).agg(F.count(F.lit(1)).alias("__gsz"))
    oversized = sizes.filter(F.col("__gsz") > group_cap)
    proj = proj.join(oversized.select(*context), on=context, how="left_anti")

    def removed(pdf: pd.DataFrame) -> pd.DataFrame:
        # row_ref as a tertiary key pins ONE canonical maximal subsequence:
        # the returned set is deterministic regardless of partition order.
        s = pdf.sort_values(["__l", "__r", "row_ref"], kind="mergesort")
        vals = s["__r"].to_numpy()
        n = len(vals)
        tails: list[float] = []
        tails_idx: list[int] = []
        parent = [-1] * n
        for i, v in enumerate(vals):
            k = bisect.bisect_right(tails, v)
            if k == len(tails):
                tails.append(v)
                tails_idx.append(i)
            else:
                tails[k] = v
                tails_idx[k] = i
            if k > 0:
                parent[i] = tails_idx[k - 1]
        keep = set()
        i = tails_idx[-1] if tails_idx else -1
        while i != -1:
            keep.add(i)
            i = parent[i]
        mask = [i not in keep for i in range(n)]
        out = s.loc[mask, ["row_ref"]].copy()
        for c in context:
            out[c] = pdf[c].iloc[0]
        return out[[*context, "row_ref"]]

    ref_type = dict(proj.dtypes)["row_ref"]
    schema = ", ".join(
        [f"`{c}` {dict(proj.dtypes)[c]}" for c in context]
        + [f"row_ref {ref_type}"]
    )
    return proj.groupBy(*context).applyInPandas(removed, schema=schema)


@dataclass
class AODCheck:
    """Lazy set-based AOD check. Provide oc=(left, right) and/or ofd_right."""

    df: DataFrame
    context: list[str]
    oc: tuple[str, str] | None = None
    ordering: str = "ascending"  # left ordering for OC
    ofd_right: str | None = None
    group_cap: int = 5_000_000  # max context-group size for the OC LNDS pass

    def __post_init__(self) -> None:
        if self.oc is None and self.ofd_right is None:
            raise ValueError("AOD check needs an OC pair and/or an OFD right column")
        if self.ordering not in ("ascending", "descending"):
            raise ValueError(f"unknown ordering: {self.ordering}")

    def removals(self) -> DataFrame:
        """Per-context-group removal counts: [<context...>, check, group_size,
        removals]. NOTE: the reference unions the two removal *row sets*; with
        count-only rollups we expose per-check counts and take the max as the
        error upper bound when both checks run (union size <= sum, >= max)."""
        parts = []
        if self.oc is not None:
            left, right = self.oc
            parts.append(
                _oc_removals(
                    self.df,
                    self.context,
                    left,
                    right,
                    self.ordering == "descending",
                    group_cap=self.group_cap,
                ).withColumn("check", F.lit("oc"))
            )
        if self.ofd_right is not None:
            parts.append(
                _ofd_removals(self.df, self.context, self.ofd_right).withColumn(
                    "check", F.lit("ofd")
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def summary(self) -> DataFrame:
        """Single row per check: holds, n_groups, n_violating_groups, n_removals,
        error = removals / n (verifier.cpp:117)."""
        r = self.removals()
        return (
            r.groupBy("check")
            .agg(
                F.sum("group_size").alias("n_rows"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum((F.col("removals") > 0).cast("long")).alias(
                    "n_violating_groups"
                ),
                F.sum(
                    F.when(F.col("removals") > 0, F.col("removals")).otherwise(0)
                ).alias("n_removals"),
                F.sum((F.col("removals") == -1).cast("long")).alias("n_oversized"),
            )
            .select(
                "check",
                ((F.col("n_removals") == 0) & (F.col("n_oversized") == 0)).alias(
                    "holds"
                ),
                "n_rows",
                "n_groups",
                "n_violating_groups",
                "n_removals",
                "n_oversized",
                (F.col("n_removals") / F.col("n_rows")).alias("error"),
            )
        )


    def removal_rows(self, row_ref: str) -> DataFrame:
        """The union removal SET as rows [row_ref], distinct across OC and OFD
        (reference verifier.cpp:74-76 inserts both per-OD sets into one
        std::set; error = |union| / n). ``row_ref`` names a stable row id
        column. OC rows are one canonical maximal-LNDS complement; OFD rows are
        the complement of the (deterministically tie-broken) per-group mode."""
        parts = []
        if self.oc is not None:
            left, right = self.oc
            parts.append(
                _oc_removal_rows(
                    self.df,
                    self.context,
                    left,
                    right,
                    self.ordering == "descending",
                    row_ref,
                    group_cap=self.group_cap,
                ).select("row_ref")
            )
        if self.ofd_right is not None:
            parts.append(
                _ofd_removal_rows(
                    self.df, self.context, self.ofd_right, row_ref
                ).select("row_ref")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()

    def union_summary(self, row_ref: str) -> DataFrame:
        """Single row with the reference's exact error semantics
        (verifier.cpp:117): [holds, n_rows, n_removals, error] where
        n_removals = |OC-set union OFD-set| and error = n_removals / n."""
        n = self.df.agg(F.count(F.lit(1)).alias("n_rows"))
        rem = self.removal_rows(row_ref).agg(
            F.count(F.lit(1)).alias("n_removals")
        )
        return n.crossJoin(rem).select(
            (F.col("n_removals") == 0).alias("holds"),
            "n_rows",
            "n_removals",
            (F.col("n_removals") / F.col("n_rows")).alias("error"),
        )


def aod_check(
    df: DataFrame,
    context: list[str],
    oc: tuple[str, str] | None = None,
    ordering: str = "ascending",
    ofd_right: str | None = None,
    group_cap: int = 5_000_000,
) -> AODCheck:
    """Validate a set-based AOD. See AODCheck."""
    return AODCheck(
        df=df,
        context=list(context),
        oc=oc,
        ordering=ordering,
        ofd_right=ofd_right,
        group_cap=group_cap,
    )
