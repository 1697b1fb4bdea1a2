"""Denial-constraint (DC) validation.

Reference (dc/verifier/dc_verifier.h:30-50, dc/parser/): a DC
``!(p1 & p2 & ...)`` over tuple pairs (s, t) holds iff NO pair satisfies every
predicate ``s.A op t.B`` (op in <, <=, >, >=, ==, !=). Single-tuple predicates
(``s.A op s.B``) restrict one side only. The reference accelerates the pair
search with a kd-tree (util/kdtree.h); violating pairs are the evidence.

Spark design -- predicate-shape-aware join planning instead of a spatial index:
  * s.A == t.B equality predicates become hash-join keys (the scalable case);
  * inequality predicates become join filters evaluated inside the join
    (range-join-style pruning is left to Catalyst/AQE);
  * with NO equality predicate the plan is a cross join -- guarded by
    ``allow_cross_join`` so a trillion-row table can't accidentally request n^2.
Single-tuple predicates are pushed down as pre-join filters on each side.

A predicate is a triple ``(left, op, right)`` where left/right are
``"s.col"`` / ``"t.col"`` references.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}

_REF = re.compile(r"^([st])\.(\w+)$")


def _parse(side_expr: str) -> tuple[str, str]:
    m = _REF.match(side_expr)
    if not m:
        raise ValueError(f"bad tuple reference: {side_expr!r} (want 's.col'/'t.col')")
    return m.group(1), m.group(2)


@dataclass
class DCCheck:
    """Lazy DC check over predicates on the tuple pair (s, t)."""

    df: DataFrame
    predicates: list[tuple[str, str, str]]
    row_ref: str | None = None
    allow_cross_join: bool = False
    highlight_cap: int = 100

    def __post_init__(self) -> None:
        if not self.predicates:
            raise ValueError("DC check needs at least one predicate")
        for _, op, _ in self.predicates:
            if op not in _OPS:
                raise ValueError(f"unknown op: {op}")

    @cached_property
    def _classified(self):
        single_s: list[Column] = []
        single_t: list[Column] = []
        eq_keys: list[tuple[str, str]] = []
        pair_filters: list[tuple[str, str, str, str, str]] = []
        for left, op, right in self.predicates:
            ls, lc = _parse(left)
            rs, rc = _parse(right)
            if ls == rs:  # single-tuple predicate -> pre-join filter
                expr = _OPS[op](F.col(lc), F.col(rc))
                (single_s if ls == "s" else single_t).append(expr)
            elif op == "==":
                eq_keys.append((lc, rc) if ls == "s" else (rc, lc))
            else:
                # normalize to s-on-left
                if ls == "s":
                    pair_filters.append((lc, op, rc, "s", "t"))
                else:
                    flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "!=": "!="}
                    pair_filters.append((rc, flip[op], lc, "s", "t"))
        return single_s, single_t, eq_keys, pair_filters

    @cached_property
    def _violating_pairs(self) -> DataFrame:
        single_s, single_t, eq_keys, pair_filters = self._classified
        rid = (
            F.col(self.row_ref) if self.row_ref else F.monotonically_increasing_id()
        )
        base = self.df.withColumn("__rid", rid)
        if self.row_ref is None:
            base = base.persist()
        s = base
        for e in single_s:
            s = s.filter(e)
        t = base
        for e in single_t:
            t = t.filter(e)
        s, t = s.alias("s"), t.alias("t")
        cond: Column = F.col("s.__rid") != F.col("t.__rid")
        for sc, tc in eq_keys:
            cond = cond & (F.col(f"s.{sc}") == F.col(f"t.{tc}"))
        for sc, op, tc, _, _ in pair_filters:
            cond = cond & _OPS[op](F.col(f"s.{sc}"), F.col(f"t.{tc}"))
        if not eq_keys and not self.allow_cross_join:
            raise ValueError(
                "DC has no equality predicate: the pair search is a cross join. "
                "Pass allow_cross_join=True to run it anyway (small tables only)."
            )
        return s.join(t, cond, "inner").select(
            F.col("s.__rid").alias("rid_s"), F.col("t.__rid").alias("rid_t")
        )

    def summary(self) -> DataFrame:
        """Single row: holds (no satisfying pair) / n_violating_pairs
        (ordered pairs, as the reference enumerates (s,t) with s != t)."""
        return self._violating_pairs.agg(
            F.count(F.lit(1)).alias("n_violating_pairs")
        ).select(
            (F.col("n_violating_pairs") == 0).alias("holds"), "n_violating_pairs"
        )

    def highlights(self) -> DataFrame:
        """Violating (s, t) rid pairs, capped."""
        return self._violating_pairs.orderBy("rid_s", "rid_t").limit(
            self.highlight_cap
        )


def dc_check(
    df: DataFrame,
    predicates: list[tuple[str, str, str]],
    row_ref: str | None = None,
    allow_cross_join: bool = False,
    highlight_cap: int = 100,
) -> DCCheck:
    """Validate a denial constraint. See DCCheck."""
    return DCCheck(
        df=df,
        predicates=list(predicates),
        row_ref=row_ref,
        allow_cross_join=allow_cross_join,
        highlight_cap=highlight_cap,
    )
