"""HyMD: matching-dependency discovery (the reference's HyMD miner).

Reference semantics (md/hymd/*): over a column-match list (similarity
measure + min_sim clamp per matched column pair), mine all maximally
interesting MDs: an MD is an LHS vector of decision boundaries (one per
column match, 0 = unconstrained) plus an RHS (column match, boundary b),
valid when every record pair whose similarity vector dominates the LHS
has rhs similarity >= b. The pair universe is ALL ordered pairs including
reflexive ones (records_info.h:30: n_left * n_right); similarities below
a column match's min_sim clamp to 0 (levenshtein.cpp Comparer); decision
boundaries are the observed ("natural") similarity values; the default
min_support for a single table is n + 1 (hymd.cpp:80-88); prune_nondisjoint
drops MDs whose LHS constrains the RHS column match; the reported RHS
bound is the tightest valid one (the minimum similarity over matching
pairs), non-trivial (> 0 and > the LHS bound on that match); minimality
is against generalizations (lowering any LHS boundary must strictly lower
the achievable RHS bound -- monotone, so immediate generalizations
suffice). Result order replays utility/md_less.h: cardinality, then LHS
vector, then RHS bound descending, then RHS index. Validated verbatim
against test_hymd.cpp's AnimalsBeveragesNormal / NoLimits goldens.

Spark-first split: the reference's record-pair inference machinery is
single-node search strategy; what the lattice consumes is the similarity-
vector EVIDENCE multiset, whose distinct-row count is bounded by the
product of per-match natural-boundary counts, not by n^2. One groupBy
collapses the table to distinct value combos, one guarded self cross-join
evaluates every column match with JVM expressions (built-in levenshtein /
equality / numeric difference) and groupBy-sums ordered-pair
multiplicities (cnt_a * cnt_b -- reflexive pairs included, matching the
reference). The boundary-lattice walk runs driver-side over that evidence
with support-monotone pruning and a max_cardinality cap.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnMatch:
    """A similarity classifier between left_column and right_column
    (md/hymd/preprocessing/column_matches/*): 'levenshtein' (normalized,
    min_sim clamp), 'equality' (1/0), or 'number_difference'
    (1 - |a-b|/span, span from the data)."""

    left_column: str
    right_column: str
    kind: str = "levenshtein"
    min_sim: float = 0.7
    #: kind='custom': a python similarity callable (the pybind Custom match,
    #: bind_md.cpp:265-290, defaults min_sim=0.7) evaluated as an
    #: Arrow-batched pandas UDF over the deduplicated value combos -- the
    #: python cost is bounded by distinct pair patterns, not n^2 rows.
    #: ``symmetrical`` / ``equality_is_max`` are single-node evaluation
    #: shortcuts in the reference and do not change results.
    func: Callable | None = None
    measure_name: str | None = None

    def name(self) -> str:
        label = self.measure_name or (
            "custom_measure" if self.kind == "custom" else self.kind
        )
        return f"{label}({self.left_column}, {self.right_column})"


@dataclass
class MDRule:
    """model::MD analog: per-match LHS decision bounds + (rhs index, bound)."""

    lhs_bounds: list[float]
    rhs_index: int
    rhs_bound: float
    column_matches: list[ColumnMatch]

    def to_string(self) -> str:
        lhs = " ∧ ".join(
            f"{m.name()}>={b:g}"
            for m, b in zip(self.column_matches, self.lhs_bounds)
            if b != 0.0
        )
        rhs = f"{self.column_matches[self.rhs_index].name()}>={self.rhs_bound:g}"
        return f"[{lhs}] -> {rhs}"

    def __str__(self) -> str:
        return self.to_string()


def _sim_expr(cm: ColumnMatch, a: Column, b: Column, span: float | None) -> Column:
    if cm.kind == "levenshtein":
        mx = F.greatest(F.length(a), F.length(b))
        s = F.when(mx == 0, F.lit(1.0)).otherwise(
            F.lit(1.0) - F.levenshtein(a, b) / mx.cast("double")
        )
    elif cm.kind == "equality":
        s = F.when(a == b, F.lit(1.0)).otherwise(F.lit(0.0))
    elif cm.kind == "number_difference":
        if not span:
            s = F.lit(1.0)
        else:
            s = F.greatest(
                F.lit(0.0), F.lit(1.0) - F.abs(a.cast("double") - b.cast("double")) / F.lit(span)
            )
    elif cm.kind == "custom":
        if cm.func is None:
            raise ValueError("custom column match needs func")
        fn = cm.func

        @F.pandas_udf("double")
        def _custom_sim(l: pd.Series, r: pd.Series) -> pd.Series:
            out = [float(fn(x, y)) for x, y in zip(l, r)]
            for v in out:
                if not 0.0 <= v <= 1.0:
                    # the reference's custom-measure validation
                    # (value_processing_worker.h SimilarityValidation)
                    raise ValueError(
                        "Similarity must be in the [0.0, 1.0] range, "
                        f"but is {v:f}"
                    )
            return pd.Series(out, dtype="float64")

        s = _custom_sim(a, b)
    else:
        raise ValueError(f"unknown column match kind {cm.kind!r}")
    return F.when(s >= F.lit(cm.min_sim), s).otherwise(F.lit(0.0))


def mine_mds(
    df: DataFrame,
    column_matches: list[ColumnMatch] | None = None,
    min_support: int | None = None,
    prune_nondisjoint: bool = True,
    max_cardinality: int | None = None,
    max_combos: int = 20_000,
    max_evidence: int = 200_000,
    max_lattice: int = 2_000_000,
) -> list[MDRule]:
    """HyMD matching-dependency discovery (hymd.cpp ExecuteInternal).

    Defaults mirror the reference: one Levenshtein(i, i, 0.7) match per
    column, min_support = n + 1 for the single-table case. Guards:
    ``max_combos`` bounds the self cross-join, ``max_evidence`` the
    distinct similarity-vector collect, ``max_lattice`` the driver-side
    boundary-lattice enumeration (raise = pre-aggregate or cap
    cardinality, never a silent truncation)."""
    if column_matches is None:
        column_matches = [ColumnMatch(c, c) for c in df.columns]
    k = len(column_matches)
    cols = sorted({cm.left_column for cm in column_matches}
                  | {cm.right_column for cm in column_matches})

    # spans for number_difference matches (one agg)
    spans: dict[int, float] = {}
    need_span = [i for i, cm in enumerate(column_matches)
                 if cm.kind == "number_difference"]
    if need_span:
        aggs = []
        for i in need_span:
            cm = column_matches[i]
            aggs += [
                F.max(F.greatest(F.col(cm.left_column), F.col(cm.right_column))).alias(f"mx{i}"),
                F.min(F.least(F.col(cm.left_column), F.col(cm.right_column))).alias(f"mn{i}"),
            ]
        row = df.agg(*aggs).collect()[0]
        for i in need_span:
            spans[i] = float(row[f"mx{i}"] - row[f"mn{i}"]) if row[f"mx{i}"] is not None else 0.0

    combos = df.select(*cols).na.drop().groupBy(*cols).count().persist()
    n_combos = combos.count()
    if n_combos > max_combos:
        combos.unpersist()
        raise ValueError(
            f"{n_combos} distinct combos exceed max_combos={max_combos}"
        )
    n_rows = int(
        combos.agg(F.sum("count").alias("n")).collect()[0]["n"] or 0
    )
    if min_support is None:
        min_support = n_rows + 1  # hymd.cpp:80-88, single-table default

    a, b = combos.alias("a"), combos.alias("b")
    weight = (F.col("a.count").cast("long") * F.col("b.count")).alias("wt")
    sims = [
        _sim_expr(cm, F.col(f"a.{cm.left_column}"), F.col(f"b.{cm.right_column}"),
                  spans.get(i)).alias(f"s{i}")
        for i, cm in enumerate(column_matches)
    ]
    rows = (
        a.join(b, None, "cross")
        .select(weight, *sims)
        .groupBy(*[f"s{i}" for i in range(k)])
        .agg(F.sum("wt").alias("cnt"))
        .limit(max_evidence + 1)
        .collect()
    )
    combos.unpersist()
    if len(rows) > max_evidence:
        raise ValueError("similarity evidence exceeds max_evidence")
    evidence = [
        (tuple(float(r[f"s{i}"]) for i in range(k)), int(r["cnt"])) for r in rows
    ]

    # natural boundaries per column match (observed nonzero sims)
    bounds = [
        sorted({v[i] for v, _ in evidence if v[i] > 0.0}) for i in range(k)
    ]
    cands = [[0.0] + bs for bs in bounds]

    # lattice walk with support-monotone pruning
    def stats(lhs: tuple[float, ...]):
        sup = 0
        mins = [None] * k
        for vec, cnt in evidence:
            if all(vec[i] >= lhs[i] for i in range(k)):
                sup += cnt
                for m in range(k):
                    if mins[m] is None or vec[m] < mins[m]:
                        mins[m] = vec[m]
        return sup, mins

    cache: dict[tuple[float, ...], tuple[int, list]] = {}

    def get(lhs: tuple[float, ...]):
        r = cache.get(lhs)
        if r is None:
            if len(cache) > max_lattice:
                raise ValueError("MD lattice exceeds max_lattice")
            r = stats(lhs)
            cache[lhs] = r
        return r

    out: list[MDRule] = []
    card_cap = max_cardinality if max_cardinality is not None else k
    # enumerate supported lhs vectors level-wise (support is antitone)
    frontier = [tuple([0.0] * k)]
    seen = {frontier[0]}
    all_supported = []
    while frontier:
        nxt = []
        for lhs in frontier:
            sup, _ = get(lhs)
            if sup < min_support:
                continue
            all_supported.append(lhs)
            if sum(1 for v in lhs if v != 0.0) >= card_cap:
                continue
            for i in range(k):
                higher = [c for c in cands[i] if c > lhs[i]]
                if not higher:
                    continue
                child = list(lhs)
                child[i] = higher[0]
                child = tuple(child)
                if child not in seen:
                    seen.add(child)
                    nxt.append(child)
                # also jump boundaries within the same column (lattice is
                # over all candidate values, not just adjacent steps)
                for c in higher[1:]:
                    child2 = list(lhs)
                    child2[i] = c
                    child2 = tuple(child2)
                    if child2 not in seen:
                        seen.add(child2)
                        nxt.append(child2)
        frontier = nxt

    for lhs in all_supported:
        sup, mins = get(lhs)
        for m in range(k):
            if prune_nondisjoint and lhs[m] != 0.0:
                continue
            bnd = mins[m]
            if bnd is None or bnd <= 0.0 or bnd <= lhs[m]:
                continue
            minimal = True
            for i in range(k):
                if lhs[i] == 0.0:
                    continue
                lower = [c for c in cands[i] if c < lhs[i]]
                gen = list(lhs)
                gen[i] = lower[-1]
                gsup, gmins = get(tuple(gen))
                if gmins[m] is not None and gmins[m] >= bnd:
                    minimal = False
                    break
            if minimal:
                out.append(MDRule(list(lhs), m, bnd, column_matches))

    def card(r: MDRule) -> int:
        return sum(1 for v in r.lhs_bounds if v != 0.0)

    out.sort(key=lambda r: (card(r), r.lhs_bounds, -r.rhs_bound, r.rhs_index))
    return out
