"""Split: differential-dependency discovery (the reference's Split miner).

Reference semantics (dd/split/split.cpp, dd/dd.h): per column, a search
space of difference constraints [lb, ub] -- either the default ladder
[min_dif, k] for k = 4..0 (split.cpp:666-674, num_dfs_per_column = 5) or
the parsed+intersected rows of a user difference table ordered longest
first (split.cpp:676-723, the boost-regex [a;b] grammar) -- then, for
every RHS column, an instance-exclusion reduce over the LHS search-space
lattice (split.cpp:645-738 InstanceExclusionReduce, the kIeHybrid default)
followed by the redundancy and transitivity fixpoints
(split.cpp:212-268). All double comparisons use the reference's 5-epsilon
relative tolerance (dd.h:19-39, double_type.h:16).

Spark-first design -- the reference materialises all O(n^2) tuple pairs
and dedupes them by their constraint bitset (split.cpp:295-320); the
bitset space is bounded by the tiny per-column constraint count, NOT by
n, so the distributed plan aggregates first and never ships pairs to the
driver:

  1. One groupBy over the projected columns collapses the table to its
     distinct value combos (with counts) -- the only pass over raw rows.
  2. One guarded self cross-join of the combo frame computes every
     per-column distance with JVM expressions (abs difference for
     numerics, built-in levenshtein for strings, datediff for dates) and
     folds each pair straight to its per-column constraint-satisfaction
     bitmask; .distinct() reduces to the evidence set, whose size is
     bounded by the product of per-column pattern counts (<= 2^5 each),
     independent of the row count. A combo pairs with itself only when
     its count >= 2 (the reference's same-cluster min_dif = 0 rule,
     split.cpp:378).
  3. The lattice reduce, redundancy and transitivity fixpoints replay the
     reference verbatim on that evidence -- driver-side set algebra over
     at most a few hundred bitmask vectors.

The same pair frame also yields each column's [min_dif, max_dif] in one
aggregation: every pair of distinct values co-occurs in some combo pair,
and an equal-value pair across combos exists exactly when a value repeats
(the cluster-size > 1 rule).
"""

from __future__ import annotations

import functools
import math
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: dd.h:19 -- DoubleType::kDefaultEpsCount * machine epsilon.
_REL_TOL = 5 * 2.220446049250313e-16


def _is_equal(a: float, b: float) -> bool:
    """boost close_at_tolerance (strong): relative closeness to BOTH sides."""
    d = abs(a - b)
    return d <= _REL_TOL * abs(a) and d <= _REL_TOL * abs(b)


def _less(a: float, b: float) -> bool:
    return a < b and not _is_equal(a, b)


def _leq(a: float, b: float) -> bool:
    return not _less(b, a)


@dataclass(frozen=True)
class Constraint:
    """DFConstraint (dd.h:42-104): a closed difference interval."""

    lb: float
    ub: float

    def contains(self, v: float) -> bool:
        return _leq(self.lb, v) and _leq(v, self.ub)

    def is_within_exclusive(self, v: float) -> bool:
        return _leq(self.lb, v) and _less(v, self.ub)

    def is_subsumed_by(self, other: "Constraint") -> bool:
        return _leq(other.lb, self.lb) and _leq(self.ub, other.ub)

    def longer_than(self, other: "Constraint") -> bool:
        tl, ol = self.ub - self.lb, other.ub - other.lb
        return _less(ol, tl) or (_is_equal(tl, ol) and _less(other.lb, self.lb))

    def eq(self, other: "Constraint") -> bool:
        return _is_equal(self.lb, other.lb) and _is_equal(self.ub, other.ub)

    def intersect(self, other: "Constraint") -> "Constraint | None":
        lb, ub = max(self.lb, other.lb), min(self.ub, other.ub)
        return Constraint(lb, ub) if _leq(lb, ub) else None

    def is_valid(self) -> bool:
        return _leq(self.lb, self.ub)


@dataclass
class DDResult:
    """DDString analog (dd.h:139-150; bind_split.cpp): constraint lists as
    (column_name, lower, upper) tuples, trivial full-range sides omitted."""

    left: list[tuple[str, float, float]]
    right: list[tuple[str, float, float]]

    def to_string(self) -> str:
        fmt = lambda s: " ; ".join(f"{n} [{_fnum(a)}, {_fnum(b)}]" for n, a, b in s)
        return f"{fmt(self.left)} -> {fmt(self.right)}"

    def __str__(self) -> str:
        return self.to_string()


def _fnum(x: float) -> str:
    return str(int(x)) if float(x).is_integer() else str(x)


# --- distance expressions ---------------------------------------------------

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def _distance_expr(dtype: T.DataType, a: Column, b: Column) -> Column:
    """IMetrizableType::Dist (split.cpp:323-336): absolute difference for
    numerics, Levenshtein for strings, day difference for dates -- all
    JVM built-ins, no Python in the pair loop."""
    if isinstance(dtype, _NUMERIC):
        return F.abs(a.cast("double") - b.cast("double"))
    if isinstance(dtype, T.StringType):
        return F.levenshtein(a, b).cast("double")
    if isinstance(dtype, (T.DateType, T.TimestampType)):
        return F.abs(F.datediff(a.cast("date"), b.cast("date"))).cast("double")
    raise ValueError(f"column type {dtype} is not metrizable for DD mining")


def _contains_expr(dist: Column, c: Constraint, tolerant: bool) -> Column:
    """CheckDFConstraint (split.cpp:339-353): double columns use the
    5-eps-tolerant Contains, other types plain closed-interval compares."""
    if not tolerant:
        return (dist >= F.lit(c.lb)) & (dist <= F.lit(c.ub))
    tol = F.lit(_REL_TOL)
    def close(x: Column, y: Column) -> Column:
        d = F.abs(x - y)
        return (d <= tol * F.abs(x)) & (d <= tol * F.abs(y))
    ge_lb = (dist > F.lit(c.lb)) | close(dist, F.lit(c.lb))
    le_ub = (dist < F.lit(c.ub)) | close(dist, F.lit(c.ub))
    return ge_lb & le_ub


# --- difference-table parsing (split.cpp:676-723) ---------------------------

_DF_RE = re.compile(r"\[(.*);(.*)\]$")
_DOUBLE_RE = re.compile(
    r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
    r"|^[+-]?[iI][nN][fF]$|^[+-]?[nN][aA][nN]$"
    r"|^[+-]?0[xX](([0-9a-fA-F])+(\.[0-9a-fA-F]*)?|\.[0-9a-fA-F]+)([pP][+-]?\d+)?$"
)


def _parse_diff_column(values: list, min_max: Constraint) -> list[Constraint]:
    """One difference-table column -> ordered constraint list: parse [a;b]
    rows, intersect with the column's [min_dif, max_dif], drop full-range
    results, dedupe + order longest-first (the set<..., LongerThan>)."""
    kept: list[Constraint] = []
    for v in values:
        if v is None:
            continue
        m = _DF_RE.fullmatch(str(v))
        if not m:
            continue
        lo_s, hi_s = m.group(1), m.group(2)
        if not (_DOUBLE_RE.fullmatch(lo_s) and _DOUBLE_RE.fullmatch(hi_s)):
            continue
        parsed = Constraint(float(lo_s), float(hi_s))
        if not parsed.is_valid():
            continue
        inter = parsed.intersect(min_max)
        if inter is not None and not inter.eq(min_max):
            if not any(
                not inter.longer_than(k) and not k.longer_than(inter) for k in kept
            ):
                kept.append(inter)
    kept.sort(key=functools.cmp_to_key(
        lambda x, y: -1 if x.longer_than(y) else (1 if y.longer_than(x) else 0)
    ))
    return kept


# --- the driver-side lattice reduce (split.cpp:467-738) ---------------------


class _Lattice:
    """Index-space replica of the Split reduce: a DF is a tuple of
    per-column indices into [min_max] + constraints; evidence rows are
    per-column satisfaction bitmasks."""

    def __init__(self, spaces: list[list[Constraint]], min_max: list[Constraint],
                 evidence: list[tuple[int, ...]]):
        self.spaces = spaces
        self.min_max = min_max
        self.evidence = evidence
        self.p = len(spaces)
        # per-column subsume/equality over EXT = [min_max] + constraints
        self.sub: list[list[list[bool]]] = []
        self.eqm: list[list[list[bool]]] = []
        for i in range(self.p):
            ext = [min_max[i]] + spaces[i]
            self.sub.append(
                [[a.is_subsumed_by(b) for b in ext] for a in ext]
            )
            self.eqm.append([[a.eq(b) for b in ext] for a in ext])

    # DF ops ---------------------------------------------------------------
    def df_eq(self, d1, d2) -> bool:
        return all(self.eqm[i][d1[i]][d2[i]] for i in range(self.p))

    def subsume(self, d1, d2) -> bool:
        """Subsume(df1, df2) (split.cpp:498-505): df2 within df1."""
        return all(self.sub[i][d2[i]][d1[i]] for i in range(self.p))

    def check(self, df, ev) -> bool:
        """CheckDF: min_max entries always pass; others read the bitmask."""
        return all(df[i] == 0 or (ev[i] >> (df[i] - 1)) & 1 for i in range(self.p))

    def is_feasible(self, df) -> bool:
        return any(self.check(df, ev) for ev in self.evidence)

    # search spaces (split.cpp:467-496) --------------------------------------
    def space_single(self, index: int) -> list[tuple[int, ...]]:
        base = [0] * self.p
        out = [tuple(base)]
        for k in range(len(self.spaces[index])):
            d = list(base)
            d[index] = k + 1
            out.append(tuple(d))
        return out

    def space_multi(self, indices: list[int]) -> list[tuple[int, ...]]:
        if len(indices) == 1:
            return self.space_single(indices[0])
        last = self.space_single(indices[-1])
        prev = self.space_multi(indices[:-1])
        out = []
        for f in prev:
            for s in last:
                out.append(tuple(f[i] if f[i] else s[i] for i in range(self.p)))
        return out

    # pruning helpers (split.cpp:508-562) ------------------------------------
    def _pos_prune(self, search, first_df):
        return [d for d in search
                if not self.df_eq(d, first_df) and not self.subsume(first_df, d)]

    def _neg_prune(self, search, last_df):
        return [d for d in search
                if not self.df_eq(d, last_df) and not self.subsume(d, last_df)]

    def _pos_split(self, search, first_df):
        prune, rem = [], []
        for d in search:
            if self.df_eq(d, first_df):
                continue
            (prune if self.subsume(first_df, d) else rem).append(d)
        return prune, rem

    def _merge(self, base, to_merge):
        """MergeReducedResults (split.cpp:565-585): drop merged DDs whose
        lhs is subsumed by some base lhs."""
        out = []
        for dd in to_merge:
            if not any(self.subsume(b[0], dd[0]) for b in base):
                out.append(dd)
        return out

    def ie_reduce(self, pair_idx: list[int], search, rhs):
        """InstanceExclusionReduce (split.cpp:645-738)."""
        if not search:
            return []
        dds = []
        first_df, last_df = search[0], search[-1]
        remaining_idx = []
        last_holds = True
        no_pairs_left = True
        for idx in pair_idx:
            ev = self.evidence[idx]
            if not self.check(rhs, ev):
                if self.check(first_df, ev):
                    remaining_idx.append(idx)
                    no_pairs_left = False
                if last_holds and self.check(last_df, ev):
                    last_holds = False
                if not no_pairs_left and not last_holds:
                    break
        if no_pairs_left:
            if self.is_feasible(first_df):
                dds.append((first_df, rhs))
            rem = self._pos_prune(search, first_df)
            dds.extend(self.ie_reduce(pair_idx, rem, rhs))
            return dds
        if not last_holds:
            rem = self._neg_prune(search, last_df)
            return self.ie_reduce(pair_idx, rem, rhs)
        prune, rem = self._pos_split(search, first_df)
        dds = self.ie_reduce(pair_idx, rem, rhs)
        pruning_dds = self.ie_reduce(remaining_idx, prune, rhs)
        dds.extend(self._merge(dds, pruning_dds))
        return dds

    # fixpoints (split.cpp:212-268) ------------------------------------------
    def remove_redundant(self, dds):
        while True:
            copy = []
            for li, left in enumerate(dds):
                redundant = False
                for ri, right in enumerate(dds):
                    if li != ri and self.subsume(right[0], left[0]) \
                            and self.subsume(left[1], right[1]):
                        redundant = True
                        break
                if not redundant:
                    copy.append(left)
            if len(copy) == len(dds):
                return copy
            dds = copy

    def remove_transitive(self, dds):
        while True:
            copy = []
            removable = False
            for dd3 in dds:
                remove = False
                for dd1 in dds:
                    done = False
                    for dd2 in dds:
                        # Subsume(dd2.lhs, dd1.rhs): dd1's rhs within dd2's
                        # lhs (split.cpp:254)
                        if self.subsume(dd2[0], dd1[1]) \
                                and self.df_eq(dd1[0], dd3[0]) \
                                and self.df_eq(dd2[1], dd3[1]):
                            if not removable:
                                remove = True
                            removable = True
                            done = True
                            break
                    if done:
                        break
                if not remove:
                    copy.append(dd3)
            if len(copy) == len(dds):
                return copy
            dds = copy


# --- the miner ---------------------------------------------------------------


def mine_dds(
    df: DataFrame,
    columns: list[str] | None = None,
    difference_table: DataFrame | None = None,
    num_dfs_per_column: int = 5,
    max_combos: int = 20_000,
    max_evidence: int = 100_000,
) -> list[DDResult]:
    """Split DD discovery (split.cpp ExecuteInternal, kIeHybrid reduce).

    ``difference_table`` mirrors the reference's difference-table option:
    same column count as ``columns``, string cells ``[a;b]`` per column
    (non-matching cells ignored). Without it, each column gets the default
    ladder [min_dif, k], k = num_dfs_per_column-1 .. 0. Returns DDResult
    rows in the reference's collection order. ``max_combos`` guards the
    self cross-join (at 100 TB pre-aggregate or sample before mining);
    ``max_evidence`` guards the driver collect.
    """
    columns = list(columns or df.columns)
    p = len(columns)
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    col_types = [dtypes[c] for c in columns]
    for c, t in zip(columns, col_types):
        _distance_expr(t, F.col("x"), F.col("x"))  # type gate, raises early

    # 1. distinct combos with counts -- the only full-table pass
    combos = df.select(*columns).na.drop().groupBy(*columns).count()
    combos = combos.persist()
    n_combos = combos.count()
    if n_combos > max_combos:
        combos.unpersist()
        raise ValueError(
            f"{n_combos} distinct value combos exceed max_combos={max_combos}; "
            "pre-aggregate or sample the table before DD mining"
        )

    a = combos.alias("a")
    b = combos.alias("b")
    sa = F.struct(*[F.col(f"a.{c}") for c in columns])
    sb = F.struct(*[F.col(f"b.{c}") for c in columns])
    pair_cond = (sa < sb) | ((sa == sb) & (F.col("a.count") >= 2))
    dists = [
        _distance_expr(t, F.col(f"a.{c}"), F.col(f"b.{c}")).alias(f"d{i}")
        for i, (c, t) in enumerate(zip(columns, col_types))
    ]
    pairs = a.join(b, pair_cond, "cross").select(*dists).persist()

    # 2. per-column [min_dif, max_dif] in one aggregation
    aggs = []
    for i in range(p):
        aggs += [F.min(f"d{i}").alias(f"mn{i}"), F.max(f"d{i}").alias(f"mx{i}")]
    mm_rows = pairs.agg(*aggs).collect()
    row0 = mm_rows[0] if mm_rows else None
    min_max: list[Constraint] = []
    for i in range(p):
        mn = row0[f"mn{i}"] if row0 is not None else None
        mx = row0[f"mx{i}"] if row0 is not None else None
        if mn is None:  # no pairs at all (0/1-row table)
            min_max.append(Constraint(math.inf, 0.0))
        else:
            min_max.append(Constraint(float(mn), float(mx)))

    # 3. per-column constraint spaces (split.cpp:666-723)
    diff_cols: list[list] = [[] for _ in range(p)]
    if difference_table is not None:
        dt_cols = difference_table.columns
        if len(dt_cols) != p:
            raise ValueError(
                "difference table must have as many columns as the mined set"
            )
        for r in difference_table.collect():
            for i, c in enumerate(dt_cols):
                diff_cols[i].append(r[c])
    spaces: list[list[Constraint]] = []
    for i in range(p):
        if not min_max[i].is_valid():
            spaces.append([])
        elif difference_table is None:
            lad = [
                Constraint(min_max[i].lb, float(k))
                for k in range(num_dfs_per_column - 1, -1, -1)
                if min_max[i].is_within_exclusive(float(k))
            ]
            spaces.append(lad)
        else:
            spaces.append(_parse_diff_column(diff_cols[i], min_max[i]))

    keep = [i for i in range(p) if spaces[i]]
    if not keep:
        pairs.unpersist()
        combos.unpersist()
        return []
    kept_cols = [columns[i] for i in keep]
    kept_spaces = [spaces[i] for i in keep]
    kept_min_max = [min_max[i] for i in keep]
    kept_types = [col_types[i] for i in keep]

    # 4. evidence: per-column satisfaction bitmasks, distinct (split.cpp:295)
    masks = []
    for j, i in enumerate(keep):
        tolerant = isinstance(kept_types[j], (T.DoubleType, T.FloatType))
        m = F.lit(0)
        for k, c in enumerate(kept_spaces[j]):
            m = m + F.when(
                _contains_expr(F.col(f"d{i}"), c, tolerant), F.lit(1 << k)
            ).otherwise(F.lit(0))
        masks.append(m.alias(f"m{j}"))
    ev_rows = pairs.select(*masks).distinct().limit(max_evidence + 1).collect()
    pairs.unpersist()
    combos.unpersist()
    if len(ev_rows) > max_evidence:
        raise ValueError("evidence set exceeds max_evidence")
    evidence = [tuple(int(r[f"m{j}"]) for j in range(len(keep))) for r in ev_rows]

    # 5. reduce + fixpoints, reference order (split.cpp:163-268)
    lat = _Lattice(kept_spaces, kept_min_max, evidence)
    m = len(keep)
    all_idx = list(range(len(evidence)))
    collection = []
    for index in range(m):
        others = [j for j in range(m) if j != index]
        if not others:
            continue
        search = lat.space_multi(others)
        dfs_y = lat.space_single(index)
        for df_y in dfs_y:
            if lat.df_eq(df_y, dfs_y[0]):
                continue
            collection.extend(lat.ie_reduce(all_idx, search, df_y))
    collection = lat.remove_redundant(collection)
    collection = lat.remove_transitive(collection)

    out = []
    for lhs, rhs in collection:
        left = [
            (kept_cols[i], kept_spaces[i][lhs[i] - 1].lb, kept_spaces[i][lhs[i] - 1].ub)
            for i in range(m) if lhs[i]
        ]
        right = [
            (kept_cols[i], kept_spaces[i][rhs[i] - 1].lb, kept_spaces[i][rhs[i] - 1].ub)
            for i in range(m) if rhs[i]
        ]
        out.append(DDResult(left, right))
    return out
