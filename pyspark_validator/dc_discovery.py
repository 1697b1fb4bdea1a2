"""FastADC: approximate denial-constraint discovery (the reference's
FastADC miner).

Reference semantics (dc/FastADC/*): build the predicate space over column
pairs -- six comparison operators for comparable (numeric, average-ratio >
comparable_threshold) pairs, ==/!= for joinable (same type, shared-value
percentage > minimum_shared_value) pairs (predicate_builder.cpp:66-139,
typed_column_data_value_differences.cpp); collect the evidence multiset
(per ordered tuple pair, the bitset of satisfied predicates); then the
approximate evidence inversion search (approximate_evidence_inverter.h):
predicates reordered by evidence coverage, a DFS over hit/unhit decisions
per evidence with DC-candidate tries, a violation budget of
ceil((1-threshold)*|pairs|) hits to reach, and finally closure-based
minimisation (closure.h, denial_constraint_set.h) with implication /
symmetry / transitivity reasoning.

Spark-first split: the reference's PLI shards + clue sets are single-node
machinery for enumerating the O(n^2) tuple pairs; the evidence multiset is
what the search consumes, and its distinct-bitset count is bounded by the
predicate space, not by n. So the distributed plan is: ONE groupBy
collapses the table to distinct value combos with counts, ONE guarded self
cross-join evaluates every predicate with JVM expressions and folds each
ordered pair straight to its packed evidence words, and a groupBy sums
pair multiplicities (cnt_a*cnt_b across combos, cnt*(cnt-1) within) --
the driver then searches over a few hundred (bitset, count) rows. Column
gating stats (averages, shared-value percentages) are one agg plus one
melt-pivot job per type group.

All double comparisons replay the reference's 5-epsilon relative
tolerance (model::DoubleType, kDefaultEpsCount = 5).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import cmp_to_key, reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_REL_TOL = 5 * 2.220446049250313e-16

OPS = ("==", "!=", ">", "<", ">=", "<=")
_IMPLICATIONS = {
    "==": ("==", ">=", "<="),
    "!=": ("!=",),
    ">": (">", ">=", "!="),
    "<": ("<", "<=", "!="),
    ">=": (">=",),
    "<=": ("<=",),
}
_TRANSITIVES = {
    "==": ("==",),
    "!=": ("==",),
    ">": (">", ">=", "=="),
    "<": ("<", "<=", "=="),
    ">=": (">", ">=", "=="),
    "<=": ("<", "<=", "=="),
}
_INVERSE = {"==": "!=", "!=": "==", ">": "<=", "<": ">=", ">=": "<", "<=": ">"}
_SYMMETRIC = {"==": "==", "!=": "!=", ">": "<", "<": ">", ">=": "<=", "<=": ">="}


@dataclass(frozen=True)
class Pred:
    """Predicate (model/predicate.h): operator + two (tuple, column)
    operands, tuple 0 = t, 1 = s."""

    op: str
    lt: int
    lc: int
    rt: int
    rc: int

    def to_string(self, names: list[str]) -> str:
        t = lambda x: "t" if x == 0 else "s"
        return (
            f"{t(self.lt)}.{names[self.lc]} {self.op} {t(self.rt)}.{names[self.rc]}"
        )


class _Provider:
    """Predicate flyweight + index provider (providers/*): indices are
    assigned in first-seen order, the built space first."""

    def __init__(self):
        self.index: dict[Pred, int] = {}
        self.objects: list[Pred] = []

    def get_index(self, p: Pred) -> int:
        i = self.index.get(p)
        if i is None:
            i = len(self.objects)
            self.index[p] = i
            self.objects.append(p)
        return i

    def get(self, op: str, l: tuple[int, int], r: tuple[int, int]) -> Pred:
        return Pred(op, l[0], l[1], r[0], r[1])


def _symmetric(p: Pred) -> Pred:
    return Pred(_SYMMETRIC[p.op], p.rt, p.rc, p.lt, p.lc)


def _inverse(p: Pred) -> Pred:
    return Pred(_INVERSE[p.op], p.lt, p.lc, p.rt, p.rc)


def _inv_ts(p: Pred) -> Pred:
    return Pred(p.op, 1 - p.lt, p.lc, 1 - p.rt, p.rc)


def _implications(p: Pred) -> list[Pred]:
    return [Pred(op, p.lt, p.lc, p.rt, p.rc) for op in _IMPLICATIONS[p.op]]


@dataclass
class DCResult:
    """DenialConstraint (model/denial_constraint.h): a predicate set,
    rendered as the reference's ¬{ p1 ∧ p2 ∧ ... } string."""

    predicates: list[str]

    def to_string(self) -> str:
        return "¬{ " + " ∧ ".join(self.predicates) + " }"

    def __str__(self) -> str:
        return self.to_string()


# --- Spark expressions --------------------------------------------------------


def _close(a: Column, b: Column) -> Column:
    tol = F.lit(_REL_TOL)
    d = F.abs(a - b)
    return (d <= tol * F.abs(a)) & (d <= tol * F.abs(b))


def _op_expr(op: str, a: Column, b: Column, tolerant: bool) -> Column:
    if not tolerant:
        return {
            "==": a == b, "!=": a != b, ">": a > b,
            "<": a < b, ">=": a >= b, "<=": a <= b,
        }[op]
    eq = _close(a, b)
    if op == "==":
        return eq
    if op == "!=":
        return ~eq
    if op == ">":
        return (a > b) & ~eq
    if op == "<":
        return (a < b) & ~eq
    if op == ">=":
        return (a > b) | eq
    return (a < b) | eq


def _kind(dtype: T.DataType) -> str:
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "double"
    if isinstance(dtype, T.StringType):
        return "string"
    raise ValueError(f"FastADC does not support column type {dtype}")


# --- column-pair gating (typed_column_data_value_differences.cpp) -------------


def _gating_stats(df: DataFrame, columns: list[str], kinds: list[str]):
    """Averages for numeric columns (one agg) and shared-value percentages
    for same-type column pairs (one melt+pivot per type group)."""
    p = len(columns)
    num_cols = [c for c, k in zip(columns, kinds) if k != "string"]
    avgs = {}
    if num_cols:
        row = df.agg(*[F.avg(c).alias(c) for c in num_cols]).collect()[0]
        avgs = {c: float(row[c] or 0.0) for c in num_cols}
    shared: dict[tuple[int, int], float] = {}
    groups: dict[str, list[int]] = {}
    for i, k in enumerate(kinds):
        groups.setdefault(k, []).append(i)
    for k, idxs in groups.items():
        if len(idxs) < 2:
            continue
        freq = None
        for i in idxs:
            f_i = (
                df.groupBy(F.col(columns[i]).alias("v"))
                .agg(F.count(F.lit(1)).alias(f"c{i}"))
            )
            freq = f_i if freq is None else freq.join(f_i, "v", "outer")
        aggs = []
        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                i, j = idxs[a], idxs[b]
                ci = F.coalesce(F.col(f"c{i}"), F.lit(0))
                cj = F.coalesce(F.col(f"c{j}"), F.lit(0))
                aggs.append(F.sum(F.least(ci, cj)).alias(f"s_{i}_{j}"))
                aggs.append(F.sum(F.greatest(ci, cj)).alias(f"t_{i}_{j}"))
        row = freq.agg(*aggs).collect()[0]
        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                i, j = idxs[a], idxs[b]
                tot = int(row[f"t_{i}_{j}"] or 0)
                shared[(i, j)] = (int(row[f"s_{i}_{j}"] or 0) / tot) if tot else 0.0
    return avgs, shared


def build_predicate_space(
    df: DataFrame,
    columns: list[str],
    allow_cross_columns: bool = True,
    minimum_shared_value: float = 0.3,
    comparable_threshold: float = 0.1,
) -> tuple[list[Pred], _Provider]:
    """PredicateBuilder::BuildPredicateSpace (predicate_builder.cpp:32-117):
    i<=j column-pair loop, joinable/comparable gating, operator order
    ==, !=, >, <, >=, <=."""
    kinds = [_kind(f.dataType) for f in df.select(*columns).schema.fields]
    avgs, shared = _gating_stats(df, columns, kinds)
    provider = _Provider()
    space: list[Pred] = []
    p = len(columns)
    for i in range(p):
        for j in range(i, p):
            same = i == j
            same_type = kinds[i] == kinds[j]
            if same:
                joinable = True
                comparable = kinds[i] != "string"
            elif not allow_cross_columns or not same_type:
                joinable = comparable = False
            else:
                joinable = shared.get((i, j), 0.0) > minimum_shared_value
                if kinds[i] == "string":
                    comparable = False
                else:
                    a1, a2 = avgs[columns[i]], avgs[columns[j]]
                    if a1 == 0.0 and a2 == 0.0:
                        ratio = 0.0
                    else:
                        ratio = min(a1, a2) / max(a1, a2)
                    comparable = ratio > comparable_threshold
            if not (joinable or comparable):
                continue
            for op in OPS:
                if comparable or op in ("==", "!="):
                    pred = Pred(op, 0, i, 1, j)
                    provider.get_index(pred)
                    space.append(pred)
    return space, provider


# --- evidence construction (Spark) ---------------------------------------------


def build_evidence(
    df: DataFrame,
    columns: list[str],
    space: list[Pred],
    max_combos: int = 20_000,
    max_evidence: int = 200_000,
) -> list[tuple[int, int]]:
    """The evidence multiset: per ordered tuple pair (t, s), t != s, the
    bitset of satisfied predicates, deduped with pair-multiplicity counts.
    One groupBy to combos, one guarded cross-join with all predicates as
    JVM expressions packed into 62-bit words, one groupBy-sum."""
    kinds = [_kind(f.dataType) for f in df.select(*columns).schema.fields]
    combos = df.select(*columns).na.drop().groupBy(*columns).count().persist()
    n_combos = combos.count()
    if n_combos > max_combos:
        combos.unpersist()
        raise ValueError(
            f"{n_combos} distinct combos exceed max_combos={max_combos}; "
            "sample or pre-aggregate before DC mining"
        )
    a, b = combos.alias("a"), combos.alias("b")
    sa = F.struct(*[F.col(f"a.{c}") for c in columns])
    sb = F.struct(*[F.col(f"b.{c}") for c in columns])
    same = sa == sb
    weight = (
        F.when(same, F.col("a.count").cast("long") * (F.col("b.count") - 1))
        .otherwise(F.col("a.count").cast("long") * F.col("b.count"))
    )
    n_words = (len(space) + 61) // 62
    words = []
    for w in range(n_words):
        acc = F.lit(0).cast("long")
        for k, pred in enumerate(space[w * 62 : (w + 1) * 62]):
            ls = "a" if pred.lt == 0 else "b"
            rs = "a" if pred.rt == 0 else "b"
            lcol = F.col(f"{ls}.{columns[pred.lc]}")
            rcol = F.col(f"{rs}.{columns[pred.rc]}")
            tolerant = kinds[pred.lc] == "double"
            e = _op_expr(pred.op, lcol, rcol, tolerant)
            acc = acc + F.when(e, F.lit(1 << k).cast("long")).otherwise(F.lit(0))
        words.append(acc.alias(f"w{w}"))
    pairs = a.join(b, None, "cross").select(weight.alias("wt"), *words)
    rows = (
        pairs.filter(F.col("wt") > 0)
        .groupBy(*[f"w{w}" for w in range(n_words)])
        .agg(F.sum("wt").alias("cnt"))
        .limit(max_evidence + 1)
        .collect()
    )
    combos.unpersist()
    if len(rows) > max_evidence:
        raise ValueError("evidence set exceeds max_evidence")
    out = []
    for r in rows:
        mask = 0
        for w in range(n_words):
            mask |= int(r[f"w{w}"]) << (62 * w)
        out.append((mask, int(r["cnt"])))
    return out


# --- the driver-side search (approximate_evidence_inverter.h) -------------------


def _bits(x: int):
    while x:
        b = x & -x
        yield b.bit_length() - 1
        x ^= b


class _Trie:
    """DCCandidateTrie semantics: stored (bitset, cand) keyed by bitset;
    traversal order = lexicographic ascending bit sequences."""

    def __init__(self):
        self.store: dict[int, tuple[int, int]] = {}

    def add(self, dc: tuple[int, int]) -> None:
        self.store[dc[0]] = dc

    def is_empty(self) -> bool:
        return not self.store

    def get_and_remove_generalizations(self, superset: int) -> list[tuple[int, int]]:
        hit = [bs for bs in self.store if bs & ~superset == 0]
        hit.sort(key=lambda bs: tuple(_bits(bs)))
        return [self.store.pop(bs) for bs in hit]

    def contains_subset(self, dc: tuple[int, int]) -> bool:
        bs = dc[0]
        return any(s & ~bs == 0 for s in self.store)

    def for_each_sorted(self) -> list[tuple[int, int]]:
        return [self.store[bs] for bs in sorted(self.store, key=lambda b: tuple(_bits(b)))]


class _Inverter:
    """ApproxEvidenceInverter: coverage reorder, hit/unhit DFS with an
    explicit stack, approx-cover budget checks."""

    def __init__(self, n_predicates: int, evidence: list[tuple[int, int]],
                 mutex_map: list[int], threshold: float):
        self.n = n_predicates
        total = sum(c for _, c in evidence)
        self.target = int(math.ceil((1 - threshold) * total))
        # PredicateOrganizer: stable sort by coverage (distinct evidences) asc
        coverage = [0] * n_predicates
        for mask, _ in evidence:
            for i in _bits(mask):
                coverage[i] += 1
        self.indexes = sorted(range(n_predicates), key=lambda i: coverage[i])
        self.evidences = [
            (self._transform(mask), cnt) for mask, cnt in evidence
        ]
        self.mutex = [0] * n_predicates
        for i in range(n_predicates):
            self.mutex[self._transform_idx(i)] = self._transform(mutex_map[i])
        self.approx_covers = _Trie()

    def _transform(self, mask: int) -> int:
        out = 0
        for new_i, orig in enumerate(self.indexes):
            if (mask >> orig) & 1:
                out |= 1 << new_i
        return out

    def _transform_idx(self, orig: int) -> int:
        return self.indexes.index(orig)

    def retransform(self, mask: int) -> int:
        out = 0
        for i in _bits(mask):
            out |= 1 << self.indexes[i]
        return out

    def invert(self) -> list[int]:
        if self.target == 0:
            return []
        # sort by count desc; tie-break on the transformed bitset for
        # determinism (the reference's unstable sort leaves ties arbitrary;
        # the cover search result is order-independent)
        self.evidences.sort(key=lambda e: (-e[1], e[0]))
        full_mask = (1 << self.n) - 1
        nodes: list = []
        init = _Trie()
        init.add((0, full_mask))
        self._walk(0, full_mask, init, self.target, nodes)
        while nodes:
            e, addable, trie, invalid, target = nodes.pop()
            if e >= len(self.evidences) or addable == 0:
                continue
            target = self._hit(e, addable, trie, invalid, target)
            if target > 0:
                self._walk(e + 1, addable, trie, target, nodes)
        return [self.retransform(bs) for bs, _ in self.approx_covers.for_each_sorted()]

    def _walk(self, e: int, addable: int, trie: _Trie, target: int, nodes: list):
        evidences = self.evidences
        while e < len(evidences) and not trie.is_empty():
            evi = evidences[e][0]
            unhit = trie.get_and_remove_generalizations(evi)
            nodes.append((e, addable, trie, unhit, target))
            if not unhit:
                return
            addable &= evi
            if addable == 0:
                return
            max_can_hit = sum(
                cnt for mask, cnt in evidences[e + 1 :] if addable & ~mask != 0
            )
            if max_can_hit < target:
                return
            new_trie = _Trie()
            for bs, cand in unhit:
                unhit_cand = cand & evi
                if unhit_cand:
                    new_trie.add((bs, unhit_cand))
                elif not self.approx_covers.contains_subset((bs, cand)) and \
                        self._is_approx_cover(bs, e + 1, target):
                    self.approx_covers.add((bs, cand))
            if new_trie.is_empty():
                return
            e += 1
            trie = new_trie

    def _hit(self, e: int, addable: int, trie: _Trie,
             invalid: list[tuple[int, int]], target: int) -> int:
        evi, cnt = self.evidences[e]
        if addable & ~evi == 0:
            return target
        target -= cnt
        if target <= 0:
            for dc in trie.for_each_sorted():
                self.approx_covers.add(dc)
            for bs, cand in invalid:
                for i in _bits(cand & ~evi):
                    valid = (bs | (1 << i), 0)
                    if not self.approx_covers.contains_subset(valid):
                        self.approx_covers.add(valid)
        else:
            for bs, cand in invalid:
                for i in _bits(cand & ~evi):
                    vbs = bs | (1 << i)
                    vcand = cand & ~self.mutex[i]
                    valid = (vbs, vcand)
                    if not trie.contains_subset(valid) and \
                            not self.approx_covers.contains_subset(valid):
                        if vcand:
                            trie.add(valid)
                        elif self._is_approx_cover(vbs, e + 1, target):
                            self.approx_covers.add(valid)
        return target

    def _is_approx_cover(self, bs: int, e: int, target: int) -> bool:
        if target <= 0:
            return True
        for mask, cnt in self.evidences[e:]:
            if bs & ~mask == 0:
                continue
            target -= cnt
            if target <= 0:
                return True
        return False


# --- closure + minimisation (closure.h, denial_constraint_set.h) ---------------


class _Closure:
    def __init__(self, start: set[Pred]):
        self.closure: set[Pred] = set(start)
        self.grouped: dict[str, list[Pred]] = {}
        self.start = start

    def construct(self) -> bool:
        initial: set[Pred] = set()
        for p in self.start:
            initial.update(_implications(p))
            initial.update(_implications(_symmetric(p)))
        if not self._add_all(initial):
            return False
        added = True
        while added:
            additions: set[Pred] = set()
            for p in self.closure:
                additions.update(_implications(p))
                additions.update(_implications(_symmetric(p)))
            for op, preds in list(self.grouped.items()):
                for op_trans in _TRANSITIVES[op]:
                    trans = self.grouped.get(op_trans)
                    if not trans:
                        continue
                    for p1 in preds:
                        for p2 in trans:
                            if p1 == p2:
                                continue
                            if (p1.rt, p1.rc) == (p2.lt, p2.lc):
                                additions.add(Pred(op, p1.lt, p1.lc, p2.rt, p2.rc))
                            if (p2.rt, p2.rc) == (p1.lt, p1.lc):
                                additions.add(Pred(op, p2.lt, p2.lc, p1.rt, p1.rc))
            for p in self.grouped.get("!=", []):
                le = Pred("<=", p.lt, p.lc, p.rt, p.rc)
                ge = Pred(">=", p.lt, p.lc, p.rt, p.rc)
                if le in self.closure:
                    additions.add(Pred("<", p.lt, p.lc, p.rt, p.rc))
                if ge in self.closure:
                    additions.add(Pred(">", p.lt, p.lc, p.rt, p.rc))
            for p in self.grouped.get("<=", []):
                if Pred(">=", p.lt, p.lc, p.rt, p.rc) in self.closure:
                    additions.add(Pred("==", p.lt, p.lc, p.rt, p.rc))
            before = len(self.closure)
            if not self._add_all(additions):
                return False
            added = len(self.closure) > before
        return True

    def _add_all(self, preds) -> bool:
        for p in preds:
            if p not in self.closure:
                self.closure.add(p)
                if _inverse(p) in self.closure:
                    return False
                self.grouped.setdefault(p.op, []).append(p)
        return True


def _java_compare_bitsets(a: int, b: int) -> int:
    """CompareBitsets: first differing bit index, set bit is greater."""
    diff = a ^ b
    if diff == 0:
        return 0
    low = diff & -diff
    return 1 if a & low else -1


def _minimize(raw_dcs: list[set[Pred]], provider: _Provider) -> list[set[Pred]]:
    """DenialConstraintSet::Add + Minimize: DCEqual/symmetric dedup,
    closure-keyed minimal candidates, sorted subset filtering."""

    def contained_in(ps: set[Pred], other: set[Pred]) -> bool:
        return all(p in other or _symmetric(p) in other for p in ps)

    def dc_equal(a: set[Pred], b: set[Pred]) -> bool:
        if len(a) != len(b):
            return False
        if contained_in(a, b):
            return True
        a_inv = {_inv_ts(p) for p in a}
        if a_inv and contained_in(a_inv, b):
            return True
        b_inv = {_inv_ts(p) for p in b}
        return bool(b_inv) and contained_in(a, b_inv)

    constraints: list[set[Pred]] = []
    for dc in raw_dcs:
        if not any(dc_equal(dc, c) for c in constraints):
            constraints.append(dc)

    def bitset_of(ps: set[Pred]) -> int:
        out = 0
        for p in ps:
            out |= 1 << provider.get_index(p)
        return out

    closure_map: dict[int, tuple[set[Pred], int]] = {}
    closure_sets: dict[int, int] = {}
    for dc in constraints:
        cl = _Closure(dc)
        if not cl.construct():
            continue
        cl_bits = bitset_of(cl.closure)
        cand_bits = bitset_of(dc)
        prior = closure_map.get(cl_bits)
        if prior is None or _cand_le((len(dc), cand_bits), (len(prior[0]), prior[1])):
            closure_map[cl_bits] = (dc, cand_bits)
            closure_sets[cl_bits] = len(cl.closure)

    items = list(closure_map.items())

    def cmp(x, y) -> int:
        (xb, (xdc, xbits)), (yb, (ydc, ybits)) = x, y
        if closure_sets[xb] != closure_sets[yb]:
            return -1 if closure_sets[xb] < closure_sets[yb] else 1
        if len(xdc) != len(ydc):
            return -1 if len(xdc) < len(ydc) else 1
        c = _java_compare_bitsets(xbits, ybits)
        if c:
            return c
        return _java_compare_bitsets(xb, yb)

    items.sort(key=cmp_to_key(cmp))

    inserted: list[int] = []

    def tree_contains_subset(bs: int) -> bool:
        return any(s & ~bs == 0 for s in inserted)

    result = []
    for cl_bits, (dc, cand_bits) in items:
        if tree_contains_subset(cl_bits):
            continue
        inv = {_inv_ts(p) for p in dc}
        if inv:
            inv_cl = _Closure(inv)
            if not inv_cl.construct():
                continue
            if tree_contains_subset(bitset_of(inv_cl.closure)):
                continue
        result.append(dc)
        inserted.append(cand_bits)
        if inv:
            inserted.append(bitset_of(inv))
    return result


def _cand_le(a: tuple[int, int], b: tuple[int, int]) -> bool:
    """MinimalDCCandidate::ShouldReplace: (pred count, bitset) <=."""
    if a[0] != b[0]:
        return a[0] < b[0]
    return _java_compare_bitsets(a[1], b[1]) <= 0


# --- the miner -------------------------------------------------------------------


def mine_dcs(
    df: DataFrame,
    columns: list[str] | None = None,
    evidence_threshold: float = 0.01,
    allow_cross_columns: bool = True,
    minimum_shared_value: float = 0.3,
    comparable_threshold: float = 0.1,
    max_combos: int = 20_000,
    max_evidence: int = 200_000,
) -> list[DCResult]:
    """FastADC denial-constraint discovery (fastadc.cpp ExecuteInternal).

    Returns DCResult rows sorted by their string form (the reference's own
    test normalisation). ``evidence_threshold`` is the approximation
    budget: mined DCs may be violated by at most threshold * |ordered tuple
    pairs| pairs."""
    columns = list(columns or df.columns)
    space, provider = build_predicate_space(
        df, columns, allow_cross_columns, minimum_shared_value, comparable_threshold
    )
    if not space:
        return []
    evidence = build_evidence(df, columns, space, max_combos, max_evidence)
    n = len(space)
    mutex = [0] * n
    for i, p1 in enumerate(space):
        for j, p2 in enumerate(space):
            if (p1.lt, p1.lc, p1.rt, p1.rc) == (p2.lt, p2.lc, p2.rt, p2.rc):
                mutex[i] |= 1 << j
    inverter = _Inverter(n, evidence, mutex, evidence_threshold)
    raw = inverter.invert()
    raw_sets = [
        {provider.objects[i] for i in _bits(mask)} for mask in raw
    ]
    minimal = _minimize(raw_sets, provider)
    names = columns
    out = []
    for dc in minimal:
        idxs = sorted(provider.get_index(p) for p in dc)
        out.append(DCResult([provider.objects[i].to_string(names) for i in idxs]))
    out.sort(key=lambda d: d.to_string())
    return out
