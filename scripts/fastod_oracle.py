"""Driver-side brute-force FASTOD replica (pandas only) -- the independent
oracle for od_discovery.mine_set_ods. Same lattice bookkeeping, but every
Split/Swap check and removal count is computed directly from the definition
on raw rows (no grouping-sets, no windows, no Spark). Used by the golden
tests to cross-check the reference hashes and by the property-law tests.

Also holds the reference-CSV loader: per-value typing + the FASTOD mixed
comparator (type_util.cpp:7-27, mixed_type.h ValueToString semantics), so the
reference's test CSVs can be rank-encoded exactly as data_frame.cpp:125-172
does before either implementation runs.
"""

from __future__ import annotations

import csv
import re
from collections import defaultdict
from functools import cmp_to_key
from itertools import combinations, permutations

_INT_RE = re.compile(r"^[+-]?\d{1,19}$")
_BIGINT_RE = re.compile(r"^[+-]?\d{20,}$")
_DOUBLE_RE = re.compile(
    r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
    r"|^[+-]?(?i:inf|nan)$"
)


def _value_type(raw: str):
    """Per-value type id mirroring typed_column_data.h's checker order
    (Date skipped: no date fixtures are ported). Returns (tag, parsed)."""
    if raw == "NULL":
        return ("null", None)
    if raw == "":
        return ("empty", None)
    if _INT_RE.match(raw):
        return ("int", int(raw))
    if _BIGINT_RE.match(raw):
        return ("bigint", int(raw))
    if _DOUBLE_RE.match(raw):
        return ("double", float(raw))
    return ("string", raw)


def _to_string(tag, val) -> str:
    """MixedType::ValueToString -- std::to_string for numerics (fixed 6
    decimals for doubles), the raw string otherwise."""
    if tag == "double":
        return f"{val:.6f}"
    return str(val)


def _cmp_values(l, r) -> int:
    """CompareData (type_util.h:13-46): null/empty unordered -- equal to each
    other, LESS than every ordered value; same type id compares natively;
    different type ids compare their string forms."""
    ltag, lval = l
    rtag, rval = r
    l_un = ltag in ("null", "empty")
    r_un = rtag in ("null", "empty")
    if l_un and r_un:
        return 0
    if l_un:
        return -1
    if r_un:
        return 1
    if ltag == rtag:
        a, b = lval, rval
    else:
        a, b = _to_string(ltag, lval), _to_string(rtag, rval)
    return -1 if a < b else (1 if a > b else 0)


def load_reference_csv(path: str) -> list[list[int]]:
    """Parse a reference test CSV and rank-encode every column to ints with
    the FASTOD order (data_frame.cpp ConvertColumnDataToIntegers): sort the
    column's values with the typed comparator, assign dense ranks. Returns
    row-major int matrix."""
    with open(path, newline="") as fh:
        rows = list(csv.reader(fh))
    header, data = rows[0], rows[1:]
    p = len(header)
    cols = []
    for j in range(p):
        typed = [_value_type(r[j]) for r in data]
        uniq = []
        seen = []
        for t in typed:
            if not any(_cmp_values(t, u) == 0 for u in uniq):
                uniq.append(t)
        uniq.sort(key=cmp_to_key(_cmp_values))
        ranks = []
        for t in typed:
            for i, u in enumerate(uniq):
                if _cmp_values(t, u) == 0:
                    ranks.append(i)
                    break
        cols.append(ranks)
    return [[cols[j][i] for j in range(p)] for i in range(len(data))]


# ---------------------------------------------------------------------------
# Brute-force checks, straight from the definitions
# ---------------------------------------------------------------------------


def _groups(rows, ctx):
    g = defaultdict(list)
    for r in rows:
        g[tuple(r[i] for i in sorted(ctx))].append(r)
    return g.values()


def split_removals(rows, context, right) -> int:
    """Rows to delete so right is constant per context-group: everything but
    each group's modal right value."""
    total = 0
    for grp in _groups(rows, context):
        freq = defaultdict(int)
        for r in grp:
            freq[r[right]] += 1
        total += len(grp) - max(freq.values())
    return total


def swap_removals(rows, context, left, right, descending) -> int:
    """Rows to delete so no swap remains: per group, size minus the longest
    non-decreasing right-subsequence in (left asc-or-desc, right asc) order
    (complex_stripped_partition.cpp:191-242). O(m^2) DP -- oracle clarity
    over speed."""
    total = 0
    sign = -1 if descending else 1
    for grp in _groups(rows, context):
        seq = sorted((sign * r[left], r[right]) for r in grp)
        m = len(seq)
        best = [1] * m
        for i in range(m):
            for j in range(i):
                if seq[j][1] <= seq[i][1] and best[j] + 1 > best[i]:
                    best[i] = best[j] + 1
        total += m - (max(best) if best else 0)
    return total


def has_split(rows, context, right) -> bool:
    return any(
        len({r[right] for r in grp}) > 1 for grp in _groups(rows, context)
    )


def has_swap(rows, context, left, right, descending) -> bool:
    sign = -1 if descending else 1
    for grp in _groups(rows, context):
        for r1 in grp:
            for r2 in grp:
                if sign * r1[left] < sign * r2[left] and r1[right] > r2[right]:
                    return True
    return False


def brute_force_fastod(rows, p: int, error: float = 0.0):
    """The reference walk (fastod.cpp Discover) with per-candidate direct
    checks. Returns (simple, asc, desc) lists of context/attr tuples with
    contexts as frozensets."""
    n = len(rows)
    schema = frozenset(range(p))

    def valid_ofd(ctx_del_a, a):
        if error > 0:
            return split_removals(rows, ctx_del_a, a) <= error * n
        return not has_split(rows, ctx_del_a, a)

    def valid_swap(ctx_del_ab, a, b, desc):
        if error > 0:
            return swap_removals(rows, ctx_del_ab, a, b, desc) <= error * n
        return not has_swap(rows, ctx_del_ab, a, b, desc)

    cc = {frozenset(): schema}
    cs_asc = defaultdict(set)
    cs_desc = defaultdict(set)
    simple, asc, desc = [], [], []
    contexts = [frozenset({i}) for i in range(p)]
    level = 1
    while contexts:
        for ctx in contexts:
            new_cc = schema
            for a in ctx:
                new_cc = new_cc & cc[ctx - {a}]
            cc[ctx] = new_cc
        if level == 2:
            for i, j in permutations(range(p), 2):
                cs_asc[frozenset({i, j})].add((i, j))
                cs_desc[frozenset({i, j})].add((i, j))
        elif level > 2:
            for cs in (cs_desc, cs_asc):
                for ctx in contexts:
                    adds = set()
                    for attr in ctx:
                        for pair in cs[ctx - {attr}]:
                            a, b = pair
                            cdab = (ctx - {a}) - {b}
                            if all(pair in cs[ctx - {x}] for x in cdab):
                                adds.add(pair)
                    cs[ctx] |= adds
        for ctx in contexts:
            cur = cc[ctx]
            for a in sorted(ctx & cur):
                if valid_ofd(ctx - {a}, a):
                    simple.append((ctx - {a}, a))
                    cur = cur - {a}
                    if schema - ctx:
                        cur = cur & ctx
                    cc[ctx] = cur
            for cs, dflag, sink in (
                (cs_desc, True, desc),
                (cs_asc, False, asc),
            ):
                keep = set()
                for a, b in sorted(cs[ctx]):
                    if a in cc[ctx - {b}] and b in cc[ctx - {a}]:
                        if valid_swap((ctx - {a}) - {b}, a, b, dflag):
                            sink.append(((ctx - {a}) - {b}, a, b))
                        else:
                            keep.add((a, b))
                cs[ctx] = keep
        if level > 1:
            contexts = [
                c for c in contexts if cc[c] or cs_asc[c] or cs_desc[c]
            ]
        ctx_set = set(contexts)
        blocks = defaultdict(list)
        for ctx in contexts:
            for a in ctx:
                blocks[ctx - {a}].append(a)
        nxt = set()
        for prefix, attrs in blocks.items():
            if len(attrs) <= 1:
                continue
            for i, j in combinations(sorted(attrs), 2):
                cand = prefix | {i, j}
                if all((cand - {x}) in ctx_set for x in cand):
                    nxt.add(cand)
        contexts = sorted(nxt, key=lambda c: sum(1 << i for i in c))
        level += 1
    return simple, asc, desc
