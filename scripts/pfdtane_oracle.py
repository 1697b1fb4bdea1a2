"""Driver-side TANE / PFDTane replica (pure python) -- the independent
oracle for pfd_discovery.mine_pfds. Replicates the reference's lattice walk
bit-for-bit (fd/tane/tane_common.cpp ExecuteInternal / ComputeDependencies /
Prune, lattice_level.cpp GenerateNextLevel -- including the vertex-skip
condition at lattice_level.cpp:57 that intersects a candidate set with
itself) with every error computed directly from raw rows:

  * per-tuple / per-value PFD error (pfdtane.cpp:45-81): stripped-partition
    semantics -- x-groups of size 1 count as `unique_rows`, every larger
    group contributes max (or max/size) of its most frequent rhs value.
  * zero-ary PFD error (pfdtane.cpp:36-43): 1 - modal_count/n.
  * UCC error (tane_common.cpp:24-27): equal pairs / total pairs.

Also holds the reference's result fingerprint: FDsToJson
(fd_algorithm.h:83-99 -- JSON strings sorted lexicographically) hashed with
Fletcher16 mod 255 (fd_algorithm.cpp:47-56), so the golden hashes in
test_pfdtane.cpp pin the replica and the Spark miner end to end.
"""

from __future__ import annotations

import csv
from collections import Counter, defaultdict


def load_csv(path: str, has_header: bool) -> list[list[str]]:
    """Raw string cells (PLI equality on these fixtures coincides with the
    reference's typed equality: no NULLs, no cross-format numerics)."""
    with open(path, newline="") as fh:
        rows = list(csv.reader(fh))
    return rows[1:] if has_header else rows


def fds_to_json(fds) -> str:
    """FDAlgorithm::FDsToJson: each FD as {"lhs": [i,..], "rhs": k}, the
    strings sorted lexicographically."""
    strs = sorted(
        '{"lhs": [' + ",".join(str(i) for i in sorted(lhs)) + '], "rhs": '
        + str(rhs) + "}"
        for lhs, rhs in fds
    )
    return '{"fds": [' + ",".join(strs) + "]}"


def fletcher16(text: str) -> int:
    s1 = s2 = 0
    for ch in text:
        s1 = (s1 + ord(ch)) % 255
        s2 = (s2 + s1) % 255
    return (s2 << 8) | s1


def result_hash(fds) -> int:
    return fletcher16(fds_to_json(fds))


# ---------------------------------------------------------------------------
# Error measures, straight from the definitions
# ---------------------------------------------------------------------------


def _groups(rows, cols):
    g = defaultdict(list)
    for r in rows:
        g[tuple(r[i] for i in sorted(cols))].append(r)
    return g.values()


def pfd_error(rows, lhs, rhs: int, measure: str) -> float:
    """CalculatePFDError over raw rows with stripped-PLI semantics."""
    n = len(rows)
    s = 0.0
    uniq = 0
    ngrp = 0
    for grp in _groups(rows, lhs):
        if len(grp) == 1:
            uniq += 1
            continue
        ngrp += 1
        mx = max(Counter(r[rhs] for r in grp).values())
        s += mx if measure == "per_tuple" else mx / len(grp)
    denom = n if measure == "per_tuple" else ngrp + uniq
    return 1.0 - (s + uniq) / denom


def zero_ary_pfd_error(rows, rhs: int) -> float:
    n = len(rows)
    mx = max(Counter(r[rhs] for r in rows).values())
    return 1.0 - mx / n


def pdep_self(rows, rhs: int) -> float:
    """AFDMetricCalculator::CalculatePdepSelf (PLIs with singletons)."""
    n = len(rows)
    c = Counter(r[rhs] for r in rows)
    return sum(v * v for v in c.values()) / (n * n)


def afd_error(rows, lhs, rhs: int, measure: str) -> float:
    """Tane::CalculateFdError: 1 - measure for pdep/tau/mu_plus/rho
    (afd_metric_calculator.cpp:89-180, afd_measures.cpp:105-125), classic
    g1 otherwise -- all groups count, singletons included."""
    n = len(rows)
    groups = list(_groups(rows, lhs))
    kx = len(groups)
    rhs_counters = [Counter(r[rhs] for r in g) for g in groups]
    if measure == "g1":
        nep_x = sum(len(g) * (len(g) - 1) for g in groups)
        nep_xa = sum(
            v * (v - 1) for c in rhs_counters for v in c.values()
        )
        return (nep_x - nep_xa) / (n * (n - 1))
    if measure == "rho":
        dom_xa = sum(len(c) for c in rhs_counters)
        return 1.0 - kx / dom_xa
    pdep = (
        sum(
            sum(v * v for v in c.values()) / len(g)
            for g, c in zip(groups, rhs_counters)
        )
        / n
    )
    if measure == "pdep":
        return 1.0 - pdep
    # errors in reduced form (1-pdep)/(1-ps)[*(n-1)/(n-kx)] -- fewer double
    # roundings, matching the reference's long-double path on knife edges
    ps = pdep_self(rows, rhs)
    if measure == "tau":
        return 0.0 if ps == 1.0 else (1.0 - pdep) / (1.0 - ps)
    if ps == 1.0 or kx == n:  # mu_plus guards, CalculateMuPlus order
        return 0.0
    return min((1.0 - pdep) / (1.0 - ps) * (n - 1) / (n - kx), 1.0)


def zero_ary_afd_error(rows, rhs: int, measure: str) -> float:
    """Tane::CalculateZeroAryFdError (tane.cpp:20-24): g1's zero-ary error,
    constant 1 for the AFD measures."""
    if measure != "g1":
        return 1.0
    n = len(rows)
    nep = sum(
        v * (v - 1) for v in Counter(r[rhs] for r in rows).values()
    )
    return 1.0 - nep / (n * (n - 1))


def ucc_error(rows, cols) -> float:
    n = len(rows)
    pairs = sum(
        len(g) * (len(g) - 1) for g in _groups(rows, cols)
    )
    return pairs / (n * (n - 1))


# ---------------------------------------------------------------------------
# The lattice walk (tane_common.cpp), parameterized by error callables so the
# same bookkeeping serves PFDTane replication and future measure variants.
# ---------------------------------------------------------------------------


class _Vertex:
    __slots__ = ("cols", "rhs", "key_candidate", "invalid", "parents")

    def __init__(self, cols: frozenset):
        self.cols = cols
        self.rhs: set = set()
        self.key_candidate = False
        self.invalid = False
        self.parents: list[frozenset] = []


def _mask(cols) -> int:
    return sum(1 << i for i in cols)


def tane_walk(
    p: int,
    n: int,
    error: float,
    fd_error,
    zero_ary_error,
    ucc_err,
    max_lhs: int | None = None,
) -> list[tuple[frozenset, int]]:
    """TaneCommon::ExecuteInternal with injected error callables:
    ``fd_error(lhs_frozenset, rhs_index)``, ``zero_ary_error(rhs_index)``,
    ``ucc_err(cols_frozenset)``. Returns (lhs, rhs) pairs in registration
    order (callers sort/serialize)."""
    fds: list[tuple[frozenset, int]] = []
    exact_mode = error == 0.0
    all_cols = set(range(p))

    # level 1 init + zero-ary FDs (tane_common.cpp:152-180)
    level: dict[frozenset, _Vertex] = {}
    zeroary_rhs: set = set()
    for a in range(p):
        v = _Vertex(frozenset({a}))
        v.rhs = set(all_cols)
        v.key_candidate = True
        e0 = zero_ary_error(a)
        if e0 <= error:
            zeroary_rhs.add(a)
            fds.append((frozenset(), a))
            v.rhs.discard(a)
            if e0 == 0.0:
                v.rhs = set()
        level[v.cols] = v
    # level-1 candidate cleanup + key handling (tane_common.cpp:182-207)
    for v in sorted(level.values(), key=lambda v: _mask(v.cols)):
        v.rhs -= zeroary_rhs
        u_err = ucc_err(v.cols)
        if u_err <= error:
            v.key_candidate = False
            if u_err == 0.0 and max_lhs != 0:
                (a,) = v.cols
                for r in sorted(v.rhs):
                    if r != a:
                        fds.append((v.cols, r))
                v.rhs &= v.cols
                if exact_mode:
                    v.invalid = True

    max_arity = p if max_lhs is None else max_lhs + 1
    arity = 2
    while arity <= max_arity:
        level = _generate_next_level(level, p)
        if not level:
            break
        _compute_dependencies(level, error, fd_error, fds)
        if arity == max_arity:
            break
        _prune(level, error, ucc_err, exact_mode, fds)
        arity += 1
    return fds


def _generate_next_level(level: dict, p: int) -> dict:
    """LatticeLevel::GenerateNextLevel, prefix-join formulation. Parent order
    in ``parents`` replays the reference: the arity-1 proper subsets missing
    each of the child's first arity-1 columns ascending, then vertex1
    (missing the largest column), then vertex2 (missing the second-largest)."""
    nxt: dict[frozenset, _Vertex] = {}
    verts = sorted(level.values(), key=lambda v: tuple(sorted(v.cols)))
    blocks: dict[tuple, list] = defaultdict(list)
    for v in verts:
        cols = sorted(v.cols)
        blocks[tuple(cols[:-1])].append((cols[-1], v))
    for prefix, members in blocks.items():
        members.sort()
        for i1 in range(len(members)):
            a, v1 = members[i1]
            if not v1.rhs and not v1.key_candidate:
                continue
            for i2 in range(i1 + 1, len(members)):
                b, v2 = members[i2]
                # lattice_level.cpp:57 intersects a set with itself -- the
                # effective condition is v1.rhs empty (and v2 not a key
                # candidate); replicated verbatim.
                if not v1.rhs and not v2.key_candidate:
                    continue
                child_cols = v1.cols | {b}
                rhs = v1.rhs & v2.rhs
                keyc = v1.key_candidate and v2.key_candidate
                inval = v1.invalid or v2.invalid
                parents: list[frozenset] = []
                ok = True
                child_sorted = sorted(child_cols)
                for skip in child_sorted[:-2]:
                    pv = level.get(child_cols - {skip})
                    if pv is None:
                        ok = False
                        break
                    rhs &= pv.rhs
                    if not rhs:
                        ok = False
                        break
                    parents.append(pv.cols)
                    keyc = keyc and pv.key_candidate
                    inval = inval or pv.invalid
                    if not keyc and not rhs:
                        ok = False
                        break
                if not ok:
                    continue
                child = _Vertex(frozenset(child_cols))
                child.rhs = rhs
                child.key_candidate = keyc
                child.invalid = inval
                child.parents = parents + [v1.cols, v2.cols]
                nxt[child.cols] = child
    return nxt


def _compute_dependencies(level: dict, error: float, fd_error, fds) -> None:
    """TaneCommon::ComputeDependencies: the A-eligibility check reads a
    SNAPSHOT of the vertex's candidates taken before its parent loop, while
    removals hit the live set (tane_common.cpp:97-127)."""
    for v in sorted(level.values(), key=lambda v: _mask(v.cols)):
        if v.invalid:
            continue
        snapshot = set(v.rhs)
        for lhs in v.parents:
            (a,) = v.cols - lhs
            if a not in snapshot:
                continue
            e = fd_error(lhs, a)
            if e <= error:
                fds.append((lhs, a))
                v.rhs.discard(a)
                if e == 0.0:
                    v.rhs &= lhs


def _prune(level: dict, error: float, ucc_err, exact_mode: bool, fds) -> None:
    """TaneCommon::Prune: exact keys register sibling-approved outer-rhs FDs;
    the exact-mode invalidation block runs inside the vertex loop (as in the
    reference), which for error > 0 never fires."""
    key_vertices = []
    for v in sorted(level.values(), key=lambda v: _mask(v.cols)):
        if v.key_candidate:
            u_err = ucc_err(v.cols)
            if u_err <= error:
                v.key_candidate = False
                if u_err == 0.0:
                    for a in sorted(v.rhs):
                        if a in v.cols:
                            continue
                        approved = True
                        for c in sorted(v.cols):
                            sib = level.get((v.cols - {c}) | {a})
                            if sib is None or a not in sib.rhs:
                                approved = False
                                break
                        if approved:
                            fds.append((v.cols, a))
                    key_vertices.append(v)
        if exact_mode:
            for kv in key_vertices:
                kv.rhs &= kv.cols
                kv.invalid = True


def brute_force_pfdtane(
    rows: list[list[str]],
    error: float,
    measure: str = "per_tuple",
    max_lhs: int | None = None,
) -> list[tuple[frozenset, int]]:
    """PFDTane::ExecuteInternal replica over raw rows."""
    p = len(rows[0])
    return tane_walk(
        p,
        len(rows),
        error,
        lambda lhs, a: pfd_error(rows, lhs, a, measure),
        lambda a: zero_ary_pfd_error(rows, a),
        lambda cols: ucc_error(rows, cols),
        max_lhs=max_lhs,
    )


def brute_force_tane_afd(
    rows: list[list[str]],
    error: float,
    measure: str = "pdep",
    max_lhs: int | None = None,
) -> list[tuple[frozenset, int]]:
    """Tane::ExecuteInternal replica with an AFD error measure
    (test_tane_afd_measures.cpp AfdMeasuresTaneMiningSuite)."""
    p = len(rows[0])
    return tane_walk(
        p,
        len(rows),
        error,
        lambda lhs, a: afd_error(rows, lhs, a, measure),
        lambda a: zero_ary_afd_error(rows, a, measure),
        lambda cols: ucc_error(rows, cols),
        max_lhs=max_lhs,
    )
