"""PFDTane: probabilistic-FD discovery (the reference's PFDTane miner).

Reference semantics (fd/tane/pfdtane.cpp, tane_common.cpp): the classic TANE
lattice walk -- per-level vertices carrying RHS-candidate bitsets inherited
by intersection from all |X| parents, key-candidate UCC pruning that
registers sibling-approved outer-RHS FDs for exact keys, zero-ary FDs at
level 1 -- but with the per-tuple / per-value PFD error (pfdtane.cpp:45-81)
deciding X -> A:

  per_tuple:  1 - (sum over stripped X-groups of max rhs-value count
                   + singleton-group rows) / n
  per_value:  1 - (sum over stripped X-groups of max_count/group_size
                   + singleton-group rows) / (#groups + singleton rows)

The per-value measure is NOT monotone in the LHS, so the mined set is
defined by the walk's candidate propagation, not by subset minimality --
this module replays the walk's bookkeeping exactly (including the
ComputeDependencies candidate SNAPSHOT at tane_common.cpp:103-110 and the
vertex-skip conditions of lattice_level.cpp GenerateNextLevel).

Spark-first design -- lattice bookkeeping is driver-side set algebra; every
data-touching quantity in a level rides a constant number of jobs:

  1. Columns rank-encode once through od_discovery's range-partitioned
     distributed dense rank (equality-preserving, normalises every type to
     int so all candidates share one frame).
  2. One batched GROUPING SETS pass per level computes the value-combination
     counts of every vertex; a per-set aggregation of that cached frame
     yields every UCC error (equal pairs) and level-1 modal count (zero-ary
     errors) in one job.
  3. ALL FD candidates of the level ride ONE job: each cached combo row
     explodes into per-candidate (cid, X-key, count) structs; regrouping by
     (cid, X-key) then cid yields the stripped-partition sums the PFD
     formulas need. Driver-side floats only ever see per-candidate
     aggregates, never rows.

Scale: vertices per level are bounded by C(p, k) (p = table width, tens at
most -- pass max_lhs to cap the walk); everything downstream of the
grouping-sets pass operates on aggregated combos, not raw rows.
"""

from __future__ import annotations

from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_validator.od_discovery import (
    _encode_ranks,
    _explode_candidates,
    _level_frame,
)


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


def _level_stats(lvl: DataFrame, contexts: list, sid_of: dict) -> dict:
    """Per-vertex (equal_pairs, max_count) from the cached level frame --
    UCC errors for key pruning plus level-1 modal counts for zero-ary FDs,
    one job for the whole level."""
    rows = (
        lvl.groupBy("__sid")
        .agg(
            F.sum(F.col("__cnt") * (F.col("__cnt") - 1)).alias("p"),
            F.max("__cnt").alias("mx"),
        )
        .collect()
    )
    by_sid = {r["__sid"]: (int(r["p"]), int(r["mx"])) for r in rows}
    return {ctx: by_sid[sid_of[ctx]] for ctx in contexts}


def _fd_errors(
    lvl: DataFrame, cands: list, sid_of: dict, measure: str, n_rows: int
) -> dict:
    """Batched PFD errors for every (vertex, rhs) candidate of a level
    (pfdtane.cpp:45-81 with stripped-PLI semantics): regroup the vertex's
    XA combos by the X-projection, then fold group sums per candidate."""
    if not cands:
        return {}
    entries = []
    for cid, (ctx, a) in enumerate(cands):
        x_cols = [F.col(f"e{i}") for i in sorted(ctx - {a})]
        entries.append(
            F.when(
                F.col("__sid") == sid_of[ctx],
                F.struct(
                    F.lit(cid).alias("cid"),
                    F.array(*x_cols).alias("xkey"),
                    F.col("__cnt").alias("cnt"),
                ),
            )
        )
    ex = _explode_candidates(lvl, entries)
    per = ex.groupBy("cid", "xkey").agg(
        F.sum("cnt").alias("cx"), F.max("cnt").alias("mx")
    )
    big = F.col("cx") >= 2
    rows = (
        per.groupBy("cid")
        .agg(
            F.sum(F.when(big, F.col("mx"))).alias("s_mx"),
            F.sum(F.when(big, F.col("mx") / F.col("cx"))).alias("s_frac"),
            F.count(F.when(F.col("cx") == 1, F.lit(1))).alias("uniq"),
            F.count(F.when(big, F.lit(1))).alias("ngrp"),
        )
        .collect()
    )
    out = {}
    for r in rows:
        uniq, ngrp = int(r["uniq"]), int(r["ngrp"])
        if measure == "per_tuple":
            s = float(r["s_mx"] or 0)
            err = 1.0 - (s + uniq) / n_rows
        else:
            s = float(r["s_frac"] or 0.0)
            err = 1.0 - (s + uniq) / (ngrp + uniq)
        out[cands[r["cid"]]] = err
    return out


#: TANE AFD-measure modes (fd/tane/enums.h AfdErrorMeasure + the classic g1
#: default): error = 1 - measure for pdep/tau/mu_plus/rho (tane.cpp:26-50).
_AFD_MEASURES = ("g1", "pdep", "tau", "mu_plus", "rho")


def _afd_errors(
    lvl: DataFrame, cands: list, sid_of: dict, measure: str, n_rows: int,
    pdep_self: dict,
) -> dict:
    """Batched TANE AFD-measure errors for every (vertex, rhs) candidate of
    a level (Tane::CalculateFdError, tane.cpp:26-50): error = 1 - measure
    with the measures of afd_metric_calculator.cpp:89-180 (pdep/tau/mu+)
    and afd_measures.cpp:105-125 (rho), all over PLIs WITH singletons, so
    every value combination counts as a group; 'g1' is the classic TANE
    error (afd_measures.cpp:11-16).  One job per level: regroup the
    vertex's XA combos by the X-projection, fold per-candidate aggregates.

    The exact-FD fast paths stay bitwise exact in binary64 (cx^2/cx sums to
    n, (1-ps)/(1-ps) divides to 1.0), so the walk's error==0 candidate
    restriction fires exactly as the reference's."""
    if not cands:
        return {}
    entries = []
    for cid, (ctx, a) in enumerate(cands):
        x_cols = [F.col(f"e{i}") for i in sorted(ctx - {a})]
        entries.append(
            F.when(
                F.col("__sid") == sid_of[ctx],
                F.struct(
                    F.lit(cid).alias("cid"),
                    F.array(*x_cols).alias("xkey"),
                    F.col("__cnt").alias("cnt"),
                ),
            )
        )
    ex = _explode_candidates(lvl, entries)
    per = ex.groupBy("cid", "xkey").agg(
        F.sum("cnt").alias("cx"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ssq"),
        F.sum(F.col("cnt") * (F.col("cnt") - F.lit(1))).alias("pxa"),
        F.count(F.lit(1)).alias("ncombo"),
    )
    rows = (
        per.groupBy("cid")
        .agg(
            F.sum(F.col("ssq") / F.col("cx")).alias("pdep_num"),
            F.count(F.lit(1)).alias("kx"),
            F.sum("ncombo").alias("dom_xa"),
            F.sum(F.col("cx") * (F.col("cx") - F.lit(1))).alias("px"),
            F.sum("pxa").alias("pxa"),
        )
        .collect()
    )
    n = n_rows
    out = {}
    for r in rows:
        _, a = cands[r["cid"]]
        kx, dom_xa = int(r["kx"]), int(r["dom_xa"])
        if measure == "g1":
            err = (int(r["px"]) - int(r["pxa"])) / (n * (n - 1))
        elif measure == "rho":
            # CalculateRhoMeasure: dom(X)/dom(XA), doms include singletons.
            err = 1.0 - kx / dom_xa
        else:
            pdep = float(r["pdep_num"]) / n
            if measure == "pdep":
                err = 1.0 - pdep
            else:
                # 1 - tau and 1 - mu+ in their algebraically-reduced forms
                # (1-pdep)/(1-ps)[*(n-1)/(n-kx)]: fewer double roundings, so
                # knife-edge thresholds land where the reference's
                # long-double accumulation does (e.g. the exact-3/10 tau of
                # inventory_afd.csv ProductName -> Price).
                ps = pdep_self[a]
                if measure == "tau":
                    err = 0.0 if ps == 1.0 else (1.0 - pdep) / (1.0 - ps)
                else:  # mu_plus: CalculateMuPlus guards, in order
                    if ps == 1.0 or kx == n:
                        err = 0.0
                    else:
                        err = min(
                            (1.0 - pdep) / (1.0 - ps) * (n - 1) / (n - kx),
                            1.0,
                        )
        out[cands[r["cid"]]] = err
    return out


def _generate_next_level(level: dict, p: int) -> dict:
    """LatticeLevel::GenerateNextLevel (lattice_level.cpp:25-114): children
    of prefix-sharing vertex pairs, RHS candidates intersected across ALL
    arity-1 parents, key/invalid flags folded; parent list order replays the
    reference (prefix columns ascending, then the two join parents)."""
    nxt: dict[frozenset, _Vertex] = {}
    blocks: dict[tuple, list] = defaultdict(list)
    for v in sorted(level.values(), key=lambda v: tuple(sorted(v.cols))):
        cols = sorted(v.cols)
        blocks[tuple(cols[:-1])].append((cols[-1], v))
    for members in blocks.values():
        members.sort()
        for i1, (a, v1) in enumerate(members):
            if not v1.rhs and not v1.key_candidate:
                continue
            for b, v2 in members[i1 + 1 :]:
                # lattice_level.cpp:57 intersects a candidate set with
                # itself; the effective test is v1.rhs empty -- replicated.
                if not v1.rhs and not v2.key_candidate:
                    continue
                child_cols = v1.cols | {b}
                rhs = v1.rhs & v2.rhs
                keyc = v1.key_candidate and v2.key_candidate
                inval = v1.invalid or v2.invalid
                parents: list[frozenset] = []
                ok = True
                for skip in sorted(child_cols)[:-2]:
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


def mine_pfds(
    df: DataFrame,
    columns: list[str] | None = None,
    max_error: float = 0.01,
    error_measure: str = "per_tuple",
    max_lhs: int | None = None,
    max_sets_per_job: int = 64,
) -> list[tuple[tuple[str, ...], str]]:
    """PFDTane probabilistic-FD discovery (pfdtane.cpp; goldens
    test_pfdtane.cpp). Returns (lhs_names, rhs_name) pairs in the
    reference's FdList order (arity, then lhs mask, then rhs index);
    zero-ary FDs carry an empty lhs tuple. ``error_measure`` is
    'per_tuple' or 'per_value' (PfdErrorMeasure, enums.h:8); ``max_error``
    doubles as the UCC budget for key pruning, exactly as the reference
    shares its single error option (tane_common.cpp:130).

    ``error_measure`` also accepts the TANE AFD measures 'g1', 'pdep',
    'tau', 'mu_plus', 'rho' (fd/tane/enums.h via tane.cpp:26-50) -- the
    same lattice walk with error = 1 - measure deciding X -> A and a
    zero-ary error of 1 for the non-g1 measures (tane.cpp:20-24); use the
    :func:`mine_afds_tane` alias for that reading."""
    if error_measure not in ("per_tuple", "per_value") + _AFD_MEASURES:
        raise ValueError(f"unknown error_measure {error_measure!r}")
    pfd_mode = error_measure in ("per_tuple", "per_value")
    columns = list(columns or df.columns)
    p = len(columns)
    if p >= 64:
        raise ValueError("PFDTane attribute sets are capped at 63 columns")
    enc, dicts = _encode_ranks(df, columns)
    enc = enc.persist()
    n = enc.count()
    for d in dicts:
        d.unpersist()
    error = max_error
    exact_mode = error == 0.0
    pair_denom = n * (n - 1)
    fds: list[tuple[frozenset, int]] = []

    def run_level(contexts: list):
        lvl, sid_of = _level_frame(enc, contexts, max_sets_per_job)
        return lvl.persist(), sid_of

    # --- level 1: zero-ary FDs + singleton key handling -------------------
    contexts = [frozenset({i}) for i in range(p)]
    lvl, sid_of = run_level(contexts)
    try:
        stats = _level_stats(lvl, contexts, sid_of)
    finally:
        lvl.unpersist()
    #: pdep_self per column from the level-1 group stats: sum(cnt^2) =
    #: sum(cnt*(cnt-1)) + n (afd_metric_calculator.cpp:89-101).
    pdep_self = {
        a: (stats[frozenset({a})][0] + n) / (n * n) for a in range(p)
    }
    level: dict[frozenset, _Vertex] = {}
    zeroary_rhs: set = set()
    for a in range(p):
        v = _Vertex(frozenset({a}))
        v.rhs = set(range(p))
        v.key_candidate = True
        if pfd_mode:
            e0 = 1.0 - stats[v.cols][1] / n
        elif error_measure == "g1":
            # CalculateZeroAryG1 (afd_measures.cpp:6-9)
            e0 = 1.0 - stats[v.cols][0] / pair_denom
        else:
            e0 = 1.0  # Tane::CalculateZeroAryFdError, tane.cpp:20-24
        if e0 <= error:
            zeroary_rhs.add(a)
            fds.append((frozenset(), a))
            v.rhs.discard(a)
            if e0 == 0.0:
                v.rhs = set()
        level[v.cols] = v
    for v in sorted(level.values(), key=lambda v: _mask(v.cols)):
        v.rhs -= zeroary_rhs
        u_err = stats[v.cols][0] / pair_denom
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

    # --- levels 2.. --------------------------------------------------------
    max_arity = p if max_lhs is None else max_lhs + 1
    arity = 2
    while arity <= max_arity:
        level = _generate_next_level(level, p)
        if not level:
            break
        contexts = sorted(level, key=_mask)
        lvl, sid_of = run_level(contexts)
        try:
            # ComputeDependencies: eligibility from a per-vertex snapshot
            # (tane_common.cpp:103-110), all errors batched in one job.
            cands = []
            snapshots = {}
            for v in level.values():
                if v.invalid:
                    continue
                snapshots[v.cols] = set(v.rhs)
                for lhs in v.parents:
                    (a,) = v.cols - lhs
                    if a in snapshots[v.cols]:
                        cands.append((v.cols, a))
            need_ucc = arity < max_arity and any(
                v.key_candidate for v in level.values()
            )
            # the error and UCC-stat jobs only read the shared cached level
            # frame, so they overlap (shared stages are deduped by the
            # DAGScheduler; cache fills are per-partition serialized)
            with ThreadPoolExecutor(max_workers=2) as ex:
                f_stats = (
                    ex.submit(_level_stats, lvl, contexts, sid_of)
                    if need_ucc
                    else None
                )
                errors = (
                    _fd_errors(lvl, cands, sid_of, error_measure, n)
                    if pfd_mode
                    else _afd_errors(
                        lvl, cands, sid_of, error_measure, n, pdep_self
                    )
                )
                stats = f_stats.result() if f_stats is not None else {}
        finally:
            lvl.unpersist()
        for v in sorted(level.values(), key=lambda v: _mask(v.cols)):
            if v.invalid:
                continue
            snapshot = snapshots[v.cols]
            for lhs in v.parents:
                (a,) = v.cols - lhs
                if a not in snapshot:
                    continue
                e = errors[(v.cols, a)]
                if e <= error:
                    fds.append((lhs, a))
                    v.rhs.discard(a)
                    if e == 0.0:
                        v.rhs &= lhs
        if arity == max_arity:
            break
        # Prune (tane_common.cpp:35-96)
        key_vertices = []
        for v in sorted(level.values(), key=lambda v: _mask(v.cols)):
            if v.key_candidate:
                u_err = stats[v.cols][0] / pair_denom
                if u_err <= error:
                    v.key_candidate = False
                    if u_err == 0.0:
                        for a in sorted(v.rhs):
                            if a in v.cols:
                                continue
                            if all(
                                (sib := level.get((v.cols - {c}) | {a}))
                                is not None
                                and a in sib.rhs
                                for c in sorted(v.cols)
                            ):
                                fds.append((v.cols, a))
                        key_vertices.append(v)
            if exact_mode:
                for kv in key_vertices:
                    kv.rhs &= kv.cols
                    kv.invalid = True
        arity += 1

    enc.unpersist()
    ordered = sorted(fds, key=lambda t: (len(t[0]), _mask(t[0]), t[1]))
    return [
        (tuple(columns[i] for i in sorted(lhs)), columns[r])
        for lhs, r in ordered
    ]


def mine_afds_tane(
    df: DataFrame,
    columns: list[str] | None = None,
    max_error: float = 0.05,
    error_measure: str = "pdep",
    max_lhs: int | None = None,
    max_sets_per_job: int = 64,
) -> list[tuple[tuple[str, ...], str]]:
    """TANE approximate-FD mining under an AFD error measure (the
    reference's ``Tane`` algorithm with afd_error_measure, tane.cpp:13-50;
    goldens test_tane_afd_measures.cpp AfdMeasuresTaneMiningSuite): the
    TaneCommon lattice walk registering X -> A whenever
    1 - measure(X -> A) <= max_error, measure in {'g1', 'pdep', 'tau',
    'mu_plus', 'rho'}.  Same contract as :func:`mine_pfds`."""
    if error_measure not in _AFD_MEASURES:
        raise ValueError(f"unknown error_measure {error_measure!r}")
    return mine_pfds(
        df, columns, max_error, error_measure, max_lhs, max_sets_per_job
    )
