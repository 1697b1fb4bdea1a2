"""Set-based order-dependency discovery (the reference's FASTOD miner).

Reference semantics (od/fastod/fastod.h:107-186, fastod.cpp:112-262): a
level-wise walk over attribute-set contexts with two candidate stores --
CC (per-context attributes still eligible as an OFD right side) and CS
(per-context attribute pairs still eligible as an order-compatibility
candidate). At each context X the walk emits

  * simple canonical ODs  ``X\\{a} : [] -> a``   (OFD: a constant within
    every (X\\{a})-group -- Split check, stripped_partition.cpp:122-137), and
  * ordered canonical ODs ``X\\{a,b} : a<= ~ b<=`` per direction (OC: no two
    rows in a (X\\{a,b})-group with a_i < a_j but b_i > b_j -- Swap check,
    stripped_partition.cpp:139-185),

then prunes supersets through the CC/CS rules (fastod.h AddCandidates /
CalculateODs, fastod.cpp ComputeODs).  With ``error > 0`` a candidate is
valid when its minimal removal set is small enough instead
(canonical_od.cpp:15-30: |removals| <= error * n); the split removal keeps
each group's most frequent right value and the swap removal keeps a longest
non-decreasing right-subsequence in (left, right) order
(complex_stripped_partition.cpp:191-296).

Spark-first design -- the lattice BOOKKEEPING is driver-side set algebra
(cheap: p < 64 attributes), while every DATA-touching check in a level is
batched into a constant number of jobs regardless of candidate count:

  1. Columns are rank-encoded once: each column joins against its ranked
     distinct values (order-preserving dense rank, NULLs first as one rank),
     mirroring the reference's integer encoding (data_frame.cpp:125-172) and
     normalising every type to int so all candidates share one frame.
  2. One GROUPING SETS aggregation per level (batched to bound the Expand
     width) computes the distinct value-combination counts of EVERY context
     in the level -- the same shared-shuffle idiom as discovery.py's
     ``_lattice_counts``.
  3. All OFD candidates of the level ride ONE job: each cached combo row
     explodes into per-candidate (cid, group-key, right-value, cnt) structs;
     two chained aggregations yield both the exact verdict (max combos per
     group == 1) and the approximate removal count (sum of group size minus
     modal count).
  4. All swap candidates ride ONE job: per-candidate (cid, group-key,
     left-rank, right-rank) structs (descending candidates negate the left
     rank), then min/max of right per left-rank and a running-max window
     per group -- a violation is exactly the reference's Swap. The approx
     removal count runs a weighted longest-non-decreasing-subsequence kernel
     per group via applyInPandas (Arrow-batched; groups are value COMBOS,
     already aggregated, so they are far smaller than the raw rows).

Scale notes: the encode step is p distinct+join passes; each dictionary is
ranked via range-partition + per-partition row_number + driver offset
stitch (no global single-partition window), so even a key-like column
encodes as a parallel sort. The per-level Expand width is capped by
``max_sets_per_job``; everything downstream of the grouping-sets pass
operates on aggregated combos, not raw rows.
"""

from __future__ import annotations

from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from functools import reduce
from itertools import combinations, permutations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MASK64 = (1 << 64) - 1


def combine_hashes(first: int, second: int) -> int:
    """The reference's 64-bit hash combiner (fastod/hashing/hashing.h:8-11),
    used to reproduce its golden result hashes bit-for-bit in tests."""
    wave = (second + 2654435769 + ((first << 6) & _MASK64) + (first >> 2)) & _MASK64
    return (first ^ wave) & _MASK64


def _combine_vec(hashes) -> int:
    return reduce(combine_hashes, hashes, 0)


def _mask(ctx) -> int:
    return sum(1 << i for i in ctx)


@dataclass
class FastodResult:
    """Discovery output mirroring Fastod's three result getters
    (fastod.h:191-197). Attribute indices refer to ``columns``."""

    columns: list[str]
    simple: list[tuple[frozenset, int]] = field(default_factory=list)
    asc: list[tuple[frozenset, int, int]] = field(default_factory=list)
    desc: list[tuple[frozenset, int, int]] = field(default_factory=list)
    n_rows: int = 0
    levels: int = 0

    def result_hash(self) -> int:
        """The reference test suite's result hash (test_fastod.cpp RunFastod):
        each result vector sorted by its operator< (canonical_od.cpp:75-125),
        hashed with CombineHashes, then the three vector hashes combined."""
        simple = sorted(self.simple, key=lambda t: (t[1], _mask(t[0])))
        asc = sorted(self.asc, key=lambda t: (t[1], t[2], _mask(t[0])))
        desc = sorted(self.desc, key=lambda t: (t[1], t[2], _mask(t[0])))
        h_simple = _combine_vec(
            combine_hashes(_mask(c), r) for c, r in simple
        )
        h_asc = _combine_vec(
            combine_hashes(_mask(c), combine_hashes(a, b)) for c, a, b in asc
        )
        h_desc = _combine_vec(
            combine_hashes(_mask(c), combine_hashes(a, b)) for c, a, b in desc
        )
        return _combine_vec([h_asc, h_desc, h_simple])

    def to_strings(self) -> list[str]:
        """Human-readable rows, one per OD, reference ToString flavour."""
        out = []
        for ctx, a, b in self.asc:
            out.append(self._fmt(ctx, f"{self.columns[a]}<= ~ {self.columns[b]}<="))
        for ctx, a, b in self.desc:
            out.append(self._fmt(ctx, f"{self.columns[a]}>= ~ {self.columns[b]}<="))
        for ctx, r in self.simple:
            out.append(self._fmt(ctx, f"[] -> {self.columns[r]}"))
        return sorted(out)

    def _fmt(self, ctx, rhs: str) -> str:
        names = ",".join(self.columns[i] for i in sorted(ctx))
        return f"{{{names}}} : {rhs}"


def _encode_ranks(
    df: DataFrame, columns: list[str], num_partitions: int | None = None
) -> tuple[DataFrame, list[DataFrame]]:
    """Order-preserving dense int rank per column (the reference's integer
    encoding, data_frame.cpp:125-172): distinct values ranked ascending with
    NULLs first (null==null, below every value -- type_util.cpp:7-10), joined
    back null-safely.  The rank is computed DISTRIBUTED, never through a
    global single-partition window: distincts are range-partitioned (nulls
    land in partition 0 under ascending order), ranked per partition, and
    stitched with driver-side offsets from a P-row count collect -- the same
    idiom as checks/sd.py's range stitch.  A key-like column whose distinct
    set equals the table therefore still rank-encodes as a parallel sort plus
    one shuffle equi-join, which AQE broadcasts whenever the dictionary is
    actually small.

    Returns (encoded frame, persisted dictionaries).  The dictionaries MUST
    stay cached until the caller has materialized the encoded frame: the
    range partitioner's sampled bounds -- and with them the pid -> offset
    map already folded into the rank expression -- are only pinned by the
    cache, not by the lineage."""
    enc = df.select(*[F.col(c).alias(f"__c{i}") for i, c in enumerate(columns)])
    n_part = num_partitions or enc.sparkSession.sparkContext.defaultParallelism

    def _build(i: int):
        # independent per column; submitted concurrently below so the p
        # count-collect round-trips overlap instead of serializing (the
        # collects, not the joins, dominate the encode wall at toy scale --
        # the joins stay lazy and run in the caller's one materializing job)
        dist = (
            enc.select(F.col(f"__c{i}").alias("__v"))
            .distinct()
            .repartitionByRange(n_part, F.col("__v").asc_nulls_first())
            .withColumn("__pid", F.spark_partition_id())
            .persist()
        )
        counts = dict(
            dist.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
        )
        offset, acc = F.lit(0), 0
        for pid in sorted(counts):
            offset = F.when(F.col("__pid") == pid, F.lit(acc)).otherwise(offset)
            acc += counts[pid]
        local = Window.partitionBy("__pid").orderBy(
            F.col("__v").asc_nulls_first()
        )
        ranked = dist.select(
            "__v", (F.row_number().over(local) + offset).alias(f"e{i}")
        )
        return ranked, dist

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(columns)))) as ex:
        built = list(ex.map(_build, range(len(columns))))
    out, dicts = enc, []
    for i, (ranked, dist) in enumerate(built):
        out = out.join(
            ranked, out[f"__c{i}"].eqNullSafe(ranked["__v"]), "left"
        ).drop("__v", f"__c{i}")
        dicts.append(dist)
    return out, dicts


def _level_frame(
    enc: DataFrame, contexts: list[frozenset], max_sets_per_job: int
) -> tuple[DataFrame, dict]:
    """One (batched) GROUPING SETS pass computing, for every context in the
    level, its distinct value-combination counts: rows (__sid, e*, __cnt).
    Columns absent from a row's grouping set are NULL; encoded ranks are
    never NULL themselves, so absence never collides with a data value."""
    sid_of = {ctx: i for i, ctx in enumerate(contexts)}
    frames = []
    for lo in range(0, len(contexts), max_sets_per_job):
        batch = contexts[lo : lo + max_sets_per_job]
        all_idx = sorted({i for ctx in batch for i in ctx})
        gd = enc.groupingSets(
            [[f"e{i}" for i in sorted(ctx)] for ctx in batch],
            *[F.col(f"e{i}") for i in all_idx],
        )
        lvl = gd.agg(
            F.count(F.lit(1)).alias("__cnt"), F.grouping_id().alias("__gid")
        )
        width = len(all_idx)
        gid_to_sid = {}
        for ctx in batch:
            gid = 0
            for pos, i in enumerate(all_idx):
                if i not in ctx:
                    gid |= 1 << (width - 1 - pos)
            gid_to_sid[gid] = sid_of[ctx]
        mapping = F.lit(None)
        for gid, sid in gid_to_sid.items():
            mapping = F.when(F.col("__gid") == gid, F.lit(sid)).otherwise(mapping)
        frames.append(lvl.withColumn("__sid", mapping).drop("__gid"))
    out = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )
    return out, sid_of


def _explode_candidates(lvl: DataFrame, entries: list) -> DataFrame:
    """Per-row conditional struct array -> filter nulls -> explode: turns the
    shared level frame into one normalized frame of per-candidate rows
    without a per-candidate union (one Generate, one pass over the cache)."""
    return lvl.select(
        F.explode(
            F.filter(F.array(*entries), lambda x: x.isNotNull())
        ).alias("s")
    ).select("s.*")


def _check_ofds(
    lvl: DataFrame, cands: list, sid_of: dict, error: float, n_rows: int
) -> dict:
    """Batched Split checks: for candidate (ctx, a) the partition key is
    ctx\\{a} and the right side is a. Exact validity: every group has ONE
    distinct a-rank (max combo rows per group == 1). Approximate: removals =
    sum over groups of (size - modal count) <= error * n
    (complex_stripped_partition.cpp:249-268)."""
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
        F.count(F.lit(1)).alias("nv"),
        (F.sum("cnt") - F.max("cnt")).alias("rm"),
    )
    rows = (
        per.groupBy("cid")
        .agg(F.max("nv").alias("maxv"), F.sum("rm").alias("rm"))
        .collect()
    )
    stats = {r["cid"]: (int(r["maxv"]), int(r["rm"])) for r in rows}
    out = {}
    for cid, cand in enumerate(cands):
        maxv, rm = stats.get(cid, (1, 0))
        out[cand] = rm <= error * n_rows if error > 0 else maxv == 1
    return out


def _weighted_lnds_removal(pdf: pd.DataFrame) -> pd.DataFrame:
    """Weighted longest non-decreasing subsequence of right-ranks in
    (left asc, right asc) order (each combo row carries cnt identical
    tuples); removal = group size - LNDS weight. Matches the reference's
    patience pass over raw tuples (complex_stripped_partition.cpp:191-242):
    tuples sharing (left, right) are interchangeable, so the expanded and
    weighted formulations agree. Fenwick prefix-max over right ranks keeps
    it O(m log m) per group of m combos."""
    s = pdf.sort_values(["av", "bv"], kind="mergesort")
    bv = s["bv"].to_numpy()
    cnt = s["cnt"].to_numpy()
    order = {v: i + 1 for i, v in enumerate(sorted(set(bv.tolist())))}
    m = len(order)
    tree = [0] * (m + 1)

    def update(i, val):
        while i <= m:
            if tree[i] < val:
                tree[i] = val
            i += i & (-i)

    def query(i):  # max over ranks <= i
        best = 0
        while i > 0:
            if tree[i] > best:
                best = tree[i]
            i -= i & (-i)
        return best

    best_total = 0
    for v, w in zip(bv.tolist(), cnt.tolist()):
        r = order[v]
        cur = query(r) + w  # non-decreasing: equal right ranks may chain
        update(r, cur)
        if cur > best_total:
            best_total = cur
    total = int(cnt.sum())
    return pd.DataFrame(
        {"cid": [int(pdf["cid"].iloc[0])], "removals": [total - best_total]}
    )


def _check_swaps(
    lvl: DataFrame, cands: list, sid_of: dict, error: float, n_rows: int
) -> dict:
    """Batched Swap checks: candidate (ctx, a, b, descending) partitions by
    ctx\\{a,b}, orders by a's rank (negated for descending -- Comp<Ordering>,
    od_ordering.h) and watches b's rank. Exact: a violation exists iff some
    group/left-rank's min(b) undercuts the running max(b) of strictly
    smaller left ranks (stripped_partition.cpp:139-185's eager group-max
    scan, reformulated as a window over aggregated combos). Approximate:
    removals = group size - weighted LNDS, summed per candidate."""
    if not cands:
        return {}
    entries = []
    for cid, (ctx, a, b, desc) in enumerate(cands):
        p_cols = [F.col(f"e{i}") for i in sorted(ctx - {a, b})]
        av = -F.col(f"e{a}") if desc else F.col(f"e{a}")
        entries.append(
            F.when(
                F.col("__sid") == sid_of[ctx],
                F.struct(
                    F.lit(cid).alias("cid"),
                    F.array(*p_cols).alias("pkey"),
                    av.alias("av"),
                    F.col(f"e{b}").alias("bv"),
                    F.col("__cnt").alias("cnt"),
                ),
            )
        )
    ex = _explode_candidates(lvl, entries)
    out = {}
    if error > 0:
        rem = (
            ex.groupBy("cid", "pkey")
            .applyInPandas(_weighted_lnds_removal, schema="cid int, removals long")
            .groupBy("cid")
            .agg(F.sum("removals").alias("rm"))
            .collect()
        )
        removals = {r["cid"]: int(r["rm"]) for r in rem}
        for cid, cand in enumerate(cands):
            out[cand] = removals.get(cid, 0) <= error * n_rows
        return out
    g = ex.groupBy("cid", "pkey", "av").agg(
        F.min("bv").alias("mn"), F.max("bv").alias("mx")
    )
    w = (
        Window.partitionBy("cid", "pkey")
        .orderBy("av")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    viol = (
        g.select("cid", (F.max("mx").over(w) > F.col("mn")).alias("v"))
        .filter("v")
        .select("cid")
        .distinct()
        .collect()
    )
    violated = {r["cid"] for r in viol}
    for cid, cand in enumerate(cands):
        out[cand] = cid not in violated
    return out


def mine_set_ods(
    df: DataFrame,
    columns: list[str] | None = None,
    error: float = 0.0,
    max_level: int | None = None,
    max_sets_per_job: int = 64,
) -> FastodResult:
    """FASTOD set-based canonical OD discovery (fastod.cpp Discover loop).

    Returns every minimal simple canonical OD (``context : [] -> a``) and
    ordered canonical OD (``context : a<= ~ b<=`` per asc/desc direction)
    under the reference's CC/CS lattice pruning; ``error > 0`` switches every
    validity check to the removal-set budget (canonical_od.cpp:15-30).
    ``max_level`` truncates the walk (level = context size) for callers that
    only need the shallow, oracle-checkable slice.
    """
    columns = list(columns or df.columns)
    p = len(columns)
    if p >= 64:
        raise ValueError("FASTOD attribute sets are capped at 63 columns")
    enc, dicts = _encode_ranks(df, columns)
    enc = enc.persist()
    n_rows = enc.count()
    for d in dicts:
        d.unpersist()
    schema = frozenset(range(p))

    cc: dict[frozenset, frozenset] = {frozenset(): schema}
    cs_asc: dict[frozenset, set] = defaultdict(set)
    cs_desc: dict[frozenset, set] = defaultdict(set)
    res = FastodResult(columns=columns, n_rows=n_rows)

    contexts = [frozenset({i}) for i in range(p)]
    level = 1
    while contexts and (max_level is None or level <= max_level):
        contexts = sorted(contexts, key=_mask)
        res.levels = level
        # --- first ComputeODs loop: CC propagation + CS candidate seeding
        for ctx in contexts:
            cc[ctx] = reduce(
                lambda acc, a: acc & cc[ctx - {a}], sorted(ctx), schema
            )
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
                            if all(
                                pair in cs[ctx - {attr2}] for attr2 in cdab
                            ):
                                adds.add(pair)
                    cs[ctx] |= adds
        # --- candidate lists (cc of level-1 parents is final; cc of this
        # level only changes AFTER the checks, so batching is exact)
        ofd_snapshot = {ctx: sorted(ctx & cc[ctx]) for ctx in contexts}
        ofd_cands = [(ctx, a) for ctx in contexts for a in ofd_snapshot[ctx]]
        swap_cands = []
        for ctx in contexts:
            for cs, desc_flag in ((cs_desc, True), (cs_asc, False)):
                for a, b in sorted(cs[ctx]):
                    if a in cc[ctx - {b}] and b in cc[ctx - {a}]:
                        swap_cands.append((ctx, a, b, desc_flag))
        # --- batched data checks: one grouping-sets pass + one job per kind
        lvl, sid_of = _level_frame(enc, contexts, max_sets_per_job)
        lvl = lvl.persist()
        try:
            # the two checks only read the shared cached level frame, so
            # their jobs can overlap: the DAGScheduler dedups the common
            # grouping-sets stages and the block manager serializes each
            # cache fill per partition (no double compute)
            with ThreadPoolExecutor(max_workers=2) as ex:
                f_ofd = ex.submit(
                    _check_ofds, lvl, ofd_cands, sid_of, error, n_rows
                )
                swap_valid = _check_swaps(
                    lvl, swap_cands, sid_of, error, n_rows
                )
                ofd_valid = f_ofd.result()
        finally:
            lvl.unpersist()
        # --- second ComputeODs loop, replayed in the reference's order
        for ctx in contexts:
            cur = cc[ctx]
            for a in ofd_snapshot[ctx]:
                if ofd_valid[(ctx, a)]:
                    res.simple.append((ctx - {a}, a))
                    cur = cur - {a}
                    if schema - ctx:
                        cur = cur & ctx
                    cc[ctx] = cur
            for cs, desc_flag, sink in (
                (cs_desc, True, res.desc),
                (cs_asc, False, res.asc),
            ):
                keep = set()
                for a, b in sorted(cs[ctx]):
                    if a in cc[ctx - {b}] and b in cc[ctx - {a}]:
                        if swap_valid[(ctx, a, b, desc_flag)]:
                            sink.append(((ctx - {a}) - {b}, a, b))
                        else:
                            keep.add((a, b))
                cs[ctx] = keep
        # --- PruneLevels + CalculateNextLevel (fastod.cpp:185-247)
        if level > 1:
            contexts = [
                ctx
                for ctx in contexts
                if cc[ctx] or cs_asc[ctx] or cs_desc[ctx]
            ]
        ctx_set = set(contexts)
        prefix_blocks: dict[frozenset, list] = defaultdict(list)
        for ctx in contexts:
            for a in ctx:
                prefix_blocks[ctx - {a}].append(a)
        next_level = set()
        for prefix, attrs in prefix_blocks.items():
            if len(attrs) <= 1:
                continue
            for i, j in combinations(sorted(attrs), 2):
                cand = prefix | {i, j}
                if all((cand - {x}) in ctx_set for x in cand):
                    next_level.add(cand)
        contexts = sorted(next_level, key=_mask)
        level += 1
    enc.unpersist()
    return res
