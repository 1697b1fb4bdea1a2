"""Conditional-FD discovery (the reference's FDFirst / CTane family).

Reference: ``cfd/fd_first_algorithm.cpp`` (FDFirst, itemset lattice over
attribute/constant patterns), result strings ``cfd/util/cfd_output_util.cpp``,
goldens ``src/tests/unit/test_cfd_algos.cpp`` (tennis minsup=8 minconf=0.85
max_lhs=3 -> 13 CFDs; mushroom50 minsup=4 minconf=0.9 max_lhs=4 -> 18 CFDs).

A CFD candidate is (lhs attrs, pattern, rhs): the pattern fixes a subset C of
the lhs attributes to constants (the rest are wildcards); the RHS is either a
variable attribute or, when C == lhs, its most frequent constant.  With
``partitions`` = the lhs-value groups inside the pattern's matching rows:

  support    = #rows matching the pattern's constants
  error      = sum over partitions of (size - max same-RHS subgroup)
               (partition_util.cpp:18-29 -- same formula for both rule kinds)
  confidence = 1 - error / support

The reference emits a rule iff support >= minsup (patterns; FD rules always
have support n), confidence >= minconf, the rule passes its local skips, and
no previously *recorded* exact rule (confidence >= 1) precedes it
(fd_first_algorithm.cpp:126-150, 293-320).  ``Precedes(a, b)`` holds when a's
constants appear verbatim in b and every variable attr of a is constrained
(either way) in b (fd_first_algorithm.cpp:81-99).  Because Precedes is
transitive and recording only requires the local skips, the traversal-order
``rules_`` interplay collapses to a closed form -- which is also why the
reference's own test asserts DFS == BFS output equality:

  emit(r)  <=>  filters(r) and not exists e in E with e != r, same RHS key
                (attr for variable rules / attr+constant for constant rules),
                Precedes(e, r)
  E = exact rules (error == 0) passing their own local skips and minsup.

Local skips: a variable-RHS rule whose matching rows carry a single RHS value
is dropped (IsConstRule / IsConstRulePartition -- a constant rule covers it);
an FD rule (empty C) requires the lhs to be a generator ("free": no nonempty
proper subset with the same distinct count; singletons are always free,
fd_first_algorithm.cpp:156-161).

Spark design -- three chained grouping-sets jobs over ever-shrinking data (the
idiomatic lattice-level shape, same as discovery._lattice_counts):

  job0  G  = groupBy(all attrs).count()            -- the only full-table
        shuffle; map-side combine reduces 100 TB to the distinct-combo table
  job1  H  = G.groupingSets(every attr set S, |S| <= max_lhs+1): per-node
        distinct combos + sizes; batched Expand, one job per <=
        ``max_sets_per_job`` sets
  job2  H2 = H.groupingSets over (gid, lhs cols) for every (S, rhs) pair:
        per lhs-value group -- size, best = max RHS-subgroup, RHS extrema and
        argmax; pairs sharing a column set share one grouping set
  job3  P  = H2.groupingSets over (gid2, gid, C) for every C subset of lhs:
        per-pattern support / satisfied / extrema, with the minsup +
        minconf filter applied server-side (HAVING) before anything is
        collected

Only qualifying patterns reach the driver (FDFirst's rule list is
driver-resident by contract); ``max_patterns`` guards the collect the same
way dd.py's bucket_cap guards its band join.  The table is treated as
string-typed with NULL as an ordinary value -- the reference ingests every
relation as strings (cfd/model/cfd_relation_data.h).
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Stand-in value for SQL NULL inside the string-canonical projection; chosen
#: from a Unicode noncharacter block so it cannot collide with real data.
#: Returned verbatim in rule constants (a None constant means *wildcard*).
NULL_VALUE = "﷐<null>"
_NULL = NULL_VALUE

#: Hard cap on profiled attributes: grouping ids pack one bit per attribute
#: per stage (3 stages -> 3p bits in the combined filter key), and the
#: pattern lattice is exponential in p by nature.
_MAX_ATTRS = 12


@dataclass(frozen=True)
class CFDRule:
    """One discovered CFD.

    ``lhs``: tuple of (attr, constant) with constant None for wildcards, in
    the profiled column order.  ``rhs_const`` None means a variable RHS.
    Constants for real SQL NULLs come back as ``NULL_VALUE``.
    """

    lhs: tuple[tuple[str, str | None], ...]
    rhs_attr: str
    rhs_const: str | None
    support: int
    confidence: float

    def to_string(self) -> str:
        """Reference-style display string "(a, b=x) => c[=v]"
        (cfd_output_util.cpp:36-50; item order there follows internal value
        ids -- here: wildcards first, then constants, each in column order)."""
        wild = [a for a, v in self.lhs if v is None]
        const = [f"{a}={v}" for a, v in self.lhs if v is not None]
        rhs = (
            self.rhs_attr
            if self.rhs_const is None
            else f"{self.rhs_attr}={self.rhs_const}"
        )
        return "(" + ", ".join(wild + const) + ") => " + rhs


def _precedes(
    a: tuple[frozenset, frozenset], b: tuple[frozenset, frozenset]
) -> bool:
    """Pattern-lattice precedence (fd_first_algorithm.cpp:81-99).  a/b are
    (variable-attr set, frozenset of (attr, const) items); a precedes b when
    a != b, a is no larger, every constant of a appears verbatim in b and
    every variable attr of a is present in b (as variable or constant)."""
    a_var, a_const = a
    b_var, b_const = b
    if a == b:
        return False
    if len(a_var) + len(a_const) > len(b_var) + len(b_const):
        return False
    if not a_const <= b_const:
        return False
    b_attrs = b_var | {attr for attr, _ in b_const}
    return all(attr in b_attrs for attr in a_var)


def mine_cfds(
    df: DataFrame,
    columns: list[str] | None = None,
    min_supp: int = 1,
    min_conf: float = 1.0,
    max_lhs: int = 2,
    max_patterns: int = 200_000,
    max_sets_per_job: int = 48,
) -> list[CFDRule]:
    """Mine CFDs with FDFirst semantics (see module docstring).

    ``min_supp`` is an absolute row count like the reference's
    kCfdMinimumSupport; FD (all-wildcard) rules always have support = n and
    bypass it, matching MineFD.  Raises if more than ``max_patterns``
    qualifying patterns would reach the driver -- raise minsup instead of
    the cap; the rule list itself is the algorithm's contract output.
    """
    columns = list(columns or df.columns)
    p = len(columns)
    if p < 2:
        raise ValueError("mine_cfds needs at least two columns")
    if p > _MAX_ATTRS:
        raise ValueError(
            f"mine_cfds profiles at most {_MAX_ATTRS} columns (got {p}); "
            "the pattern lattice is exponential in the column count"
        )
    if min_supp < 1:
        raise ValueError("min_supp must be >= 1")
    if not 0.0 <= min_conf <= 1.0:
        raise ValueError("min_conf must be within [0, 1]")
    max_lhs = min(max_lhs, p - 1)
    if max_lhs < 1:
        raise ValueError("max_lhs must be >= 1")

    work = df.select(
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)).alias(c) for c in columns]
    )
    spark = df.sparkSession

    # --- job0: the one full-table shuffle --------------------------------
    g = work.groupBy(*columns).agg(F.count(F.lit(1)).alias("__n0"))
    par = spark.sparkContext.defaultParallelism
    if g.rdd.getNumPartitions() < par:
        # small inputs land in one scan partition; the Expand stages below
        # would run near-serially (same guard as discovery._lattice_counts)
        g = g.repartition(par)
    g = g.persist()

    def gid_of(subset: tuple[str, ...], gcols: list[str]) -> int:
        out = 0
        width = len(gcols)
        for i, c in enumerate(gcols):
            if c not in subset:
                out |= 1 << (width - 1 - i)
        return out

    # --- job1: every lattice node's distinct combos ----------------------
    sets1 = [
        s
        for k in range(1, max_lhs + 2)
        for s in combinations(columns, k)
    ]
    h_parts = []
    for lo in range(0, len(sets1), max_sets_per_job):
        batch = sets1[lo : lo + max_sets_per_job]
        h_parts.append(
            g.groupingSets([list(s) for s in batch], *[F.col(c) for c in columns])
            .agg(F.sum("__n0").alias("__n"), F.grouping_id().alias("__gid"))
        )
    h = h_parts[0]
    for extra in h_parts[1:]:
        h = h.unionByName(extra)
    h = h.persist()

    gid1 = {gid_of(s, columns): s for s in sets1}
    d_rows = h.groupBy("__gid").agg(F.count(F.lit(1)).alias("__d")).collect()
    if not d_rows:  # empty input: no patterns, no rules
        g.unpersist()
        h.unpersist()
        return []
    d_of = {frozenset(gid1[r["__gid"]]): int(r["__d"]) for r in d_rows}

    # --- job2: per-(S, rhs) lhs-value groups -----------------------------
    pairs = [
        (s, rhs, tuple(c for c in s if c != rhs))
        for s in sets1
        if len(s) >= 2
        for rhs in s
    ]
    lhs_sets = sorted({pr[2] for pr in pairs}, key=lambda t: (len(t), t))
    gcols2 = ["__gid", *columns]
    aggs2 = [
        F.sum("__n").alias("__size"),
        F.max("__n").alias("__best"),
        F.grouping_id().alias("__gid2"),
    ]
    for i, c in enumerate(columns):
        aggs2 += [
            F.min(F.col(f"__v{i}")).alias(f"__vmin{i}"),
            F.max(F.col(f"__v{i}")).alias(f"__vmax{i}"),
            F.max_by(F.col(f"__v{i}"), F.struct("__n", f"__v{i}")).alias(f"__bv{i}"),
        ]
    # duplicate value columns: aggregating a grouping column is ambiguous in
    # a grouping-sets plan, a plain copy is not
    h_in = h.filter(
        F.col("__gid").isin([gd for gd, s in gid1.items() if len(s) >= 2])
    ).select("*", *[F.col(c).alias(f"__v{i}") for i, c in enumerate(columns)])
    h2_parts = []
    for lo in range(0, len(lhs_sets), max_sets_per_job):
        batch = lhs_sets[lo : lo + max_sets_per_job]
        h2_parts.append(
            h_in.groupingSets(
                [["__gid", *s] for s in batch], *[F.col(c) for c in gcols2]
            ).agg(*aggs2)
        )
    h2 = h2_parts[0]
    for extra in h2_parts[1:]:
        h2 = h2.unionByName(extra)

    gid2_of = {s: gid_of(("__gid",) + s, gcols2) for s in lhs_sets}
    valid2 = {
        (gid2_of[lhs], gid_of(s, columns)): (s, rhs, lhs) for s, rhs, lhs in pairs
    }
    shift = 1 << p
    pair_key = F.col("__gid2") * shift + F.col("__gid")
    h2v = h2.filter(
        pair_key.isin([g2 * shift + g1 for g2, g1 in valid2])
    ).persist()

    # --- job3: per-pattern support / satisfied / extrema ------------------
    c_sets = sorted(
        {tuple(c) for k in range(0, max_lhs + 1) for c in combinations(columns, k)},
        key=lambda t: (len(t), t),
    )
    gcols3 = ["__gid2", "__gid", *columns]
    aggs3 = [
        F.sum("__size").alias("__supp"),
        F.sum("__best").alias("__sat"),
        F.grouping_id().alias("__gid3"),
    ]
    for i in range(p):
        aggs3 += [
            F.min(f"__vmin{i}").alias(f"__pmin{i}"),
            F.max(f"__vmax{i}").alias(f"__pmax{i}"),
            F.max_by(F.col(f"__bv{i}"), F.col("__best")).alias(f"__pbv{i}"),
        ]
    gid3_of = {s: gid_of(("__gid2", "__gid") + s, gcols3) for s in c_sets}
    valid3 = set()
    for (g2, g1), (_s, _rhs, lhs) in valid2.items():
        for k in range(0, len(lhs) + 1):
            for csub in combinations(lhs, k):  # lhs is in column order, so
                valid3.add((gid3_of[csub], g2, g1))  # csub keys c_sets directly
    conf_expr = F.lit(1.0) - (
        (F.col("__supp") - F.col("__sat")).cast("double")
        / F.col("__supp").cast("double")
    )
    triple_key = (F.col("__gid3") * shift + F.col("__gid2")) * shift + F.col("__gid")
    p_parts = []
    for lo in range(0, len(c_sets), max_sets_per_job):
        batch = c_sets[lo : lo + max_sets_per_job]
        p_parts.append(
            h2v.groupingSets(
                [["__gid2", "__gid", *s] for s in batch],
                *[F.col(c) for c in gcols3],
            )
            .agg(*aggs3)
            .filter(
                triple_key.isin(
                    [
                        (g3 * shift + g2) * shift + g1
                        for g3, g2, g1 in valid3
                        if g3 in {gid3_of[s] for s in batch}
                    ]
                )
            )
            .filter((F.col("__supp") >= min_supp) & (conf_expr >= min_conf))
        )
    patterns = p_parts[0]
    for extra in p_parts[1:]:
        patterns = patterns.unionByName(extra)
    keep = (
        ["__gid3", "__gid2", "__gid", "__supp", "__sat"]
        + columns
        + [f"__pmin{i}" for i in range(p)]
        + [f"__pmax{i}" for i in range(p)]
        + [f"__pbv{i}" for i in range(p)]
    )
    rows = patterns.select(*keep).limit(max_patterns + 1).collect()
    g.unpersist()
    h.unpersist()
    h2v.unpersist()
    if len(rows) > max_patterns:
        raise ValueError(
            f"more than {max_patterns} qualifying patterns; raise min_supp "
            "(the rule list is driver-resident by the FDFirst contract)"
        )

    # --- driver: local skips, exact set, precedence pruning --------------
    gid3_sets = {v: k for k, v in gid3_of.items()}
    col_ix = {c: i for i, c in enumerate(columns)}

    def is_free(lhs: tuple[str, ...]) -> bool:
        if len(lhs) == 1:
            return True  # singletons are unconditionally generators
        dl = d_of[frozenset(lhs)]
        return all(
            d_of[frozenset(sub)] != dl
            for k in range(1, len(lhs))
            for sub in combinations(lhs, k)
        )

    recs = []
    for r in rows:
        _s, rhs, lhs = valid2[(r["__gid2"], r["__gid"])]
        c_cols = gid3_sets[r["__gid3"]]
        ri = col_ix[rhs]
        supp, sat = int(r["__supp"]), int(r["__sat"])
        conf = 1.0 - float(supp - sat) / float(supp)
        const_items = frozenset((a, r[a]) for a in c_cols)
        var_attrs = frozenset(a for a in lhs if a not in c_cols)
        if len(c_cols) == len(lhs):
            rhs_const = r[f"__pbv{ri}"]
        else:
            rhs_const = None
            if r[f"__pmin{ri}"] == r[f"__pmax{ri}"]:
                continue  # IsConstRule(Partition): a constant rule covers it
            if not c_cols and not is_free(lhs):
                continue
        recs.append(
            {
                "lhs": lhs,
                "rhs": rhs,
                "pat": (var_attrs, const_items),
                "rhs_const": rhs_const,
                "supp": supp,
                "conf": conf,
            }
        )

    exact = [r for r in recs if r["conf"] >= 1.0]
    out = []
    for r in recs:
        pruned = False
        for e in exact:
            if e is r:
                continue
            if r["rhs_const"] is None:
                if e["rhs_const"] is not None or e["rhs"] != r["rhs"]:
                    continue
            elif (
                e["rhs_const"] is None
                or e["rhs"] != r["rhs"]
                or e["rhs_const"] != r["rhs_const"]
            ):
                continue
            if _precedes(e["pat"], r["pat"]):
                pruned = True
                break
        if pruned:
            continue
        consts = dict(r["pat"][1])
        out.append(
            CFDRule(
                lhs=tuple(
                    (a, consts.get(a)) for a in columns if a in r["lhs"]
                ),
                rhs_attr=r["rhs"],
                rhs_const=r["rhs_const"],
                support=r["supp"],
                confidence=r["conf"],
            )
        )
    return sorted(
        out,
        key=lambda c: (
            len(c.lhs),
            tuple((a, v is not None, v or "") for a, v in c.lhs),
            c.rhs_attr,
            c.rhs_const is not None,
            c.rhs_const or "",
        ),
    )
