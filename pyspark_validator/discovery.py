"""Bonus discovery (mining) operators over the validation primitives.

The north rule scopes this engine to the VALIDATION tier; the reference's
discovery algorithms (TANE/Pyro/HyFD/Spider/...) are lattice searches over the
same primitives our checks use (SURVEY.md section 2.7). This module mines the
unary level -- the overwhelmingly common profiling ask -- to demonstrate the
primitives compose into discovery at Spark scale:

  * mine_unary_fds   -- all A -> B with countDistinct(A) == countDistinct(A,B)
    (TANE level-1 criterion, fd_verifier.cpp:55-65) -- ONE pass computing all
    p + p*(p-1) distinct counts in a single wide aggregation.
  * mine_uccs        -- all unary + pairwise UCCs: max cluster size == 1
    (HyUCC's base level).
  * mine_unary_inds  -- all A subseteq B across a set of tables via the Spider
    domain construction (spider/spider.cpp:49-80): explode (value, column)
    pairs, aggregate per value the set of columns containing it, and intersect
    those sets -- one shuffle for ALL column pairs at once, instead of p^2
    anti-joins.

  * mine_sfds        -- CORDS over all pairs (soft keys, trivial columns,
    soft FDs, correlations) with the pairwise distinct counts shared from
    one wide aggregation and the contingency pass only on eligible pairs.

Round 2 extends the bonus one level up the lattice, mirroring the reference's
benchmark gates (src/tests/benchmark/fd_benchmark.h, ind_benchmark.h):

  * mine_fds   -- minimal EXACT FDs to arbitrary |LHS| <= max_lhs (TANE
    criterion + TANE minimality/key/internal-FD pruning, tane.cpp lattice
    walk). ONE batched GROUPING SETS job per lattice level: the first pass
    computes the distinct count of EVERY node up to pairs (shared Expand +
    shuffle + map-side partial agg), each further level counts only the
    apriori-surviving candidates not cached from the level below.
  * mine_afds  -- minimal APPROXIMATE FDs with |LHS| <= max_lhs under a g1
    (or 1-pdep) error budget (afd_measures.cpp:6-130 formulas, the same
    ones checks/fd.py::afd_measures mirrors). g1 telescopes to a difference
    of per-set equal-pair counts, so it rides the same per-level
    grouping-sets jobs; level-wise pruning is sound because both errors are
    monotone non-increasing in the LHS.
  * mine_ainds -- Mind-style approximate INDs (mind.cpp:167-207): error =
    fraction of the dependent column's DISTINCT values missing from the
    referenced column, kept when error <= max_error; same single-shuffle
    inverted domain as mine_unary_inds.
  * mine_binary_inds -- Mind's level-2 apriori (mind.cpp:209-261): binary
    IND candidates exist only where both component unary INDs hold; each
    survivor is verified exactly by one distinct-projection anti-join.
  * mine_frequent_itemsets / mine_ars -- the reference's Apriori AR miner
    (ar/apriori/apriori.h, rule gen ar_algorithm.cpp GenerateRulesFrom):
    level-wise frequent itemsets as batched contains-all wide aggs over ONE
    cached per-transaction item-set frame, or Spark ML's distributed
    FP-growth as the scale path; multi-item-consequent rules from every
    frequent itemset with count-exact confidence thresholds.

Column counts in profiling tables are small (tens); the row dimension is where
Spark scales. Exact counts by default; pass approx=True for HLL sketches at
trillion-row scale.
"""

from __future__ import annotations

from itertools import combinations, permutations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _distinct_counts(
    df: DataFrame, columns: list[str], pairs: list[tuple[str, str]], approx: bool
) -> dict:
    def d(*cols):
        key = F.struct(*[F.col(c) for c in cols])
        return (
            F.approx_count_distinct(key) if approx else F.count_distinct(key)
        ).alias("__".join(cols))

    aggs = [d(c) for c in columns] + [d(a, b) for a, b in pairs]
    row = df.agg(*aggs).collect()[0]
    return row.asDict()


def mine_unary_fds(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> list[tuple[str, str]]:
    """All exact unary FDs A -> B (A determines B). Exact mode shares one
    grouping-sets job for every single+pair distinct count
    (:func:`_lattice_counts`); approx mode keeps the one-agg HLL sketch pass
    for trillion-row scale."""
    columns = list(columns or df.columns)
    pairs = list(permutations(columns, 2))
    unordered = list(combinations(columns, 2))
    if approx:
        counts = _distinct_counts(df, columns, unordered, approx)

        def d(*cols):
            key = "__".join(cols)
            return counts.get(key, counts.get("__".join(reversed(cols))))

    else:
        lat = _lattice_counts(df, [(c,) for c in columns] + unordered)

        def d(*cols):
            return lat[frozenset(cols)][0]

    return sorted((a, b) for a, b in pairs if d(a, b) == d(a))


def mine_uccs(
    df: DataFrame,
    columns: list[str] | None = None,
    max_arity: int = 2,
    approx: bool = False,
    max_error: float = 0.0,
) -> list[tuple[str, ...]]:
    """Minimal UCCs of arity <= max_arity (HPIValid/HyUCC result semantics:
    distinct count == row count, supersets of a UCC pruned). Exact mode is a
    level-wise lattice walk: ONE grouping-sets job covers all singles AND
    pairs (the pair counts for prunable pairs are wasted work, but one shared
    shuffle beats a second full scan); each further level is one more batched
    grouping-sets job over only the apriori-surviving candidate sets. Width
    grows as C(p, k) -- bounded per job by ``_lattice_counts``'s
    max_sets_per_job batching. Approx mode keeps the HLL sketch aggs
    (arity <= 2).

    ``max_error`` > 0 mines approximate UCCs (PyroUCC semantics,
    examples/basic/mining_aucc.py): register the minimal sets whose AUCC
    error sum c*(c-1) / (n*(n-1)) is <= max_error -- the same pair counts
    the exact walk's shared grouping-sets job already returns, and the
    error is anti-monotone under column addition, so the walk's apriori
    pruning carries over unchanged (incompatible with ``approx``, whose
    HLL sketches estimate distincts, not violation pairs)."""
    columns = list(columns or df.columns)
    if approx and max_error > 0.0:
        raise ValueError("AUCC mining needs exact pair counts; approx=False")
    if approx:
        n = df.count()
        unary_counts = _distinct_counts(df, columns, [], approx)
        uccs: list[tuple[str, ...]] = [
            (c,) for c in columns if unary_counts[c] == n
        ]
        if max_arity >= 2:
            non_unique = [c for c in columns if (c,) not in uccs]
            pairs = list(combinations(non_unique, 2))
            if pairs:
                pair_counts = _distinct_counts(df, [], pairs, approx)
                uccs += [
                    (a, b) for a, b in pairs if pair_counts[f"{a}__{b}"] == n
                ]
        return sorted(uccs)
    sets = [(c,) for c in columns]
    if max_arity >= 2:
        sets += list(combinations(columns, 2))
    lat = _lattice_counts(df, sets)
    n = next(iter(lat.values()))[2]
    denom = n * (n - 1) if n > 1 else 1

    def holds(s) -> bool:
        if max_error <= 0.0:
            return lat[frozenset(s)][0] == n
        return lat[frozenset(s)][1] / denom <= max_error

    found: list[tuple[str, ...]] = [(c,) for c in columns if holds((c,))]
    minimal = [frozenset(u) for u in found]
    for k in range(2, max_arity + 1):
        cands = [
            s
            for s in combinations(columns, k)
            if not any(m <= frozenset(s) for m in minimal)
        ]
        if not cands:
            break
        need = [s for s in cands if frozenset(s) not in lat]
        if need:
            lat.update(_lattice_counts(df, need))
        level = [s for s in cands if holds(s)]
        found += level
        minimal += [frozenset(s) for s in level]
    return sorted(found)


def mine_unary_inds(
    tables: dict[str, DataFrame], approx_prescreen: bool = False
) -> list[tuple[str, str]]:
    """All unary INDs "T.A subseteq S.B" across ``tables`` (Spider-style).

    Build the (value, attribute-set) inverted domain in one shuffle:
    every column's distinct values tagged with 'table.column', grouped by value
    with collect_set(attr); a column A is included in B iff every value-group
    containing A also contains B -- i.e. min over A's groups of
    array_contains(attrs, B). Computed for ALL pairs from the same grouped
    frame via one explode + aggregation.
    """
    j = _ind_pair_stats(tables)
    inds = j.filter(F.col("together") == F.col("n_values")).select("a", "b")
    return sorted((r.a, r.b) for r in inds.collect())


def _ind_pair_stats(
    tables: dict[str, DataFrame],
    empty_is_null: bool = False,
    null_marker: str | None = None,
) -> DataFrame:
    """Spider inverted domain -> one row per ordered attr pair that shares at
    least one value: (a, b, together=|dom(a) n dom(b)|, n_values=|dom(a)|).

    Defaults keep the historical semantics (SQL NULL dropped, '' a value).
    ``empty_is_null`` folds empty strings into null (the reference's
    IsNullOrEmpty view); ``null_marker`` keeps null as ONE domain value under
    that marker instead of dropping it (is_null_equal_null=true)."""
    cols = []
    for tname, df in tables.items():
        for c in df.columns:
            cols.append((tname, c, df))
    tagged = None
    for tname, c, df in cols:
        v = F.col(c)
        isnull = v.isNull()
        if empty_is_null:
            isnull = isnull | (v.cast("string") == "")
        if null_marker is None:
            value = v.cast("string")
            sel = df.select(
                value.alias("value"), F.lit(f"{tname}.{c}").alias("attr")
            ).where(~isnull)
        else:
            value = F.when(isnull, F.lit(null_marker)).otherwise(v.cast("string"))
            sel = df.select(
                value.alias("value"), F.lit(f"{tname}.{c}").alias("attr")
            )
        part = sel.distinct()
        tagged = part if tagged is None else tagged.unionByName(part)
    domains = tagged.groupBy("value").agg(F.collect_set("attr").alias("attrs"))
    # for each attr present in a value-group, the group's attr set constrains
    # its candidate superset columns: intersect via explode + count matching
    pair_counts = (
        domains.select(F.explode("attrs").alias("a"), "attrs")
        .select("a", F.explode("attrs").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("together"))
    )
    totals = (
        domains.select(F.explode("attrs").alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("n_values"))
    )
    return pair_counts.join(totals, on="a")


def mine_unary_inds_exact(
    tables: dict[str, DataFrame], is_null_equal_null: bool = False
) -> list[tuple[str, str]]:
    """Exact unary INDs with the reference's null semantics, pinned by its
    consistent-hash suite (test_ind_algorithms.cpp:78-106 over
    INDTestNulls.csv):

    * a column that is entirely null/empty never participates on either side
      (its type is kNull/kEmpty -- undefined);
    * ``is_null_equal_null=False`` (the reference default): the LHS must be
      null-free; inclusion is over the non-null distinct values ('' counts
      as null -- IsNullOrEmpty);
    * ``is_null_equal_null=True``: null is ONE value that must also appear
      in the RHS.

    Same one-shuffle inverted-domain plan as :func:`mine_unary_inds`, plus
    one tiny per-table aggregation for the null census.
    """
    marker = "\x00null\x00"
    participating: set[str] = set()
    null_free: set[str] = set()
    for tname, df in tables.items():
        if not df.columns:
            continue
        aggs = []
        for c in df.columns:
            v = F.col(c)
            isnull = v.isNull() | (v.cast("string") == "")
            aggs.append(
                F.struct(
                    F.sum(isnull.cast("long")).alias("nn"),
                    F.count(F.lit(1)).alias("n"),
                ).alias(c)
            )
        row = df.agg(*aggs).collect()[0]
        for c in df.columns:
            nn, n = row[c]["nn"] or 0, row[c]["n"]
            attr = f"{tname}.{c}"
            if n > 0 and nn < n:
                participating.add(attr)
            if nn == 0 and n > 0:
                null_free.add(attr)
    j = _ind_pair_stats(
        tables,
        empty_is_null=True,
        null_marker=marker if is_null_equal_null else None,
    )
    inds = j.filter(F.col("together") == F.col("n_values")).select("a", "b")
    lhs_ok = participating if is_null_equal_null else null_free
    return sorted(
        (r.a, r.b)
        for r in inds.collect()
        if r.a in lhs_ok and r.b in participating
    )


def mine_ainds(
    tables: dict[str, DataFrame], max_error: float = 0.3
) -> list[tuple[str, str, float]]:
    """Mind-style approximate unary INDs (mind.cpp:167-207): for each ordered
    attr pair A, B the error is the fraction of A's DISTINCT values absent
    from B (the reference's disqualify_row_count / lhs_cardinality over the
    deduplicated hash sets); pairs with error <= max_error are kept.

    Same one-shuffle inverted domain as :func:`mine_unary_inds` -- the pair
    error is 1 - together/n_values, so ALL pairs are judged from one grouped
    frame. ``max_error`` must be < 1: fully disjoint pairs never co-occur in
    the inverted index (they are error 1 by construction and always dropped).
    """
    if not 0.0 <= max_error < 1.0:
        raise ValueError("max_error must be in [0, 1)")
    j = _ind_pair_stats(tables).select(
        "a",
        "b",
        (
            (F.col("n_values") - F.col("together"))
            / F.col("n_values").cast("double")
        ).alias("error"),
    )
    out = j.filter(F.col("error") <= F.lit(float(max_error)))
    return sorted((r.a, r.b, float(r.error)) for r in out.collect())


def mine_sfds(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    parallelism: int = 4,
    **params,
):
    """CORDS over all column pairs (cords.cpp ExecuteInternal): returns
    {soft_keys, trivial_columns, sfds, correlations} with sfds/correlations
    as (determinant, dependent) name pairs.

    Every single and pairwise distinct count comes from ONE pass (exact:
    the shared grouping-sets lattice job; approx: one HLL wide agg) and is
    injected into the verifiers so the per-pair 4-count scan is skipped;
    only non-excluded pairs then pay the per-pair contingency pass, and those
    independent per-pair jobs are submitted from ``parallelism`` driver
    threads so a wide table does not serialize on per-job latency (Spark's
    scheduler interleaves concurrent jobs). ``params`` forward to SFDCheck
    (thresholds, max_categories)."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark_validator.checks.sfd import SFDCheck

    columns = list(columns or df.columns)
    min_card = params.get("min_cardinality", 0.1)
    pairs = list(combinations(columns, 2))
    if approx:
        counts = _distinct_counts(df, columns, pairs, approx)
        n = df.count()
    else:
        lat = _lattice_counts(df, [(c,) for c in columns] + pairs)
        counts = {c: lat[frozenset((c,))][0] for c in columns}
        counts.update(
            {f"{a}__{b}": lat[frozenset((a, b))][0] for a, b in pairs}
        )
        n = next(iter(lat.values()))[2]
    soft_keys = [c for c in columns if counts[c] >= (1.0 - min_card) * n]
    trivial = [c for c in columns if counts[c] == 1]
    excluded = set(soft_keys) | set(trivial)
    eligible = [(a, b) for a, b in pairs if a not in excluded and b not in excluded]

    def judge(pair):
        a, b = pair
        chk = SFDCheck(df, a, b, **params)
        # inject the shared-agg counts so the per-pair 4-count scan is skipped
        chk.__dict__["_cards"] = (n, counts[a], counts[b], counts[f"{a}__{b}"])
        return chk.summary().collect()[0]

    if parallelism > 1 and len(eligible) > 1:
        with ThreadPoolExecutor(max_workers=parallelism) as ex:
            rows = list(ex.map(judge, eligible))
    else:
        rows = [judge(p) for p in eligible]
    sfds, correlations = [], []
    for s in rows:
        if s["sfd_holds"]:
            sfds.append((s["det"], s["dep"]))
        elif s["correlated"]:
            correlations.append((s["det"], s["dep"]))
    return {
        "soft_keys": soft_keys,
        "trivial_columns": trivial,
        "sfds": sfds,
        "correlations": correlations,
    }


# ---------------------------------------------------------------------------
# Level-2 lattice: minimal exact / approximate FDs (TANE one level deeper)
# ---------------------------------------------------------------------------


def _lattice_counts(
    df: DataFrame,
    sets: list[tuple[str, ...]],
    max_sets_per_job: int = 64,
) -> dict[frozenset, tuple[int, int, int]]:
    """ONE grouping-sets pass over ``df`` computing, for every column set S:
      D(S) = number of distinct S-projections (NULL a value),
      P(S) = sum over S-groups of n_g * (n_g - 1)  (equal-row pairs),
      N    = total rows.
    GROUPING SETS is the idiomatic Spark answer to a lattice level: every set
    shares one Expand + one shuffle + one stage barrier instead of one job per
    set, and the map-side partial aggregation reduces each expanded copy to
    its group counts before the exchange. grouping_id() disambiguates sets,
    so real NULL key values (grouped as values, null-equal-null) never
    collide with "column absent from this set". Returns {frozenset(S): (D,
    P, N)}; pass () for the empty set (D=1, P=n(n-1)).

    ``max_sets_per_job`` bounds the Expand width: Expand multiplies scan rows
    by |sets|, so a wide table's lattice (p=20 -> 211 level<=2 sets) over
    100 TB must NOT ride one job. Batches of <= max_sets_per_job sets run as
    separate jobs (a 64-way Expand per scan is the measured sweet spot on
    columnar input; the jobs are independent, so a caller can also lower it
    and submit from threads)."""
    uniq = sorted({tuple(s) for s in sets}, key=lambda t: (len(t), t))
    # The Expand x |sets| + partial agg is the expensive stage; a small input
    # (fewer scan partitions than cores -- e.g. one parquet file) would run it
    # near-serially. Fan it out first; at scale the scan already has more
    # partitions than this and the branch is a no-op.
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    out: dict[frozenset, tuple[int, int, int]] = {}
    for lo in range(0, len(uniq), max_sets_per_job):
        batch = uniq[lo : lo + max_sets_per_job]
        all_cols = sorted({c for s in batch for c in s})
        gd = df.groupingSets(
            [list(s) for s in batch], *[F.col(c) for c in all_cols]
        )
        lvl = gd.agg(
            F.count(F.lit(1)).alias("__cnt"), F.grouping_id().alias("__gid")
        )
        rows = (
            lvl.groupBy("__gid")
            .agg(
                F.count(F.lit(1)).alias("__d"),
                F.sum(F.col("__cnt") * (F.col("__cnt") - 1)).alias("__p"),
                F.sum("__cnt").alias("__n"),
            )
            .collect()
        )
        width = len(all_cols)
        gid_to_set = {}
        for st in batch:
            gid = 0
            for i, c in enumerate(all_cols):
                if c not in st:
                    gid |= 1 << (width - 1 - i)
            gid_to_set[gid] = frozenset(st)
        out.update(
            {
                gid_to_set[r["__gid"]]: (
                    int(r["__d"]),
                    int(r["__p"]),
                    int(r["__n"]),
                )
                for r in rows
            }
        )
    return out


def mine_fds(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 2,
) -> list[tuple[tuple[str, ...], str]]:
    """Minimal exact FDs with |LHS| <= max_lhs, TANE semantics (tane.cpp
    lattice levels; criterion fd_verifier.cpp:55-65): lhs -> C holds iff
    D(lhs) == D(lhs + {C}), NULL a value.

    Level 0 emits ((), C) for constant columns; level k emits lhs -> C only
    when no proper LHS subset (incl. the empty set) determines C -- the
    textbook minimality rule. TANE-style pruning: constant columns never
    appear in an LHS, an LHS with an internal FD (some member determined by
    the rest) is skipped outright (its partition equals the smaller set's),
    supersets of a discovered KEY (D == n) are never expanded, and only the
    supersets of surviving candidates are ever counted.

    ONE batched grouping-sets job per lattice level regardless of column
    count: the first pass covers the empty set + singles + pairs (levels 0
    and 1); each further level counts only the apriori-surviving candidate
    sets not already cached from the previous level's supersets. Candidate
    width grows combinatorially with max_lhs (C(p, k) * (p - k) before
    pruning); ``_lattice_counts`` bounds the per-job Expand width, so a deep
    mine is many bounded jobs, never one unbounded one.
    """
    columns = list(columns or df.columns)
    sets1 = [()] + [(c,) for c in columns]
    if max_lhs >= 1 and len(columns) >= 2:
        sets1 += list(combinations(columns, 2))
    counts = _lattice_counts(df, sets1)
    n = counts[frozenset()][2]

    def d(st) -> int:
        return counts[st if isinstance(st, frozenset) else frozenset(st)][0]

    out: list[tuple[tuple[str, ...], str]] = []
    # minimal determining sets found so far, per RHS (frozenset() = constant)
    minimal_by_rhs: dict[str, list[frozenset]] = {}

    def covered(rhs: str, lhs_set: frozenset) -> bool:
        return any(m <= lhs_set for m in minimal_by_rhs.get(rhs, ()))

    constants = {c for c in columns if d((c,)) == 1}
    for c in sorted(constants):
        out.append(((), c))
        minimal_by_rhs.setdefault(c, []).append(frozenset())
    nonconst = [c for c in columns if c not in constants]
    keys: list[frozenset] = []
    for k in range(1, max_lhs + 1):
        if len(nonconst) < k + 1:
            break
        # apriori candidates: no proper-subset key, no internal FD, and at
        # least one RHS not already afforded by a subset
        cands: list[tuple[tuple[str, ...], list[str]]] = []
        for lhs in combinations(nonconst, k):
            ls = frozenset(lhs)
            if any(key < ls for key in keys):
                continue
            if any(covered(b, ls - {b}) for b in lhs):
                continue
            rhss = [c for c in nonconst if c not in ls and not covered(c, ls)]
            if rhss:
                cands.append((lhs, rhss))
        if not cands:
            break
        need = set()
        for lhs, rhss in cands:
            ls = frozenset(lhs)
            if ls not in counts:
                need.add(tuple(sorted(lhs)))
            for c in rhss:
                if ls | {c} not in counts:
                    need.add(tuple(sorted(lhs + (c,))))
        if need:
            counts.update(_lattice_counts(df, sorted(need)))
        for lhs, rhss in cands:
            ls = frozenset(lhs)
            dl = d(ls)
            if dl == n:
                keys.append(ls)
            for c in rhss:
                if dl == d(ls | {c}):
                    out.append((lhs, c))
                    minimal_by_rhs.setdefault(c, []).append(ls)
    return sorted(out)


def _g1_for_candidate(
    df: DataFrame, lhs: tuple[str, ...], rhs: str, measure: str
) -> float:
    """g1 or (1 - pdep) error of lhs -> rhs (afd_measures.cpp:6-130; the same
    closed forms checks/fd.py::afd_measures uses):
      g1       = (sum_x cx(cx-1) - sum_xy cxy(cxy-1)) / (n^2 - n)
      1 - pdep = 1 - (1/n) sum_xy cxy^2 / cx
    One groupBy(lhs+rhs) shuffle; the re-aggregation by lhs runs on the
    already-reduced counts. Empty LHS degenerates to one global group."""
    keys = [F.col(c) for c in lhs] + [F.col(rhs)]
    xy = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cxy"))
    x = xy.groupBy(*[F.col(c) for c in lhs]).agg(
        F.sum("cxy").alias("cx"),
        F.sum(F.col("cxy") * (F.col("cxy") - 1)).alias("yp"),
        F.sum(F.col("cxy") * F.col("cxy")).alias("y2"),
    )
    row = x.agg(
        F.sum("cx").alias("n"),
        F.sum(F.col("cx") * (F.col("cx") - 1) - F.col("yp")).alias("conflict"),
        F.sum(F.col("y2") / F.col("cx").cast("double")).alias("pdep_num"),
    ).collect()[0]
    n = float(row["n"])
    if n <= 1:
        return 0.0
    if measure == "g1":
        return float(row["conflict"]) / (n * n - n)
    return 1.0 - float(row["pdep_num"]) / n


def mine_afds(
    df: DataFrame,
    columns: list[str] | None = None,
    max_error: float = 0.05,
    measure: str = "g1",
    max_lhs: int = 2,
    parallelism: int = 8,
) -> list[tuple[tuple[str, ...], str, float]]:
    """Minimal approximate FDs with |LHS| <= max_lhs under an error budget,
    the TANE-with-error lattice the reference's AFD benchmark gates exercise
    (fd_benchmark.h:40-49). ``measure`` is 'g1' (violating row pairs / all
    pairs) or 'pdep' (error = 1 - pdep); both are monotone non-increasing as
    the LHS grows, so level-wise minimality pruning (skip any RHS already
    afforded by a subset, including the empty LHS) is exact, not heuristic.

    For g1 the error is a pure per-set difference,
        g1(X -> C) = (P(X) - P(X + {C})) / (n^2 - n),
    with P(S) the equal-row-pair count of set S (afd_measures.cpp:6-130:
    sum_x cx(cx-1) - sum_xy cxy(cxy-1) telescopes to exactly this), so the
    WHOLE lattice costs ONE batched grouping-sets job per level like
    :func:`mine_fds` -- empty+singles+pairs first, then each further level
    counts only the minimality-surviving candidates. pdep mixes levels
    (sum cxy^2 / cx) and keeps the per-candidate thread-pooled jobs, also
    walked level-wise to arbitrary max_lhs.

    Returns sorted (lhs_tuple, rhs, error) with error <= max_error and no
    qualifying proper subset.
    """
    if measure not in ("g1", "pdep"):
        raise ValueError("measure must be 'g1' or 'pdep'")
    columns = list(columns or df.columns)
    if measure == "g1":
        return _mine_afds_g1(df, columns, max_error, max_lhs)
    return _mine_afds_jobs(df, columns, max_error, measure, max_lhs, parallelism)


def _mine_afds_g1(
    df: DataFrame, columns: list[str], max_error: float, max_lhs: int
) -> list[tuple[tuple[str, ...], str, float]]:
    sets1 = [()] + [(c,) for c in columns]
    if max_lhs >= 1 and len(columns) >= 2:
        sets1 += list(combinations(columns, 2))
    counts = _lattice_counts(df, sets1)
    _, p_empty, n = counts[frozenset()]
    denom = float(n) * n - n
    if denom <= 0:
        return []

    def p(st) -> int:
        return counts[st if isinstance(st, frozenset) else frozenset(st)][1]

    out: list[tuple[tuple[str, ...], str, float]] = []
    # minimal qualifying LHS sets per RHS (frozenset() = level-0 qualifier).
    # Level-0 qualifiers leave the RHS pool only, NOT the LHS pool -- unlike
    # an exactly-constant column, a merely NEAR-constant one still refines
    # partitions, so e.g. (q,) -> r can be minimal while () -> q qualifies.
    # (Found by the 60-example property soak.)
    qual_by_rhs: dict[str, list[frozenset]] = {}
    for c in columns:
        err = (p_empty - p((c,))) / denom
        if err <= max_error:
            qual_by_rhs.setdefault(c, []).append(frozenset())
            out.append(((), c, err))
    for k in range(1, max_lhs + 1):
        if len(columns) < k + 1:
            break
        cands: list[tuple[tuple[str, ...], list[str]]] = []
        for lhs in combinations(columns, k):
            ls = frozenset(lhs)
            rhss = [
                c
                for c in columns
                if c not in ls
                and not any(m <= ls for m in qual_by_rhs.get(c, ()))
            ]
            if rhss:
                cands.append((lhs, rhss))
        if not cands:
            break
        need = set()
        for lhs, rhss in cands:
            ls = frozenset(lhs)
            if ls not in counts:
                need.add(tuple(sorted(lhs)))
            for c in rhss:
                if ls | {c} not in counts:
                    need.add(tuple(sorted(lhs + (c,))))
        if need:
            counts.update(_lattice_counts(df, sorted(need)))
        for lhs, rhss in cands:
            ls = frozenset(lhs)
            pl = p(ls)
            for c in rhss:
                err = (pl - p(ls | {c})) / denom
                if err <= max_error:
                    out.append((lhs, c, err))
                    qual_by_rhs.setdefault(c, []).append(ls)
    return sorted(out)


def _mine_afds_jobs(
    df: DataFrame,
    columns: list[str],
    max_error: float,
    measure: str,
    max_lhs: int,
    parallelism: int,
) -> list[tuple[tuple[str, ...], str, float]]:
    """Per-candidate job path (pdep): one groupBy(lhs+rhs) shuffle each,
    submitted from ``parallelism`` driver threads."""
    from concurrent.futures import ThreadPoolExecutor

    def run(cands: list[tuple[tuple[str, ...], str]]):
        def one(c):
            lhs, rhs = c
            return lhs, rhs, _g1_for_candidate(df, lhs, rhs, measure)

        if parallelism > 1 and len(cands) > 1:
            with ThreadPoolExecutor(max_workers=parallelism) as ex:
                return list(ex.map(one, cands))
        return [one(c) for c in cands]

    out: list[tuple[tuple[str, ...], str, float]] = []
    # minimal qualifying LHS sets per RHS; frozenset() = level-0 qualifier
    # (near-constant columns leave the RHS pool only -- they still refine
    # partitions as LHS components, see _mine_afds_g1).
    qual_by_rhs: dict[str, list[frozenset]] = {}
    for k in range(0, max_lhs + 1):
        if len(columns) < k + 1:
            break
        cands = [
            (lhs, c)
            for lhs in combinations(columns, k)
            for c in columns
            if c not in lhs
            and not any(
                m <= frozenset(lhs) for m in qual_by_rhs.get(c, ())
            )
        ]
        if not cands:
            break
        for lhs, rhs, err in run(cands):
            if err <= max_error:
                out.append((lhs, rhs, err))
                qual_by_rhs.setdefault(rhs, []).append(frozenset(lhs))
    return sorted(out)


def mine_nary_inds(
    tables: dict[str, DataFrame],
    max_arity: int = 3,
    unary: list[tuple[str, str]] | None = None,
    parallelism: int = 8,
    max_error: float = 0.0,
    verify_fn=None,
) -> list:
    """Exact n-ary INDs, Mind's full GenNext lattice (mind.cpp:69-144,
    "Unary and n-ary inclusion dependency discovery" Algorithm 3): two
    level-k INDs p, q join when both sides share their (k-1)-prefix
    (IND::StartsWith), p's last LHS column index precedes q's and the last
    RHS columns differ; the joined candidate is rejected when its sides
    share a column on the same table (HaveIndicesIntersection,
    column_combination.cpp:20-33) or, at arity >= 3, when any drop-one
    projection is absent from the previous level (CanPruneCandidate).
    Survivors verify exactly -- one distinct-projection anti-join each
    (checks/ind.py), submitted from ``parallelism`` driver threads.

    Returns [((table, (cols...)), (table, (cols...)))] over ALL arities up
    to ``max_arity``, sorted. Column order inside a side is by column
    index, like the reference's ColumnCombination.

    ``max_error`` > 0 switches to Mind's approximate mode
    (Mind::TestCandidate, mind.cpp:167-207): a candidate is kept when the
    fraction of its distinct LHS projections absent from the RHS is
    <= max_error (the same g3' the unary level uses), the lattice grows
    from ALL kept candidates (approximate parents included), and the
    return value carries the error: [((table, cols), (table, cols),
    error), ...].  The default unary seed switches to
    :func:`mine_ainds` accordingly.

    ``verify_fn`` swaps the exact anti-join for a custom candidate test
    (FAIDA's sketch register inclusion, compat.Faida): a callable
    ``((table, lcols), (table, rcols)) -> bool``; the lattice mechanics
    are unchanged.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark_validator.checks.ind import ind_check

    col_idx = {
        (t, c): i for t, df in tables.items() for i, c in enumerate(df.columns)
    }
    approx = max_error > 0.0
    errors: dict = {}
    if unary is None:
        if approx:
            mined = mine_ainds(tables, max_error=max_error)
            unary = [(a, b) for a, b, _ in mined]
            unary_errs = {(a, b): e for a, b, e in mined}
        else:
            unary = mine_unary_inds(tables)
            unary_errs = {}
    else:
        unary_errs = {}

    def split(attr):
        t, c = attr.split(".", 1)
        return t, c

    level = sorted(
        ((split(a)[0], (split(a)[1],)), (split(b)[0], (split(b)[1],)))
        for a, b in unary
    )
    for (a, b), e in unary_errs.items():
        lt, lc = split(a)
        rt, rc = split(b)
        errors[((lt, (lc,)), (rt, (rc,)))] = e
    results = list(level)
    arity = 1
    while level and arity < max_arity:
        prev_set = set(level)
        cands = []
        for p in level:
            (plt, plc), (prt, prc) = p
            for q in level:
                (qlt, qlc), (qrt, qrc) = q
                if plt != qlt or prt != qrt:
                    continue
                if plc[:-1] != qlc[:-1] or prc[:-1] != qrc[:-1]:
                    continue
                if not (
                    col_idx[(plt, plc[-1])] < col_idx[(qlt, qlc[-1])]
                    and prc[-1] != qrc[-1]
                ):
                    continue
                cand = ((plt, plc + (qlc[-1],)), (prt, prc + (qrc[-1],)))
                if plt == prt and set(cand[0][1]) & set(cand[1][1]):
                    continue
                if arity + 1 >= 3:
                    k = arity + 1
                    if any(
                        (
                            (plt, cand[0][1][:i] + cand[0][1][i + 1 :]),
                            (prt, cand[1][1][:i] + cand[1][1][i + 1 :]),
                        )
                        not in prev_set
                        for i in range(k)
                    ):
                        continue
                cands.append(cand)

        def verify(cand):
            if verify_fn is not None:
                return cand, bool(verify_fn(cand)), 0.0
            (ta, lcols), (tb, rcols) = cand
            chk = ind_check(tables[ta], list(lcols), tables[tb], list(rcols))
            row = chk.summary().collect()[0]
            if approx:
                err = float(row["error"] or 0.0)
                return cand, err <= max_error, err
            return cand, bool(row["holds"]), 0.0

        if parallelism > 1 and len(cands) > 1:
            with ThreadPoolExecutor(max_workers=parallelism) as ex:
                judged = list(ex.map(verify, cands))
        else:
            judged = [verify(c) for c in cands]
        level = sorted(c for c, ok, _ in judged if ok)
        for c, ok, e in judged:
            if ok:
                errors[c] = e
        results.extend(level)
        arity += 1
    if approx:
        return sorted((l, r, errors.get((l, r), 0.0)) for l, r in results)
    return sorted(results)


def mine_binary_inds(
    tables: dict[str, DataFrame],
    unary: list[tuple[str, str]] | None = None,
    parallelism: int = 8,
    with_verdicts: bool = False,
) -> list:
    """Binary (n=2) exact INDs across ``tables``, Mind's level-2 step
    (mind.cpp:209-261 MineNaryINDs): apriori candidates from the unary level
    -- (A1, A2) subseteq (B1, B2) is possible only if A1 subseteq B1 AND
    A2 subseteq B2 hold between the same table pair with distinct columns --
    each verified exactly by one distinct-projection anti-join
    (checks/ind.py semantics: a candidate holds iff no distinct LHS pair is
    absent from the RHS pairs). Returns
    [(('tbl.a1', 'tbl.a2'), ('tbl.b1', 'tbl.b2')), ...] sorted.

    Candidate counts are pruned hard by the unary level (the reference's own
    observation: real-world n-ary IND counts collapse after level 1), so the
    per-candidate jobs are few; they are submitted from ``parallelism``
    driver threads. ``with_verdicts=True`` returns every apriori candidate
    with its verdict, [(lhs, rhs, holds)], instead of only the survivors.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark_validator.checks.ind import ind_check

    if unary is None:
        unary = mine_unary_inds(tables)
    uset = set(unary)

    def split(attr):
        t, c = attr.split(".", 1)
        return t, c

    # apriori: pair two unary INDs sharing the same (lhs table, rhs table)
    cands = []
    for (a1, b1) in unary:
        for (a2, b2) in unary:
            ta1, ca1 = split(a1)
            ta2, ca2 = split(a2)
            tb1, cb1 = split(b1)
            tb2, cb2 = split(b2)
            if ta1 != ta2 or tb1 != tb2:
                continue
            if ca1 >= ca2 or cb1 == cb2:  # ordered LHS pair, distinct RHS cols
                continue
            # the mirrored orientation must also be unary-valid
            if (a2, b2) not in uset:
                continue
            cands.append(((ta1, ca1, ca2), (tb1, cb1, cb2)))

    def verify(cand):
        (ta, a1, a2), (tb, b1, b2) = cand
        chk = ind_check(tables[ta], [a1, a2], tables[tb], [b1, b2])
        holds = bool(chk.summary().collect()[0]["holds"])
        return cand, holds

    if parallelism > 1 and len(cands) > 1:
        with ThreadPoolExecutor(max_workers=parallelism) as ex:
            judged = list(ex.map(verify, cands))
    else:
        judged = [verify(c) for c in cands]
    if with_verdicts:
        return sorted(
            (
                (f"{ta}.{a1}", f"{ta}.{a2}"),
                (f"{tb}.{b1}", f"{tb}.{b2}"),
                holds,
            )
            for ((ta, a1, a2), (tb, b1, b2)), holds in judged
        )
    out = [
        ((f"{ta}.{a1}", f"{ta}.{a2}"), (f"{tb}.{b1}", f"{tb}.{b2}"))
        for ((ta, a1, a2), (tb, b1, b2)), holds in judged
        if holds
    ]
    return sorted(out)


# ---------------------------------------------------------------------------
# Association-rule mining (Apriori, ar/apriori/apriori.h) over (tid, item)
# ---------------------------------------------------------------------------


def _apriori_gen(prev: list[frozenset], k: int) -> list[frozenset]:
    """Classic candidate generation: join (k-1)-itemsets sharing a sorted
    (k-2)-prefix, prune candidates with any infrequent (k-1)-subset
    (apriori.cpp GenerateCandidates semantics)."""
    prev_set = set(prev)
    sorted_prev = sorted(tuple(sorted(s)) for s in prev)
    out = []
    for i, a in enumerate(sorted_prev):
        for b in sorted_prev[i + 1 :]:
            if a[: k - 2] != b[: k - 2]:
                break
            cand = frozenset(a) | frozenset(b)
            if len(cand) == k and all(
                cand - {x} in prev_set for x in cand
            ):
                out.append(cand)
    return out


def _frequent_counts(
    df: DataFrame,
    tid_col: str,
    item_col: str,
    minsup: float,
    max_len: int | None,
    method: str,
    max_candidates_per_job: int,
) -> tuple[dict[frozenset, int], int]:
    """Frequent itemsets as {itemset: transaction count}, plus N = #distinct
    transactions. support(S) = count / N >= minsup (transactional model of
    model/transaction/transactional_data.h: duplicate items within a
    transaction collapse).

    method='apriori' is the reference-shaped level-wise walk, Spark-first:
    ONE shuffle builds the per-transaction item sets; every level is batched
    wide aggregations over that cached frame (sum of contains-all flags per
    candidate, <= max_candidates_per_job per job -- map-side combinable, no
    further shuffles, the same bounded-width pattern as _lattice_counts).
    method='fpgrowth' delegates the itemset search to Spark ML's distributed
    FP-growth (pyspark.ml.fpm.FPGrowth) -- the scale path when the frequent
    lattice is deep -- and reports identical counts."""
    tx = df.groupBy(tid_col).agg(
        F.collect_set(F.col(item_col).cast("string")).alias("__items")
    )
    tx = tx.persist()
    try:
        n = tx.count()
        if n == 0:
            return {}, 0
        if method == "fpgrowth":
            from pyspark.ml.fpm import FPGrowth

            model = FPGrowth(
                itemsCol="__items", minSupport=minsup, minConfidence=1.0
            ).fit(tx)
            counts = {
                frozenset(r["items"]): int(r["freq"])
                for r in model.freqItemsets.collect()
                if max_len is None or len(r["items"]) <= max_len
            }
            return counts, n
        if method != "apriori":
            raise ValueError("method must be 'apriori' or 'fpgrowth'")
        l1 = (
            tx.select(F.explode("__items").alias("i"))
            .groupBy("i")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        counts = {
            frozenset([r["i"]]): int(r["cnt"])
            for r in l1
            if r["cnt"] / n >= minsup
        }
        prev = list(counts)
        k = 2
        while prev and (max_len is None or k <= max_len):
            cands = _apriori_gen(prev, k)
            if not cands:
                break
            level: dict[frozenset, int] = {}
            for lo in range(0, len(cands), max_candidates_per_job):
                batch = cands[lo : lo + max_candidates_per_job]
                row = tx.agg(
                    *[
                        F.sum(
                            (
                                F.size(
                                    F.array_intersect(
                                        F.col("__items"),
                                        F.array(
                                            *[F.lit(x) for x in sorted(s)]
                                        ),
                                    )
                                )
                                == k
                            ).cast("long")
                        ).alias(f"c_{j}")
                        for j, s in enumerate(batch)
                    ]
                ).collect()[0]
                for j, s in enumerate(batch):
                    if int(row[j]) / n >= minsup:
                        level[s] = int(row[j])
            counts.update(level)
            prev = list(level)
            k += 1
        return counts, n
    finally:
        tx.unpersist()


def mine_frequent_itemsets(
    df: DataFrame,
    tid_col: str = "tid",
    item_col: str = "item",
    minsup: float = 0.1,
    max_len: int | None = None,
    method: str = "apriori",
    max_candidates_per_job: int = 256,
) -> dict[frozenset, float]:
    """Frequent itemsets with support >= minsup over (tid, item) rows,
    Apriori semantics (ar/apriori/apriori.h GetFrequentList). Returns
    {itemset: support}."""
    counts, n = _frequent_counts(
        df, tid_col, item_col, minsup, max_len, method, max_candidates_per_job
    )
    return {s: c / n for s, c in counts.items()}


def mine_ars(
    df: DataFrame,
    tid_col: str = "tid",
    item_col: str = "item",
    minsup: float = 0.1,
    minconf: float = 0.5,
    max_len: int | None = None,
    method: str = "apriori",
    max_candidates_per_job: int = 256,
) -> list[tuple[tuple[str, ...], tuple[str, ...], float, float]]:
    """Association rules lhs -> rhs (both sides non-empty, multi-item
    consequents included) from every frequent itemset, Apriori rule
    generation (ar_algorithm.cpp GenerateRulesFrom): confidence =
    supp(lhs u rhs) / supp(lhs) >= minconf. Confidence is computed from the
    exact transaction COUNTS (no float-division drift in the threshold).
    Returns sorted (lhs, rhs, support, confidence); checks/ar.py::ar_check
    verifies any single rule with matching support/confidence definitions
    (ar_stats_calculator.cpp:33-70)."""
    counts, n = _frequent_counts(
        df, tid_col, item_col, minsup, max_len, method, max_candidates_per_job
    )
    rules = []
    for z, cz in counts.items():
        if len(z) < 2:
            continue
        for r in range(1, len(z)):
            for lhs in combinations(sorted(z), r):
                a = frozenset(lhs)
                ca = counts[a]  # every subset of a frequent set is frequent
                if cz * 1.0 / ca >= minconf:
                    rules.append(
                        (
                            tuple(sorted(a)),
                            tuple(sorted(z - a)),
                            cz / n,
                            cz / ca,
                        )
                    )
    return sorted(rules)
