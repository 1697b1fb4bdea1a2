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
    """All exact unary FDs A -> B (A determines B). One wide aggregation."""
    columns = columns or df.columns
    pairs = list(permutations(columns, 2))
    # distinct(A,B) is symmetric: compute each unordered pair once
    unordered = list(combinations(columns, 2))
    counts = _distinct_counts(df, columns, unordered, approx)
    out = []
    for a, b in pairs:
        ab = counts.get(f"{a}__{b}", counts.get(f"{b}__{a}"))
        if ab == counts[a]:
            out.append((a, b))
    return sorted(out)


def mine_uccs(
    df: DataFrame,
    columns: list[str] | None = None,
    max_arity: int = 2,
    approx: bool = False,
) -> list[tuple[str, ...]]:
    """Minimal UCCs of arity <= max_arity: candidate sets whose distinct count
    equals the row count, pruned by minimality (supersets of a UCC skipped)."""
    columns = columns or df.columns
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
    cols = []
    for tname, df in tables.items():
        for c in df.columns:
            cols.append((tname, c, df))
    tagged = None
    for tname, c, df in cols:
        part = df.select(
            F.col(c).cast("string").alias("value"),
            F.lit(f"{tname}.{c}").alias("attr"),
        ).where(F.col(c).isNotNull()).distinct()
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
    j = pair_counts.join(totals, on="a")
    inds = j.filter(F.col("together") == F.col("n_values")).select("a", "b")
    return sorted((r.a, r.b) for r in inds.collect())


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

    One wide aggregation computes every single and pairwise distinct count
    (the per-pair 4-count agg the verifier would run is injected from it);
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
    counts = _distinct_counts(df, columns, pairs, approx)
    n = df.count()
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
