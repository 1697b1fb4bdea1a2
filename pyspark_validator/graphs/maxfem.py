"""MaxFEM: maximal frequent (composite) episode mining over a timed event
sequence.

Reference semantics (fem/maxfem/maxfem.cpp + model/*), replayed exactly:

  * Event support = number of event SETS containing the event; infrequent
    events are removed and the rest densely re-mapped in ascending event
    order (RemoveInfrequentEvents uses an ordered std::map).
  * Frequent parallel episodes: depth-first extension of event sets by
    strictly larger events, support = |intersection of location lists|
    (FindFrequentParallelEpisodesRecursive; a location list is the sorted
    timestamp list of the sets containing every episode event).
  * Composite episodes: sequences of parallel episodes matched through BOUND
    LISTS -- a bound (start, end) per supporting window. Extending a bound
    list by a seed's location list walks both sorted lists once: a location
    <= the current bound's end is consumed; one >= window_length past the
    bound's start expires the bound (a "miss", at most |bl| - min_support
    allowed); otherwise the bound closes at that location
    (bound_list.cpp::Extend).
  * An episode is MAXIMAL when no seed extends it frequently; among the
    collected candidates, any episode STRICTLY contained in another candidate
    (fewer events, and its event sets order-embeddable into the other's via
    subset inclusion -- composite_episode.cpp::StrictlyContains) is dropped
    (max_episodes_collection.cpp). Results report the episode's event sets
    (original event ids) and its final support.

Scale split: the sequence scan -- event census and location lists -- is the
data-sized part and runs as DataFrame aggregations (`event_location_lists`,
`parallel_episode_supports`); the episode lattice is bounded by the frequent
pattern count, not the sequence length, and runs driver-side over the
(numpy-backed) location lists exactly like the reference's thread pool. At
corpus scale the same mining decomposes over sequence SEGMENTS with a
window_length halo (every bound spans < window_length, so segment-local bound
lists with start-timestamp ownership partition the global one); that variant
rides mapInPandas over range-partitioned segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Spark-side sequence scans
# --------------------------------------------------------------------------


def event_location_lists(
    df: DataFrame, ts_col: str = "ts", event_col: str = "event"
) -> DataFrame:
    """Per-event sorted location list + support: ONE aggregation over the
    (timestamp, event) rows; map-side combine keeps hot events cheap."""
    return df.groupBy(event_col).agg(
        F.sort_array(F.collect_set(ts_col)).alias("locations"),
        F.count_distinct(ts_col).alias("support"),
    )


def parallel_episode_supports(
    df: DataFrame,
    ts_col: str = "ts",
    event_col: str = "event",
    min_support: int = 1,
    max_size: int = 2,
) -> DataFrame:
    """Supports of size-1 and size-2 parallel episodes as a DataFrame op:
    support(A) = #sets containing A, support(A, B) = #sets containing both
    (the |location-list intersection| of parallel_episode.cpp for pairs).
    Output rows (event_a, event_b, support) with event_b NULL for singletons;
    the pair branch is one self-join on the timestamp key followed by one
    aggregation."""
    if max_size not in (1, 2):
        raise ValueError("parallel_episode_supports caps at pair episodes")
    base = df.select(
        F.col(ts_col).alias("__ts"), F.col(event_col).alias("__ev")
    ).dropDuplicates(["__ts", "__ev"])
    singles = base.groupBy("__ev").agg(F.count(F.lit(1)).alias("support")).select(
        F.col("__ev").alias("event_a"),
        F.lit(None).cast("long").alias("event_b"),
        "support",
    )
    out = singles
    if max_size == 2:
        left = base.select(F.col("__ts"), F.col("__ev").alias("__ea"))
        right = base.select(F.col("__ts"), F.col("__ev").alias("__eb"))
        pairs = (
            left.join(right, "__ts")
            .filter(F.col("__ea") < F.col("__eb"))
            .groupBy("__ea", "__eb")
            .agg(F.count(F.lit(1)).alias("support"))
            .select(
                F.col("__ea").alias("event_a"),
                F.col("__eb").alias("event_b"),
                "support",
            )
        )
        out = singles.unionByName(pairs)
    return out.filter(F.col("support") >= F.lit(int(min_support)))


# --------------------------------------------------------------------------
# Exact MaxFEM (driver-side lattice over location lists)
# --------------------------------------------------------------------------


def _intersect_sorted(a: list[int], b: list[int]) -> list[int]:
    out, i, j = [], 0, 0
    while i < len(a) and j < len(b):
        if a[i] < b[j]:
            i += 1
        elif b[j] < a[i]:
            j += 1
        else:
            out.append(a[i])
            i += 1
            j += 1
    return out


def _extend_bound_list(
    bl: list[tuple[int, int]],
    locs: list[int],
    min_support: int,
    window_length: int,
) -> list[tuple[int, int]] | None:
    """bound_list.cpp::Extend, verbatim two-pointer walk."""
    max_misses = len(bl) - min_support
    misses = 0
    new_bounds: list[tuple[int, int]] = []
    i = j = 0
    while i < len(bl) and j < len(locs):
        start, end = bl[i]
        other = locs[j]
        if other <= end:
            j += 1
        elif other - start >= window_length:
            i += 1
            misses += 1
            if misses > max_misses:
                return None
        else:
            new_bounds.append((start, other))
            i += 1
    if len(new_bounds) < min_support:
        return None
    return new_bounds


def _strictly_contains(
    a_seq: list[tuple[int, ...]], b_seq: list[tuple[int, ...]]
) -> bool:
    """composite_episode.cpp::StrictlyContains (sets as sorted tuples)."""
    a_count = sum(len(s) for s in a_seq)
    b_count = sum(len(s) for s in b_seq)
    if a_count <= b_count:
        return False
    i = j = 0
    while i < len(a_seq) and j < len(b_seq):
        if set(b_seq[j]) <= set(a_seq[i]):
            j += 1
            if j == len(b_seq):
                return True
        i += 1
        if i >= len(a_seq):
            return False
        if len(a_seq) - i < len(b_seq) - j:
            return False
    return j == len(b_seq)


def mine_max_episodes(
    records: list[tuple[int, list[int]]],
    min_support: int,
    window_length: int,
) -> list[tuple[list[list[int]], int]]:
    """MaxFEM::ExecuteInternal over parsed (timestamp, sorted-unique events)
    records (see io.parse_sequence_text). Returns the maximal frequent
    composite episodes as (list of event lists, support), events in their
    original ids."""
    # 1. event census + dense remap in ascending event order
    support: dict[int, int] = {}
    for _ts, events in records:
        for e in events:
            support[e] = support.get(e, 0) + 1
    frequent = sorted(e for e, s in support.items() if s >= min_support)
    remap = {e: i for i, e in enumerate(frequent)}
    reverse = frequent
    m = len(frequent)

    # 2. location lists (timestamps ascend by the input contract)
    loc_lists: list[list[int]] = [[] for _ in range(m)]
    for ts, events in records:
        for e in events:
            if e in remap:
                loc_lists[remap[e]].append(ts)

    # 3. frequent parallel episodes (recursion results first, then the
    #    single-event seeds -- FindFrequentParallelEpisodes order)
    results: list[tuple[tuple[int, ...], list[int]]] = []

    def grow(events: tuple[int, ...], locs: list[int]) -> None:
        for e in range(events[-1] + 1, m):
            merged = _intersect_sorted(locs, loc_lists[e])
            if len(merged) >= min_support:
                grow(events + (e,), merged)
                results.append((events + (e,), merged))

    singles = [((e,), loc_lists[e]) for e in range(m)]
    for events, locs in singles:
        grow(events, locs)
    parallel_episodes = results + singles

    # 4. composite search: every parallel episode seeds a task; extension by
    #    every seed through the bound list; locally-maximal episodes collected
    candidates: list[tuple[list[tuple[int, ...]], int]] = []

    def search(
        seq: list[tuple[int, ...]], bl: list[tuple[int, int]]
    ) -> None:
        is_max = True
        for ev2, locs2 in parallel_episodes:
            ext = _extend_bound_list(bl, locs2, min_support, window_length)
            if ext is not None:
                is_max = False
                search(seq + [ev2], ext)
        if is_max:
            candidates.append((seq, len(bl)))

    for events, locs in parallel_episodes:
        search([events], [(t, t) for t in locs])

    # 5. global maximality (the MaxEpisodesCollection pruning reduces to:
    #    drop any candidate strictly contained in another candidate)
    kept: list[tuple[list[tuple[int, ...]], int]] = []
    for i, (seq, sup) in enumerate(candidates):
        contained = any(
            _strictly_contains(other_seq, seq)
            for j, (other_seq, _s) in enumerate(candidates)
            if j != i
        )
        if not contained:
            kept.append((seq, sup))

    return [
        ([[reverse[e] for e in s] for s in seq], sup) for seq, sup in kept
    ]
