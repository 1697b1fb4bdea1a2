"""ORDER: list-based order-dependency discovery (the reference's Order miner).

Reference semantics (od/order/order.cpp, list_lattice.cpp,
dependency_checker.cpp, sorted_partitions.cpp): attributes are LISTS (order
matters); lhs -> rhs is valid when the rhs sorted partition refines the lhs
sorted partition order-compatibly -- CheckForSwap's walk returns kValid when
every lhs equivalence class is a union of consecutive rhs classes, kMerge
when an rhs class spans lhs classes (fixable by extending the rhs list, so
the candidate survives), kSwap on a crossing (permanently invalid, candidate
erased). The search walks a list lattice level by level with prefix-block
joins (list_lattice.cpp:78-104), minimality and merge pruning
(order.cpp:139-308), rows null-or-empty in ANY ordered column dropped
globally (order_utility.cpp:60-75), and constant columns short-circuited as
valid -> every other attribute (order.cpp:38-50).

Spark-first design -- validity is decided entirely by the relation between
VALUE combinations, never by row identity: two rows with identical
projections behave identically in every sorted partition, so collapsing the
table to its distinct combos (with counts, for the lhs-uniqueness test
order.cpp:170-173) preserves every subset/equality relation CheckForSwap
inspects, and the size-driven branch choice inside the walk is invariant
under the collapse (a proper subset has strictly fewer rows AND strictly
fewer combos; equal sets take either branch to the same outcome). The
distributed plan is therefore:

  1. ONE filter+groupBy over the projected columns collapses the table to
     its distinct value combos with counts -- the only pass over raw rows,
     a single map-side-combinable shuffle bounded by the combo count.
  2. The lattice walk, sorted-partition intersects and CheckForSwap replay
     the reference verbatim on the combo table -- driver-side set algebra
     bounded by pattern counts, independent of n.

At 100 TB the combo count is the real capacity knob (``max_combos`` guards
the collect); ORDER over near-unique columns is inherently driver-heavy in
the reference too -- its partitions hold one row per class.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VALID, _MERGE, _SWAP = 0, 1, 2


# ---------------------------------------------------------------------------
# exact replicas of the reference's partition algebra (combo-id element space)
# ---------------------------------------------------------------------------

def _check_for_swap(l_classes: list[frozenset], r_classes: list[frozenset]) -> int:
    """dependency_checker.cpp:25-66 verbatim: walk both ordered class
    sequences, mutating local copies exactly like SubsetSetDifference."""
    res = _VALID
    l_i = r_i = 0
    next_l = next_r = True
    l_eq: set = set()
    r_eq: set = set()
    while l_i < len(l_classes) and r_i < len(r_classes):
        if next_l:
            l_eq = set(l_classes[l_i])
        if next_r:
            r_eq = set(r_classes[r_i])
        if len(l_eq) < len(r_eq):
            if not l_eq <= r_eq:
                return _SWAP
            r_eq -= l_eq
            res = _MERGE
            l_i += 1
            next_l = True
            next_r = False
        else:
            if not r_eq <= l_eq:
                return _SWAP
            l_eq -= r_eq
            r_i += 1
            next_r = True
            if not l_eq:
                l_i += 1
                next_l = True
            else:
                next_l = False
    return res


def _intersect(l_classes: list[frozenset], r_classes: list[frozenset]) -> list[frozenset]:
    """SortedPartition::Intersect (sorted_partitions.cpp:50-69): refine each
    multi-element lhs class by the rhs partition, subclasses emitted in rhs
    class order; singleton classes pass through unsplit."""
    pos_of = {}
    for j, rc in enumerate(r_classes):
        for e in rc:
            pos_of[e] = j
    out: list[frozenset] = []
    for cls in l_classes:
        if len(cls) == 1:
            out.append(cls)
            continue
        sub: dict[int, set] = {}
        for e in cls:
            sub.setdefault(pos_of[e], set()).add(e)
        for j in sorted(sub):
            out.append(frozenset(sub[j]))
    return out


def _get_prefixes(node: tuple) -> list[tuple]:
    """order_utility.cpp:21-28: every proper non-empty prefix."""
    return [node[:i] for i in range(1, len(node))]


def _max_prefix(attrs: tuple) -> tuple:
    return attrs[:-1]


def _in_map(m: dict, lhs: tuple, rhs: tuple) -> bool:
    return lhs in m and rhs in m[lhs]


def _are_disjoint(a: tuple, b: tuple) -> bool:
    return not (set(a) & set(b))


def _search(hay: tuple, needle: tuple, start: int = 0, end: int | None = None) -> int:
    """std::search on [start, end): FIRST occurrence of the contiguous
    subsequence, -1 when absent."""
    end = len(hay) if end is None else end
    n = len(needle)
    for i in range(start, end - n + 1):
        if hay[i : i + n] == needle:
            return i
    return -1


@dataclass
class OrderResult:
    """Discovery output mirroring Order::GetValidODs (order.h:49-51):
    ``valid`` maps each lhs attribute LIST (tuple of indices into
    ``columns``) to the set of rhs lists."""

    columns: list[str]
    valid: dict[tuple, set] = field(default_factory=dict)
    n_rows: int = 0
    n_combos: int = 0

    def list_ods(self) -> list[tuple[tuple, tuple]]:
        """Flat [(lhs, rhs)] like the pybind get_list_ods, sorted."""
        return sorted(
            (lhs, rhs) for lhs, rhs_list in self.valid.items() for rhs in rhs_list
        )

    def to_strings(self) -> list[str]:
        return [
            ",".join(self.columns[i] for i in lhs)
            + " -> "
            + ",".join(self.columns[i] for i in rhs)
            for lhs, rhs in self.list_ods()
        ]


class _OrderSearch:
    """Driver-side replica of Order's lattice walk over the combo table.

    Elements of every equivalence class are combo ids; ``counts[cid]`` is the
    combo's row multiplicity (only consulted by the lhs-uniqueness test)."""

    def __init__(self, combos: list[tuple], counts: list[int], n_cols: int):
        self.combos = combos
        self.counts = counts
        self.n_rows = sum(counts)
        self.sorted_partitions: dict[tuple, list[frozenset]] = {}
        self.single_attributes: list[tuple] = []
        self.valid: dict[tuple, set] = {}
        self.merge_invalidated: dict[tuple, set] = {}
        self.candidate_sets: dict[tuple, set] = {}
        self.level_num = 1
        self._build_single_partitions(n_cols)

    # -- order.cpp:52-96 ----------------------------------------------------
    def _build_single_partitions(self, n_cols: int) -> None:
        for i in range(n_cols):
            order = sorted(range(len(self.combos)), key=lambda c: self.combos[c][i])
            classes: list[set] = [{order[0]}] if order else []
            for k in range(1, len(order)):
                if self.combos[order[k - 1]][i] == self.combos[order[k]][i]:
                    classes[-1].add(order[k])
                else:
                    classes.append({order[k]})
            self.single_attributes.append((i,))
            self.sorted_partitions[(i,)] = [frozenset(c) for c in classes]
        # PruneSingleEqClassPartitions (order.cpp:38-50): constant columns are
        # valid -> every attribute still single at that point; we iterate in
        # ascending column order (the reference's unordered_map order is
        # unspecified there -- ascending is the deterministic choice)
        for attr in [a for a in self.single_attributes]:
            if len(self.sorted_partitions[attr]) == 1:
                self.valid.setdefault(attr, set()).update(
                    a for a in self.single_attributes if a != attr
                )
                self.single_attributes.remove(attr)

    def _partition_from_singletons(self, attrs: tuple) -> list[frozenset]:
        """CreateSortedPartitionsFromSingletons (order.cpp:98-107), memoized."""
        if attrs in self.sorted_partitions:
            return self.sorted_partitions[attrs]
        res = self.sorted_partitions[(attrs[0],)]
        for i in attrs[1:]:
            res = _intersect(res, self.sorted_partitions[(i,)])
        self.sorted_partitions[attrs] = res
        return res

    # -- order.cpp:109-137 ----------------------------------------------------
    def _has_valid_prefix(self, lhs: tuple, rhs: tuple) -> bool:
        return any(_in_map(self.valid, lhs, p) for p in _get_prefixes(rhs))

    def _check_candidate_validity(self, lhs: tuple, rhs: tuple) -> int:
        if any(_in_map(self.merge_invalidated, p, rhs) for p in _get_prefixes(lhs)):
            return _MERGE
        l_part = self._partition_from_singletons(lhs)
        if len(l_part) == 1:
            self.candidate_sets[lhs].discard(rhs)
            return _VALID
        r_part = self._partition_from_singletons(rhs)
        return _check_for_swap(l_part, r_part)

    # -- order.cpp:139-183 ----------------------------------------------------
    def _compute_dependencies(self, lattice_level: set) -> None:
        if self.level_num < 2:
            return
        self._update_candidate_sets()
        for node in sorted(lattice_level):
            for i in range(1, len(node)):
                lhs, rhs = node[:i], node[i:]
                if not _in_map(self.candidate_sets, lhs, rhs):
                    continue
                if self._has_valid_prefix(lhs, rhs):
                    continue
                validity = self._check_candidate_validity(lhs, rhs)
                if validity == _VALID:
                    if any(
                        _in_map(self.merge_invalidated, p, rhs)
                        for p in _get_prefixes(lhs)
                    ):
                        continue
                    self.valid.setdefault(lhs, set()).add(rhs)
                    lhs_unique = self.n_rows == len(self.sorted_partitions[lhs])
                    if lhs_unique:
                        self.candidate_sets[lhs].discard(rhs)
                elif validity == _SWAP:
                    self.candidate_sets[lhs].discard(rhs)
                else:  # merge
                    self.merge_invalidated.setdefault(lhs, set()).add(rhs)
        self._merge_prune()

    # -- order.cpp:185-232 ----------------------------------------------------
    def _extend(self, lhs: tuple, rhs: tuple) -> list[tuple]:
        return [
            rhs + single
            for single in self.single_attributes
            if _are_disjoint(single, lhs) and _are_disjoint(single, rhs)
        ]

    def _is_minimal(self, a: tuple) -> bool:
        """order.cpp:200-217: a is non-minimal when some valid lhs->rhs has
        rhs occurring in ``a`` with lhs after it, or lhs immediately before
        it (FIRST-occurrence std::search semantics, replicated literally)."""
        for lhs, rhs_list in self.valid.items():
            for rhs in rhs_list:
                it_rhs = _search(a, rhs)
                if it_rhs < 0:
                    continue
                if _search(a, lhs, start=it_rhs + len(rhs)) >= 0:
                    return False
                it_lhs = _search(a, lhs, end=it_rhs)
                if it_lhs >= 0 and it_lhs + len(lhs) == it_rhs:
                    return False
        return True

    def _extended_rhs_is_prunable(self, lhs: tuple, extended_rhs: tuple) -> bool:
        lhs_max_prefix = _max_prefix(lhs)
        prefix_is_valid = any(
            _in_map(self.valid, lhs_max_prefix, p)
            for p in _get_prefixes(extended_rhs)
        )
        return not prefix_is_valid and not _in_map(
            self.candidate_sets, lhs_max_prefix, extended_rhs
        )

    # -- order.cpp:234-272 ----------------------------------------------------
    def _update_candidate_sets(self) -> None:
        if self.level_num < 3:
            return
        next_candidates: dict[tuple, set] = {}
        for lhs, rhs_list in self.candidate_sets.items():
            next_candidates[lhs] = set()
            if len(lhs) != self.level_num - 1:
                for rhs in rhs_list:
                    if _in_map(self.valid, lhs, rhs):
                        continue
                    for extended in self._extend(lhs, rhs):
                        if len(lhs) > 1 and self._extended_rhs_is_prunable(
                            lhs, extended
                        ):
                            continue
                        if not self._is_minimal(extended):
                            continue
                        next_candidates[lhs].add(extended)
            elif self._is_minimal(lhs):
                lhs_max_prefix = _max_prefix(lhs)
                for rhs in self.candidate_sets.get(lhs_max_prefix, set()):
                    if _are_disjoint(lhs, rhs):
                        next_candidates[lhs].add(rhs)
            if not next_candidates[lhs]:
                del next_candidates[lhs]
        self.candidate_sets = next_candidates

    # -- order.cpp:274-302 ----------------------------------------------------
    def _merge_prune(self) -> None:
        if self.level_num < 3:
            return
        for lhs in list(self.candidate_sets):
            if len(lhs) <= 1:
                continue
            lhs_max_prefix = _max_prefix(lhs)
            for rhs in list(self.candidate_sets[lhs]):
                if _in_map(self.merge_invalidated, lhs_max_prefix, rhs):
                    prunable = not any(
                        _max_prefix(other_rhs) == rhs
                        for other_rhs in self.candidate_sets.get(
                            lhs_max_prefix, set()
                        )
                    )
                    if prunable:
                        self.candidate_sets[lhs].discard(rhs)

    # -- list_lattice.cpp ------------------------------------------------------
    def run(self) -> None:
        """Order::ExecuteInternal + the ListLattice loop."""
        # ListLattice ctor: level 1 = singles; seed candidate sets
        lattice_level = {a for a in self.single_attributes}
        for a in self.single_attributes:
            self.candidate_sets[a] = {
                b for b in self.single_attributes if b != a
            }
        while lattice_level:
            self._compute_dependencies(lattice_level)
            # ListLattice::Prune (list_lattice.cpp:32-60)
            if self.level_num >= 2:
                pruned = set()
                for node in lattice_level:
                    all_empty = False
                    for lhs in _get_prefixes(node):
                        if self.candidate_sets.get(lhs, set()):
                            all_empty = False
                            break
                        all_empty = True
                    if not all_empty:
                        pruned.add(node)
                lattice_level = pruned
                self.candidate_sets = {
                    k: v for k, v in self.candidate_sets.items() if v
                }
            # ListLattice::GenerateNextLevel (list_lattice.cpp:78-104)
            prefix_blocks: dict[tuple, list[tuple]] = {}
            for node in lattice_level:
                prefix_blocks.setdefault(_max_prefix(node), []).append(node)
            nxt = set()
            for block in prefix_blocks.values():
                for node in block:
                    for join_node in block:
                        if node != join_node:
                            nxt.add(node + (join_node[-1],))
            if self.level_num > 1 and self.candidate_sets:
                for node in lattice_level:
                    self.candidate_sets.setdefault(node, set())
            lattice_level = nxt
            self.level_num += 1


def mine_list_ods(
    df: DataFrame,
    columns: list[str] | None = None,
    max_combos: int = 100_000,
) -> OrderResult:
    """Mine list-based (lexicographic) order dependencies, ORDER-style.

    One distributed pass: rows null in any ordered column are dropped (empty
    strings count as null, order_utility.cpp:60-75 IsNullOrEmpty), then a
    single groupBy collapses the table to distinct value combos with counts.
    The reference's lattice search then replays on the combo table.
    ``max_combos`` guards the driver collect -- the search is bounded by the
    combo count, not by the row count.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    proj = df.select(*cols)
    cond = None
    for f_ in proj.schema.fields:
        c = F.col(f_.name).isNotNull()
        if f_.dataType.simpleString() == "string":
            c = c & (F.length(f_.name) > 0)
        cond = c if cond is None else (cond & c)
    grouped = proj.filter(cond).groupBy(*cols).agg(F.count(F.lit(1)).alias("__cnt"))
    rows = grouped.limit(max_combos + 1).collect()
    if len(rows) > max_combos:
        raise ValueError(
            f"more than max_combos={max_combos} distinct value combos; "
            "raise the guard or project fewer columns"
        )
    combos = [tuple(r[c] for c in cols) for r in rows]
    counts = [r["__cnt"] for r in rows]
    res = OrderResult(columns=cols, n_rows=sum(counts), n_combos=len(combos))
    if not combos:
        return res
    search = _OrderSearch(combos, counts, len(cols))
    search.run()
    res.valid = search.valid
    return res
