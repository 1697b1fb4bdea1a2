"""CIND discovery: approximate INDs + condition mining (Cinderella family).

Reference semantics (cind/cind_algorithm.cpp, condition_miners/cinderella.cpp,
itemset.h, itemset_node.h, ind/spider/spider.cpp):

1. Spider mines unary AINDs with ``error(dep -> ref) = 1 - |dom(dep) ∩
   dom(ref)| / |dom(dep)|`` over DISTINCT values (attribute.h:71-93), null
   and empty cells folding to the empty-string value; under
   ``is_null_equal_null`` (the reference default true) that value is shared
   like any other, otherwise it counts in the dependent's domain but never
   matches (spider.cpp:60-97 the pq-walk's ``value.empty()`` break). The
   result list is ordered (dependent attribute id asc, referenced id asc),
   attribute ids numbering tables then columns in input order.
2. For each AIND, Cinderella mines CONDITIONS over the dependent table's
   remaining columns: an itemset of (column = value) equalities;
   ``completeness`` = covered included baskets / all included baskets,
   ``validity`` = covered included baskets / covered baskets
   (itemset_node.h:35-60). A basket is a row (CondType::kRow) or a distinct
   LHS value group (kGroup); in both modes an itemset covers a basket only
   when ONE ROW matches every equality (cinderella.cpp:26-56 MergeBaskets
   intersects position lists). The Apriori walk prunes on completeness and
   emits every surviving itemset with validity >= min_validity
   (cinderella.cpp:126-158).

Spark-first design -- both stages are bounded by distinct-value structure,
never by row count:

* AINDs reuse the one-shuffle inverted-domain plan (discovery.py).
* Per AIND, ONE groupBy collapses the dependent table to its distinct
  (lhs value, conditional values) combos with counts, plus a broadcast
  semi-join flag against the referenced column's distinct values. The
  Apriori walk replays the reference on the combo table: every itemset's
  covered baskets derive from its matching combos (a combo IS a row
  pattern, so position-list intersection == combo matches all items).

The PliCind variant computes the same result by PLI intersections in the
reference (its tests assert equal counts); ``algo`` accepts both names.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANY_VALUE = "-"  # condition.h:17 kAnyValue


@dataclass
class CindCondition:
    """condition.h Condition: per-conditional-attribute value or '-'."""

    values: tuple[str, ...]
    validity: float
    completeness: float


@dataclass
class CindResult:
    """One CIND (cind.h): the AIND plus its mined conditions."""

    lhs: tuple[str, str]  # (table, column)
    rhs: tuple[str, str]
    error: float
    conditional_attributes: list[str] = field(default_factory=list)
    conditions: list[CindCondition] = field(default_factory=list)

    def conditions_number(self) -> int:
        return len(self.conditions)

    def to_string(self) -> str:
        head = (
            f"{self.lhs[0]}.{self.lhs[1]} -> {self.rhs[0]}.{self.rhs[1]}"
            f" (error={self.error:.6g})"
        )
        conds = "; ".join(
            "(" + ", ".join(c.values) + f", v={c.validity:.6g}, c={c.completeness:.6g})"
            for c in self.conditions
        )
        return head + (f" [{conds}]" if conds else "")


def _domains(tables: dict[str, DataFrame]) -> dict[tuple[str, str], set]:
    """Distinct string domains per column, null/empty folded to ''. One
    distinct-aggregation per table column set (small result: the domains are
    only used for the AIND pair errors and the included-flag joins are done
    Spark-side; this collect is bounded by distinct counts)."""
    out: dict[tuple[str, str], set] = {}
    for tname, df in tables.items():
        for c in df.columns:
            v = F.coalesce(F.col(c).cast("string"), F.lit(""))
            vals = df.select(v.alias("v")).distinct().collect()
            out[(tname, c)] = {r["v"] for r in vals}
    return out


def _mine_ainds_ordered(
    tables: dict[str, DataFrame],
    max_error: float,
    is_null_equal_null: bool,
) -> list[tuple[tuple[str, str], tuple[str, str], float]]:
    """Spider's AIND list in its registration order (dep id asc, ref id asc);
    error over distinct values with ''-folding (attribute.h:86-93)."""
    doms = _domains(tables)
    attrs: list[tuple[str, str]] = []
    for tname, df in tables.items():
        attrs.extend((tname, c) for c in df.columns)
    out = []
    for dep in attrs:
        dom_dep = doms[dep]
        n = len(dom_dep)
        if n == 0:
            continue
        for ref in attrs:
            if ref == dep:
                continue
            shared = dom_dep & doms[ref]
            if not is_null_equal_null:
                shared = shared - {""}
            err = 1.0 - len(shared) / n
            if err <= max_error:
                out.append((dep, ref, err))
    return out


def _walk_conditions(
    combos: list[tuple],
    counts: list[int],
    included: list[bool],
    lhs_vals: list,
    n_cond: int,
    condition_type: str,
    min_validity: float,
    min_completeness: float,
) -> list[CindCondition]:
    """Exact replica of Cinderella's Apriori over the combo table.

    combos[i] = the i-th distinct (conditional values) pattern;
    lhs_vals[i] its LHS value, counts[i] its row multiplicity, included[i]
    whether the LHS value is covered by the referenced column."""
    group_mode = condition_type == "group"

    # item -> matching combo ids
    item_combos: dict[tuple[int, str], set[int]] = {}
    for i, combo in enumerate(combos):
        for col_id, val in enumerate(combo):
            item_combos.setdefault((col_id, val), set()).add(i)

    if group_mode:
        included_total = len({lhs_vals[i] for i in range(len(combos)) if included[i]})
    else:
        included_total = sum(counts[i] for i in range(len(combos)) if included[i])

    def stats(combo_ids: set[int]) -> tuple[float, float]:
        """(validity, completeness) of the basket set covered by combo_ids
        (itemset_node.h:35-60 CreateChild)."""
        if group_mode:
            groups = {lhs_vals[i] for i in combo_ids}
            inc_groups = {lhs_vals[i] for i in combo_ids if included[i]}
            containing, containing_inc = len(groups), len(inc_groups)
        else:
            containing = sum(counts[i] for i in combo_ids)
            containing_inc = sum(counts[i] for i in combo_ids if included[i])
        completeness = (
            0.0 if included_total == 0 else containing_inc / included_total
        )
        validity = -1.0 if containing == 0 else containing_inc / containing
        return validity, completeness

    # level 1: items occurring in >= 1 INCLUDED basket (cinderella.cpp:129-141)
    def occurs_included(ids: set[int]) -> bool:
        return any(included[i] for i in ids)

    result: list[CindCondition] = []
    survivors: dict[tuple, set[int]] = {}
    for item, ids in item_combos.items():
        if not occurs_included(ids):
            continue
        validity, completeness = stats(ids)
        if completeness < min_completeness:
            continue
        key = (item,)
        survivors[key] = ids
        if validity >= min_validity:
            result.append(_to_condition(key, validity, completeness, n_cond))

    # Apriori levels: join survivors sharing the (k-1)-prefix, col order asc,
    # all (k-1)-subsets surviving (itemset.h CheckSubsets)
    while survivors:
        nxt: dict[tuple, set[int]] = {}
        by_prefix: dict[tuple, list[tuple]] = {}
        for key in survivors:
            by_prefix.setdefault(key[:-1], []).append(key)
        survivor_set = set(survivors)
        for prefix, keys in by_prefix.items():
            for k1 in keys:
                for k2 in keys:
                    if k1[-1][0] < k2[-1][0]:
                        cand = k1 + (k2[-1],)
                        if any(
                            cand[:skip] + cand[skip + 1 :] not in survivor_set
                            for skip in range(len(cand))
                        ):
                            continue
                        ids = survivors[k1] & survivors[k2]
                        validity, completeness = stats(ids)
                        if completeness < min_completeness:
                            continue
                        nxt[cand] = ids
                        if validity >= min_validity:
                            result.append(
                                _to_condition(cand, validity, completeness, n_cond)
                            )
        survivors = nxt
    return result


def _to_condition(key, validity, completeness, n_cond) -> CindCondition:
    values = [ANY_VALUE] * n_cond
    for col_id, val in key:
        values[col_id] = val
    return CindCondition(tuple(values), validity, completeness)


def mine_cinds(
    tables: dict[str, DataFrame],
    max_error: float = 0.5,
    min_validity: float = 0.0,
    min_completeness: float = 0.0,
    condition_type: str = "group",
    is_null_equal_null: bool = True,
    max_combos: int = 100_000,
    algo: str = "cinderella",
) -> list[CindResult]:
    """Mine conditional inclusion dependencies, Cinderella-style.

    For every unary AIND with error <= ``max_error`` (Spider semantics, in
    Spider's result order), mine the equality conditions over the dependent
    table's other columns that lift it toward an exact IND. ``algo`` accepts
    'cinderella' and 'pli_cind' -- the reference's two strategies compute the
    same result set (its tests assert equal counts)."""
    if condition_type not in ("group", "row"):
        raise ValueError("condition_type must be 'group' or 'row'")
    if algo not in ("cinderella", "pli_cind"):
        raise ValueError("algo must be 'cinderella' or 'pli_cind'")
    ainds = _mine_ainds_ordered(tables, max_error, is_null_equal_null)
    out: list[CindResult] = []
    for (ltab, lcol), (rtab, rcol), err in ainds:
        ldf = tables[ltab]
        cond_cols = [
            c
            for c in ldf.columns
            if c != lcol and not (ltab == rtab and c == rcol)
        ]
        sv = F.coalesce(F.col(lcol).cast("string"), F.lit("")).alias("__lhs")
        combo_cols = [
            F.coalesce(F.col(c).cast("string"), F.lit("")).alias(f"__c{i}")
            for i, c in enumerate(cond_cols)
        ]
        rhs_vals = (
            tables[rtab]
            .select(F.coalesce(F.col(rcol).cast("string"), F.lit("")).alias("__lhs"))
            .distinct()
            .withColumn("__inc", F.lit(True))
        )
        grouped = (
            ldf.select(sv, *combo_cols)
            .groupBy("__lhs", *[f"__c{i}" for i in range(len(cond_cols))])
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .join(F.broadcast(rhs_vals), on="__lhs", how="left")
        )
        rows = grouped.limit(max_combos + 1).collect()
        if len(rows) > max_combos:
            raise ValueError(
                f"more than max_combos={max_combos} distinct combos for "
                f"{ltab}.{lcol}; raise the guard"
            )
        combos = [tuple(r[f"__c{i}"] for i in range(len(cond_cols))) for r in rows]
        counts = [r["__cnt"] for r in rows]
        inc = [bool(r["__inc"]) for r in rows]
        lhs_vals = [r["__lhs"] for r in rows]
        conditions = _walk_conditions(
            combos,
            counts,
            inc,
            lhs_vals,
            len(cond_cols),
            condition_type,
            min_validity,
            min_completeness,
        )
        out.append(
            CindResult(
                lhs=(ltab, lcol),
                rhs=(rtab, rcol),
                error=err,
                conditional_attributes=[f"{ltab}.{c}" for c in cond_cols],
                conditions=conditions,
            )
        )
    return out
