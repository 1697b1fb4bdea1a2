"""Pandas oracle: literal reimplementation of the reference's validation formulas.

Used ONLY in tests to cross-validate the Spark engine. Each function mirrors one
reference code path (file:line cited) as directly as possible -- clarity over speed.
Python ints avoid pair-count overflow (SURVEY.md section 7 "hard parts" #3).

Null semantics: a key value of ``None``/NaN is SQL NULL. ``nulls_equal=True`` groups
all NULLs together (reference is_null_equal_null=true, and Spark groupBy semantics);
``False`` makes every NULL row its own cluster.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass

import pandas as pd


def _key_of(row_vals: tuple, row_idx: int, nulls_equal: bool) -> tuple:
    out = []
    for v in row_vals:
        is_null = v is None or (isinstance(v, float) and pd.isna(v))
        if is_null:
            out.append(("\0N", None if nulls_equal else row_idx))
        else:
            out.append((v, None))
    return tuple(out)


def _clusters(df: pd.DataFrame, cols: list[str], nulls_equal: bool = True) -> dict[tuple, list[int]]:
    """PLI::CreateFor analog (position_list_index.cpp:36-74), but keeping singletons;
    callers filter len>=2 where the reference drops them."""
    groups: dict[tuple, list[int]] = defaultdict(list)
    for idx, vals in enumerate(df[cols].itertuples(index=False, name=None)):
        groups[_key_of(vals, idx, nulls_equal)].append(idx)
    return groups


@dataclass
class UCCOracle:
    holds: bool
    num_violating_clusters: int
    num_violating_rows: int
    violating_pairs: int  # sum c*(c-1)  (ordered-pair numerator)
    aucc_error: float
    clusters: list[list[int]]  # exact violating row-index sets


def ucc_oracle(df: pd.DataFrame, cols: list[str], nulls_equal: bool = True) -> UCCOracle:
    """ucc_verifier.cpp:46-59 + ucc_stats_calculator.h:31-73."""
    n = len(df)
    viol = [sorted(c) for c in _clusters(df, cols, nulls_equal).values() if len(c) >= 2]
    viol.sort()
    pairs = sum(len(c) * (len(c) - 1) for c in viol)
    err = pairs / (n * (n - 1)) if n > 1 else 0.0
    return UCCOracle(
        holds=not viol,
        num_violating_clusters=len(viol),
        num_violating_rows=sum(len(c) for c in viol),
        violating_pairs=pairs,
        aucc_error=err,
        clusters=viol,
    )


@dataclass
class FDOracle:
    holds: bool
    num_error_clusters: int
    num_error_rows: int
    error: float  # g1-style: conflicting ordered pairs / (n^2 - n)
    # highlights: (sorted cluster rows, num_distinct_rhs, most_frequent_rhs_proportion)
    highlights: list[tuple[list[int], int, float]]


def fd_oracle(
    df: pd.DataFrame, lhs: list[str], rhs: list[str], nulls_equal: bool = True
) -> FDOracle:
    """fd_verifier.cpp:55-65 + stats_calculator.cpp:61-113.

    holds <=> #distinct(X) == #distinct(X u Y); highlights are per-X-cluster
    (distinct-Y count, max within-cluster Y multiplicity / cluster size); error is
    the g1 ratio with ordered pairs over n^2-n (stats_calculator.cpp:83).
    """
    n = len(df)
    x_groups = _clusters(df, lhs, nulls_equal)
    conflicting = 0
    highlights = []
    num_error_rows = 0
    for rows in x_groups.values():
        if len(rows) < 2:
            continue
        ys = Counter(
            _key_of(vals, idx, nulls_equal)
            for idx, vals in zip(
                rows, df.iloc[rows][rhs].itertuples(index=False, name=None)
            )
        )
        if len(ys) == 1:
            continue
        c = len(rows)
        conflicting += c * (c - 1) - sum(f * (f - 1) for f in ys.values())
        num_error_rows += c
        highlights.append((sorted(rows), len(ys), max(ys.values()) / c))
    highlights.sort()
    return FDOracle(
        holds=not highlights,
        num_error_clusters=len(highlights),
        num_error_rows=num_error_rows,
        error=conflicting / (n * n - n) if n > 1 else 0.0,
        highlights=highlights,
    )


@dataclass
class AFDOracle:
    g1: float
    pdep: float
    tau: float
    mu_plus: float
    rho: float


def afd_oracle(
    df: pd.DataFrame, lhs: list[str], rhs: list[str], nulls_equal: bool = True
) -> AFDOracle:
    """fd/tane/afd_measures.cpp:6-130, closed forms over group-count vectors."""
    n = len(df)
    x_sizes = [len(v) for v in _clusters(df, lhs, nulls_equal).values()]
    y_sizes = [len(v) for v in _clusters(df, rhs, nulls_equal).values()]
    xy = _clusters(df, lhs + rhs, nulls_equal)
    x_of = {}
    for key, rows in _clusters(df, lhs, nulls_equal).items():
        for r in rows:
            x_of[r] = len(rows)
    # g1: (NEP(X) - NEP(XY)) / (n^2 - n) with ordered pairs (matches the verifier's
    # g1 at stats_calculator.cpp:83; TANE's uses C(n,2) pairs consistently -- same value)
    nep_x = sum(c * (c - 1) for c in x_sizes)
    nep_xy = sum(len(v) * (len(v) - 1) for v in xy.values())
    g1 = (nep_x - nep_xy) / (n * n - n) if n > 1 else 0.0
    # pdep(X->Y) = (1/n) * sum_xy cxy^2 / cx   (afd_measures.cpp:31-68)
    pdep_xy = sum(len(v) ** 2 / x_of[v[0]] for v in xy.values()) / n
    # pdep(Y) = sum cy^2 / n^2  (PdepSelf, :17-29)
    pdep_y = sum(c * c for c in y_sizes) / (n * n)
    # tau (:70-78)
    tau = 1.0 if pdep_y == 1 else (pdep_xy - pdep_y) / (1 - pdep_y)
    # mu+ (:80-103): K = #distinct X
    k = len(x_sizes)
    if pdep_y == 1 or k == n:
        mu_plus = 1.0
    else:
        mu = 1 - (1 - pdep_xy) / (1 - pdep_y) * (n - 1) / (n - k)
        mu_plus = max(0.0, mu)
    # rho (:105-129): dom(X)/dom(XY)
    rho = k / len(xy)
    return AFDOracle(g1=g1, pdep=pdep_xy, tau=tau, mu_plus=mu_plus, rho=rho)


@dataclass
class PFDOracle:
    error_per_tuple: float
    error_per_value: float
    num_violating_clusters: int
    num_violating_rows: int


def pfd_oracle(
    df: pd.DataFrame, lhs: list[str], rhs: list[str], nulls_equal: bool = True
) -> PFDOracle:
    """pfd_verifier/pfd_stats_calculator.h:47-90.

    per-tuple:  1 - (sum_x max_y + #singleton_x) / n
    per-value:  1 - (sum_x max_y/c_x + #singleton_x) / #distinct_x
    Violating clusters counted over non-singleton X clusters with max != c.
    """
    n = len(df)
    x_groups = _clusters(df, lhs, nulls_equal)
    sum_t = 0.0
    sum_v = 0.0
    viol_clusters = 0
    viol_rows = 0
    k = len(x_groups)
    for rows in x_groups.values():
        ys = Counter(
            _key_of(vals, idx, nulls_equal)
            for idx, vals in zip(
                rows, df.iloc[rows][rhs].itertuples(index=False, name=None)
            )
        )
        mx = max(ys.values())
        c = len(rows)
        sum_t += mx
        sum_v += mx / c
        if len(rows) >= 2:
            if mx != c:
                viol_clusters += 1
            viol_rows += c - mx
    return PFDOracle(
        error_per_tuple=1.0 - sum_t / n,
        error_per_value=1.0 - sum_v / k,
        num_violating_clusters=viol_clusters,
        num_violating_rows=viol_rows,
    )


@dataclass
class INDOracle:
    holds: bool
    num_violating_clusters: int
    num_violating_rows: int
    error: float
    violating_values: list[tuple]


def ind_oracle(
    lhs_df: pd.DataFrame, lhs_cols: list[str], rhs_df: pd.DataFrame, rhs_cols: list[str]
) -> INDOracle:
    """ind_verifier.cpp:80-136: clusters = distinct LHS tuples absent from RHS;
    rows counted per occurrence; error = violating distinct / distinct LHS.

    The reference compares raw string tuples -- no null special-casing. We treat
    NULL as a comparable key value equal to itself (matches Spark's groupBy + our
    null-safe anti-join; document any engine that drops null keys instead)."""
    rhs_set = {
        _key_of(v, -1, True) for v in rhs_df[rhs_cols].itertuples(index=False, name=None)
    }
    lhs_counts: Counter = Counter(
        _key_of(v, -1, True) for v in lhs_df[lhs_cols].itertuples(index=False, name=None)
    )
    missing = {k: c for k, c in lhs_counts.items() if k not in rhs_set}
    return INDOracle(
        holds=not missing,
        num_violating_clusters=len(missing),
        num_violating_rows=sum(missing.values()),
        error=len(missing) / len(lhs_counts) if lhs_counts else 0.0,
        violating_values=sorted(missing.keys()),
    )


def nd_oracle(
    df: pd.DataFrame, lhs: list[str], rhs: list[str], weight: int, nulls_equal: bool = True
) -> tuple[bool, int]:
    """nd/nd_verifier: ND holds iff every X value maps to <= weight distinct Y values.
    Returns (holds, max distinct-Y over X groups == 'real weight')."""
    x_groups = _clusters(df, lhs, nulls_equal)
    real = 0
    for rows in x_groups.values():
        ys = {
            _key_of(vals, idx, nulls_equal)
            for idx, vals in zip(
                rows, df.iloc[rows][rhs].itertuples(index=False, name=None)
            )
        }
        real = max(real, len(ys))
    return real <= weight, real
