"""Soft-FD / correlation (CORDS) validation for one column pair.

Reference (fd/sfd/cords.cpp, CORDS SIGMOD'04): for a column pair ordered so
the higher-cardinality column is the determinant,
  * soft key    : card(col) >= (1 - min_cardinality) * n  (excluded),
  * trivial     : card(col) == 1                          (excluded),
  * SFD holds   : card(det, dep) <= max_diff_vals_proportion * n AND
                  card(det) >= (1 - min_sfd_strength) * card(det, dep)
                  (cords.cpp DetectSFD),
  * else correlation via a contingency table over bucketed categories
    (contingency_table.cpp): a column is *skewed* when its top
    ``max_categories`` values cover >= (1 - min_skew_threshold) of rows --
    then buckets are frequency-rank ordinals and other rows are filtered
    out (cords.cpp SkewHandling / Sample::Filter); otherwise bucket =
    hash(value) % min(card, max_categories). Correlated iff zero cells >
    min_structural_zeroes * d1*d2 (TooMuchStructuralZeroes) OR
    chi^2 > ppf(1 - max_false_positive_probability, (d1-1)(d2-1));
    chi^2 is 0 whenever some bucket has an empty marginal.

The reference runs on a CalculateSampleSize sample; this is the
validation-tier full-data mode (every agg is one distributed pass -- the
single-node reason to sample does not apply). chi^2 over all d1*d2 cells
including empty ones reduces to the closed form
``n * (sum_present o^2 / (n_i * n_j)) - n``, so absent cells never need
materializing. Bucketing hash is xxhash64 (std::hash is
platform-unspecified, so cross-engine hash parity is not meaningful);
frequency-rank ties break by value for determinism. The chi^2 quantile
uses a regularized-incomplete-gamma bisection (same values as
boost::math::quantile to ~1e-12).

Spark plan: one countDistinct agg + ONE stacked top-k frequency agg for
both columns (explode -> single shuffle; bounded collect of
<= 2*max_categories rows) + one cell agg over <= d1*d2 keys with window
marginals on that tiny frame. Three scans total; nothing else scales with
row count.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# chi-squared quantile (driver-side, pure python)


def _gammp(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) (series / continued
    fraction split at x = a + 1)."""
    if x <= 0.0:
        return 0.0
    gln = math.lgamma(a)
    if x < a + 1.0:
        ap, summ, delt = a, 1.0 / a, 1.0 / a
        for _ in range(500):
            ap += 1.0
            delt *= x / ap
            summ += delt
            if abs(delt) < abs(summ) * 1e-15:
                break
        return summ * math.exp(-x + a * math.log(x) - gln)
    b, c, d = x + 1.0 - a, 1e300, 1.0 / (x + 1.0 - a)
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < 1e-300:
            d = 1e-300
        c = b + an / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < 1e-15:
            break
    return 1.0 - math.exp(-x + a * math.log(x) - gln) * h


def chi2_ppf(p: float, dof: float) -> float:
    """Inverse chi-squared CDF by bisection on P(dof/2, x/2)."""
    if not (0.0 < p < 1.0):
        raise ValueError("p must lie in (0, 1)")
    lo, hi = 0.0, dof + 100.0 * math.sqrt(dof) + 100.0
    while _gammp(dof / 2.0, hi / 2.0) < p:
        hi *= 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if _gammp(dof / 2.0, mid / 2.0) < p:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------


@dataclass
class SFDCheck:
    """Lazy CORDS check over one column pair (see module docstring)."""

    df: DataFrame
    col_a: str
    col_b: str
    min_cardinality: float = 0.1
    max_diff_vals_proportion: float = 0.99
    min_sfd_strength: float = 0.1
    min_skew_threshold: float = 0.5
    min_structural_zeroes: float = 0.3
    max_false_positive_probability: float = 1e-6
    max_categories: int = 100

    def __post_init__(self) -> None:
        if self.col_a == self.col_b:
            raise ValueError("SFD needs two distinct columns")

    @cached_property
    def _cards(self):
        row = self.df.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(self.col_a).alias("ca"),
            F.countDistinct(self.col_b).alias("cb"),
            F.countDistinct(self.col_a, self.col_b).alias("cab"),
        ).collect()[0]
        return int(row["n"]), int(row["ca"]), int(row["cb"]), int(row["cab"])

    @cached_property
    def _roles(self):
        """(det, dep, det_card, dep_card): higher cardinality determines
        (cords.cpp sort_indices_by_cardinality; ties keep (a, b))."""
        n, ca, cb, cab = self._cards
        if cb > ca:
            return self.col_b, self.col_a, cb, ca
        return self.col_a, self.col_b, ca, cb

    @cached_property
    def _tops(self) -> dict[str, list[tuple[str, int]]]:
        """{col: top max_categories (value-as-string, freq)} by freq desc then
        value asc -- the frequency handler's bounded per-column maps, both
        columns from ONE stacked scan (explode -> one shuffle) instead of a
        per-column top-k pass each."""
        a, b = self.col_a, self.col_b
        stacked = (
            self.df.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.lit(a).alias("column"),
                            F.col(a).cast("string").alias("v"),
                        ),
                        F.struct(
                            F.lit(b).alias("column"),
                            F.col(b).cast("string").alias("v"),
                        ),
                    )
                ).alias("p")
            )
            .select("p.*")
            .filter(F.col("v").isNotNull())
        )
        counts = stacked.groupBy("column", "v").agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy("column").orderBy(
            F.col("cnt").desc(), F.col("v").asc()
        )
        rows = (
            counts.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= self.max_categories)
            .collect()
        )
        out: dict[str, list[tuple[str, int]]] = {a: [], b: []}
        for r in sorted(rows, key=lambda r: r["__rk"]):
            out[r["column"]].append((r["v"], int(r["cnt"])))
        return out

    def _skew(self, col: str, n: int):
        """(top values, skewed) per SkewHandling: skewed when the top
        max_categories values cover >= (1 - min_skew_threshold) of rows."""
        top = self._tops[col]
        top_sum = sum(cnt for _, cnt in top)
        return top, top_sum >= (1.0 - self.min_skew_threshold) * n

    def _bucket(self, col: str, top, skewed: bool, domain: int):
        """(bucket expr, row filter) for a decided skew mode + domain.
        Values compare as strings (the stacked top-k map is string-keyed;
        within one column the cast is injective for the supported types)."""
        c = F.col(col).cast("string")
        if skewed:
            mapping = F.create_map(
                *[x for i, (v, _) in enumerate(top) for x in (F.lit(v), F.lit(i))]
            )
            return mapping[c], c.isin([v for v, _ in top])
        return F.pmod(F.xxhash64(c), F.lit(domain)), c.isNotNull()

    def _domains(self, n: int, cd: int, cp: int, skew_i: bool, top_i, skew_j: bool, top_j):
        """Contingency dimensions. Skewed columns use their real top-value
        count (reference parity). Hash-bucketed columns additionally apply a
        chi-square validity cap -- expected count per cell >= ~5 (Cochran's
        rule) -- because in full-data mode WE pick the bucket count: the
        reference's BHUNT sample-size formula guarantees enough rows per cell
        in its sampled mode, and without that guarantee 100x100 buckets over
        a small table would trip the structural-zero gate spuriously."""
        d1 = len(top_i) if skew_i else min(cd, self.max_categories)
        d2 = len(top_j) if skew_j else min(cp, self.max_categories)
        if not skew_i and not skew_j:
            d1 = min(d1, max(2, int((n / 5.0) ** 0.5)))
            d2 = min(d2, max(2, n // (5 * max(d1, 1))))
        elif not skew_i:
            d1 = min(d1, max(2, n // (5 * max(d2, 1))))
        elif not skew_j:
            d2 = min(d2, max(2, n // (5 * max(d1, 1))))
        return d1, d2

    def summary(self) -> DataFrame:
        """Single row: roles, cardinalities, soft-key/trivial flags, SFD
        verdict, contingency dimensions, chi2 vs critical, structural-zero
        verdict, overall ``correlated``."""
        n, ca, cb, cab = self._cards
        det, dep, cd, cp = self._roles
        spark = self.df.sparkSession
        soft_a = ca >= (1.0 - self.min_cardinality) * n
        soft_b = cb >= (1.0 - self.min_cardinality) * n
        sfd = (cab <= self.max_diff_vals_proportion * n) and (
            cd >= (1.0 - self.min_sfd_strength) * cab
        )
        top_i, skew_i = self._skew(det, n)
        top_j, skew_j = self._skew(dep, n)
        d1, d2 = self._domains(n, cd, cp, skew_i, top_i, skew_j, top_j)
        bi, fi = self._bucket(det, top_i, skew_i, d1)
        bj, fj = self._bucket(dep, top_j, skew_j, d2)
        cells = (
            self.df.filter(fi & fj)
            .select(bi.alias("__bi"), bj.alias("__bj"))
            .groupBy("__bi", "__bj")
            .count()
        )
        # <= d1*d2 cells: window marginals on the tiny cell frame, then the
        # closed-form chi2 (zero cells contribute their expectation, which
        # telescopes into "- n_eff").
        n_i = F.sum("count").over(Window.partitionBy("__bi"))
        n_j = F.sum("count").over(Window.partitionBy("__bj"))
        stats = (
            cells.select(
                "count",
                n_i.alias("n_i"),
                n_j.alias("n_j"),
                F.col("__bi").alias("bi"),
                F.col("__bj").alias("bj"),
            )
            .agg(
                F.sum("count").alias("n_eff"),
                F.sum(
                    F.col("count") * F.col("count") / (F.col("n_i") * F.col("n_j"))
                ).alias("s"),
                F.count(F.lit(1)).alias("n_nonzero"),
                F.countDistinct("bi").alias("d1_seen"),
                F.countDistinct("bj").alias("d2_seen"),
            )
            .collect()[0]
        )
        n_eff = int(stats["n_eff"] or 0)
        complete = stats["d1_seen"] == d1 and stats["d2_seen"] == d2
        chi2 = n_eff * (float(stats["s"]) - 1.0) if complete and n_eff else 0.0
        dof = (d1 - 1) * (d2 - 1)
        crit = (
            chi2_ppf(1.0 - self.max_false_positive_probability, dof)
            if dof > 0
            else float("inf")
        )
        n_zero = d1 * d2 - int(stats["n_nonzero"])
        too_many_zeroes = n_zero > self.min_structural_zeroes * d1 * d2
        correlated = (not sfd) and (too_many_zeroes or chi2 > crit)
        row = {
            "det": det,
            "dep": dep,
            "n_rows": n,
            "det_card": cd,
            "dep_card": cp,
            "pair_card": cab,
            "soft_key_det": soft_b if det == self.col_b else soft_a,
            "soft_key_dep": soft_a if det == self.col_b else soft_b,
            "trivial_det": cd == 1,
            "trivial_dep": cp == 1,
            "sfd_holds": sfd,
            "skew_det": skew_i,
            "skew_dep": skew_j,
            "d1": d1,
            "d2": d2,
            "n_used": n_eff,
            "chi2": chi2,
            "dof": dof,
            "chi2_critical": crit,
            "n_zero_cells": n_zero,
            "too_many_zeroes": too_many_zeroes,
            "correlated": correlated,
        }
        schema = (
            "det string, dep string, n_rows long, det_card long, dep_card long, "
            "pair_card long, soft_key_det boolean, soft_key_dep boolean, "
            "trivial_det boolean, trivial_dep boolean, sfd_holds boolean, "
            "skew_det boolean, skew_dep boolean, d1 long, d2 long, n_used long, "
            "chi2 double, dof long, chi2_critical double, n_zero_cells long, "
            "too_many_zeroes boolean, correlated boolean"
        )
        return spark.createDataFrame([row], schema)


def sfd_check(df: DataFrame, col_a: str, col_b: str, **kwargs) -> SFDCheck:
    """Validate a CORDS soft-FD / correlation over one column pair."""
    return SFDCheck(df, col_a, col_b, **kwargs)


def calculate_sample_size(
    lhs_cardinality: int,
    rhs_cardinality: int,
    max_false_positive_probability: float,
    delta: float,
) -> int:
    """Sample::CalculateSampleSize (sample.cpp:39-50) verbatim -- the CORDS
    paper's chi^2 sample bound. The engine's SFD check runs full-data (one
    distributed agg beats sampling on a cluster), but the bound is part of
    the reference API surface and its pinned values (test_sfd.cpp:107-114)
    document the sampling regime a per-pair scan would use."""
    v = (lhs_cardinality - 1) * (rhs_cardinality - 1)
    d = min(lhs_cardinality, rhs_cardinality)
    log = math.log(max_false_positive_probability * math.sqrt(2 * math.pi))
    numerator = (-16 * v * log) ** 0.5 - 8 * log
    denominator = delta * (d - 1)
    v2 = v**0.071
    return int((numerator / denominator) * (v2 / 1.69))


# ---------------------------------------------------------------------------
# reference-exact sampled CORDS (cords.cpp ExecuteInternal) -- the
# fixed_sample mode its own test suite pins (test_sfd.cpp CordsAlgorithmTest)

_M64 = (1 << 64) - 1


def _shift_mix(v: int) -> int:
    return v ^ (v >> 47)


def std_string_hash(s: str) -> int:
    """libstdc++ std::hash<std::string> (_Hash_bytes, hash_bytes.cc): the
    Murmur-derived 64-bit hash with seed 0xc70f6907 -- CORDS buckets
    non-skewed categories with it (contingency_table.cpp:19-25), so exact
    parity needs the exact hash. Verified against a compiled g++ probe."""
    data = s.encode()
    m = 0xC6A4A7935BD1E995
    ln = len(data)
    h = (0xC70F6907 ^ (ln * m)) & _M64
    la = ln & ~0x7
    for off in range(0, la, 8):
        chunk = int.from_bytes(data[off : off + 8], "little")
        d = (_shift_mix((chunk * m) & _M64) * m) & _M64
        h = ((h ^ d) * m) & _M64
    if ln & 0x7:
        tail = int.from_bytes(data[la:], "little")
        h = ((h ^ tail) * m) & _M64
    h = (_shift_mix(h) * m) & _M64
    return _shift_mix(h)


def _reference_string(col: str, kind: str):
    """The reference's GetDataAsString form per inferred type: ints plain,
    doubles std::to_string (6 fixed decimals), dates ISO, strings raw."""
    c = F.col(col)
    if kind == "int":
        return F.col(col).cast("bigint").cast("string")
    if kind == "double":
        # std::to_string(double) = %f with 6 fixed decimals, no grouping
        return F.format_string("%.6f", c.cast("double"))
    return c.cast("string")


def cords_profile(
    df: DataFrame,
    order_col: str | None = None,
    columns: list[str] | None = None,
    is_null_equal_null: bool = True,
    only_sfd: bool = False,
    fixed_sample: bool = True,
    min_cardinality: float = 0.04,
    max_diff_vals_proportion: float = 0.4,
    min_sfd_strength_measure: float = 0.3,
    min_skew_threshold: float = 0.3,
    min_structural_zeroes_amount: float = 1e-1,
    max_false_positive_probability: float = 1e-6,
    delta: float = 0.05,
    max_amount_of_categories: int = 70,
) -> dict:
    """CORDS over the CalculateSampleSize sample, replaying cords.cpp
    ExecuteInternal verbatim (the engine-native full-data mode stays in
    SFDCheck/mine_sfds): FrequencyHandler top-k frequency maps over the FULL
    data (one bounded per-column aggregation each), soft-key/trivial
    exclusion, per-pair fixed sample = the first min(S, n) rows in
    ``order_col`` order with cyclic wrap weights (sample.cpp:27 ``i % rows``),
    DetectSFD on sample cardinalities, skew handling with the top-k filter,
    and the chi-squared / structural-zeroes contingency verdict with
    std::hash bucketing for non-skewed columns.

    Spark splits the work by what scales: everything touching all n rows
    (frequency maps, cardinalities, the canonical string projection) is a
    distributed aggregation; everything bounded by the CORDS sample bound
    (the whole point of the paper's sampling) collects once per pair-batch.
    Defaults mirror the reference's kTestConfigDefault.
    """
    import pandas as _pd  # noqa: F401  (kept local: only driver-side frames)

    from pyspark_validator.io import infer_reference_types

    cols = list(columns or df.columns)
    if order_col is not None and order_col in cols:
        cols.remove(order_col)
    str_df = df.select(
        *( [F.col(order_col)] if order_col is not None else [] ),
        *[
            _reference_string(c, k).alias(c)
            for c, k in infer_reference_types(df.select(cols)).items()
        ],
    )
    n = str_df.count()

    # FrequencyHandler (frequency_handler.cpp:15-51): per column cardinality,
    # the top-k (freq desc, value desc) ordinal map, and its frequency sum
    cardinality: dict[str, int] = {}
    freq_map: dict[str, dict[str, int]] = {}
    freq_sum: dict[str, int] = {}
    for c in cols:
        grouped = str_df.groupBy(F.col(c).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        cardinality[c] = grouped.count()
        top = grouped.orderBy(F.desc("cnt"), F.desc("v")).limit(
            max_amount_of_categories
        ).collect()
        freq_map[c] = {r["v"]: i for i, r in enumerate(top)}
        freq_sum[c] = sum(r["cnt"] for r in top)

    soft_keys, trivial = [], []
    eligible = []
    for c in cols:
        if cardinality[c] >= (1 - min_cardinality) * n:
            soft_keys.append(c)
        elif cardinality[c] == 1:
            trivial.append(c)
        else:
            eligible.append(c)

    # the fixed sample is a prefix in ``order_col`` order; collect the prefix
    # long enough for the largest pair once (bounded by the sample bound)
    max_s = 0
    pair_meta = []
    for i1 in range(len(cols) - 1):
        for i2 in range(i1 + 1, len(cols)):
            c1, c2 = cols[i1], cols[i2]
            if c1 not in eligible or c2 not in eligible:
                continue
            ci, ck = (
                (c2, c1) if cardinality[c2] > cardinality[c1] else (c1, c2)
            )
            s = calculate_sample_size(
                cardinality[ci],
                cardinality[ck],
                max_false_positive_probability,
                delta,
            )
            pair_meta.append((ci, ck, s))
            max_s = max(max_s, min(s, n))
    if pair_meta:
        prefix_df = str_df
        if order_col is not None:
            prefix_df = prefix_df.orderBy(order_col)
        prefix = prefix_df.limit(max_s).collect()
    else:
        prefix = []

    is_skewed = {c: False for c in cols}
    sfds, correlations = [], []
    for ci, ck, s in pair_meta:
        take = min(s, n)
        rows = [(r[ci], r[ck]) for r in prefix[:take]]
        if s > n:
            base, extra = s // n, s % n
            weights = [base + (1 if r < extra else 0) for r in range(take)]
        else:
            weights = [1] * take
        # DetectSFD (cords.cpp:94-98) on SAMPLE cardinalities, S incl. wraps
        lhs_card = len({a for a, _ in rows})
        concat_card = len(set(rows))
        if concat_card <= max_diff_vals_proportion * s and lhs_card >= (
            1 - min_sfd_strength_measure
        ) * concat_card:
            sfds.append((ci, ck))
            continue
        if only_sfd:
            continue
        # SkewHandling (cords.cpp:100-114): per column skew flag + domain,
        # skewed columns filter the sample to their top-k values
        domains = {}
        for c in (ci, ck):
            if freq_sum[c] >= (1 - min_skew_threshold) * n:
                is_skewed[c] = True
                domains[c] = len(freq_map[c])
            else:
                domains[c] = min(cardinality[c], max_amount_of_categories)
        kept = [
            (a, b, w)
            for (a, b), w in zip(rows, weights)
            if (not is_skewed[ci] or a in freq_map[ci])
            and (not is_skewed[ck] or b in freq_map[ck])
        ]
        di, dk = domains[ci], domains[ck]

        def bucket(c, v, dom):
            if is_skewed[c]:
                return freq_map[c][v]
            return std_string_hash(v) % dom

        n_ij: dict[tuple[int, int], float] = {}
        n_i = [0.0] * di
        n_j = [0.0] * dk
        total = 0.0
        for a, b, w in kept:
            bi, bj = bucket(ci, a, di), bucket(ck, b, dk)
            n_ij[(bi, bj)] = n_ij.get((bi, bj), 0.0) + w
            n_i[bi] += w
            n_j[bj] += w
            total += w
        # TooMuchStructuralZeroes (contingency_table.cpp:72-80)
        zeros = di * dk - sum(1 for v in n_ij.values() if v != 0)
        if zeros > min_structural_zeroes_amount * di * dk:
            correlations.append((ci, ck))
            continue
        # ChiSquaredTest (contingency_table.cpp:45-70): chi2 is 0 whenever
        # some marginal in the full grid is empty
        chi2 = 0.0
        if all(n_i[i] for i in range(di)) and all(n_j[j] for j in range(dk)):
            for i in range(di):
                for j in range(dk):
                    expected = n_i[i] * n_j[j] / total
                    actual = n_ij.get((i, j), 0.0)
                    chi2 += (actual - expected) ** 2 / expected
        threshold = chi2_ppf(
            1 - max_false_positive_probability, (di - 1) * (dk - 1)
        )
        if chi2 > threshold:
            correlations.append((ci, ck))

    return {
        "soft_keys": soft_keys,
        "trivial_columns": trivial,
        "sfds": sfds,
        "correlations": correlations,
    }
