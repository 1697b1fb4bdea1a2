"""DES: numerical-association-rule discovery (the reference's DES miner).

Reference semantics (nar/des/des.cpp, encoded_nar.cpp,
encoded_value_range.cpp, differential_functions.cpp, rng.h): differential
evolution over encoded NARs -- each individual is an implication-sign
position plus, per feature, (permutation, threshold, bound1, bound2) in
[0,1]; decode sorts features by permutation descending, keeps a feature
when threshold >= a fresh RNG draw, places it in the consequent when its
processed position exceeds sign_pos * (p-1), and maps bounds into the
feature's domain (numeric min/max span with int truncation toward zero,
categorical first-appearance index). Each generation mutates candidate
i % population_size with rand/1/bin (three distinct random donors, per-gene
crossover), accepts on strictly greater fitness, and collects accepted
mutants whose support/confidence strictly exceed minsup/minconf; the
collection is sorted by fitness descending (des.cpp:75-98).

The RNG replays std::mt19937 with libstdc++'s generate_canonical<double,53>
(two 32-bit draws: (a + b*2^32) / 2^64) so a given seed yields the
reference's exact evolution trajectory.

Spark-first split: the evolution loop is driver-side control (exactly as
in the single-node reference -- the state is population_size * (4p+1)
doubles); ALL data touches are quality evaluations, each one
conditional-sum aggregation over a cached dictionary-light frame. The
whole initial population is evaluated in ONE batched agg job (decodes are
drawn first in RNG order, evaluation draws nothing); the steady-state loop
is one tiny agg job per fitness evaluation, the map-side-combinable scan
being the only distributed cost at 100 TB.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class MT19937:
    """std::mt19937 (init_genrand seeding, 32-bit tempered output)."""

    def __init__(self, seed: int = 5489):
        self.mt = [0] * 624
        self.mt[0] = seed & 0xFFFFFFFF
        for i in range(1, 624):
            self.mt[i] = (
                1812433253 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 30)) + i
            ) & 0xFFFFFFFF
        self.index = 624

    def _generate(self):
        mt = self.mt
        for i in range(624):
            y = (mt[i] & 0x80000000) + (mt[(i + 1) % 624] & 0x7FFFFFFF)
            mt[i] = mt[(i + 397) % 624] ^ (y >> 1)
            if y & 1:
                mt[i] ^= 0x9908B0DF
        self.index = 0

    def next32(self) -> int:
        if self.index >= 624:
            self._generate()
        y = self.mt[self.index]
        self.index += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y


class RefRNG:
    """rng.h: uniform_real_distribution<double>(0,1) over mt19937 --
    libstdc++ generate_canonical<double,53> consumes two 32-bit draws."""

    def __init__(self, seed: int = 2):
        self._mt = MT19937(seed)

    def next(self) -> float:
        a = self._mt.next32()
        b = self._mt.next32()
        return (a + (b << 32)) / 18446744073709551616.0  # 2^64


# --- domains ------------------------------------------------------------------

_NUMERIC_INT = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC_FLOAT = (T.FloatType, T.DoubleType, T.DecimalType)


@dataclass
class FeatureDomain:
    """CreateValueRange (value_range.cpp:36-50): numeric [min, max] or the
    categorical domain in first-appearance order."""

    kind: str  # 'int' | 'double' | 'string'
    lo: float | None = None
    hi: float | None = None
    values: list | None = None


@dataclass
class NarRule:
    """NAR (nar/nar.h): feature -> range maps plus qualities. Numeric
    entries are (lower, upper); categorical entries a single value
    (encoded_value_range.cpp:56-63 binds one category)."""

    ante: dict
    cons: dict
    fitness: float
    support: float
    confidence: float

    def to_string(self) -> str:
        fmt = lambda m: ", ".join(
            f"{k}: {v}" for k, v in sorted(m.items())
        )
        return f"{{{fmt(self.ante)}}} ===> {{{fmt(self.cons)}}}"

    def __str__(self) -> str:
        return self.to_string()


def _feature_domains(
    df: DataFrame, columns: list[str], order_col: str | None, max_domain: int
) -> list[FeatureDomain]:
    """One batched agg for the numeric mins/maxes; per string column one
    groupBy for the distinct domain in first-appearance order (by
    ``order_col``) -- the reference's insertion order over rows
    (value_range.cpp:7-15). Without order_col the domain is value-sorted
    (deterministic, order-free at scale)."""
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    aggs, kinds = [], {}
    for c in columns:
        t = dtypes[c]
        if isinstance(t, _NUMERIC_INT):
            kinds[c] = "int"
        elif isinstance(t, _NUMERIC_FLOAT):
            kinds[c] = "double"
        elif isinstance(t, T.StringType):
            kinds[c] = "string"
            continue
        else:
            raise ValueError(f"unsupported NAR feature type {t} for {c}")
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    row = df.agg(*aggs).collect()[0] if aggs else None
    out = []
    for c in columns:
        if kinds[c] == "string":
            if order_col is not None:
                dom = (
                    df.groupBy(c)
                    .agg(F.min(order_col).alias("__o"))
                    .orderBy("__o")
                    .limit(max_domain + 1)
                    .collect()
                )
                values = [r[c] for r in dom]
            else:
                dom = df.select(c).distinct().orderBy(c).limit(max_domain + 1).collect()
                values = [r[c] for r in dom]
            if len(values) > max_domain:
                raise ValueError(f"categorical domain of {c} exceeds {max_domain}")
            out.append(FeatureDomain("string", values=values))
        else:
            out.append(
                FeatureDomain(kinds[c], lo=float(row[f"mn_{c}"]), hi=float(row[f"mx_{c}"]))
            )
    return out


# --- encoding / decoding (encoded_nar.cpp, encoded_value_range.cpp) -----------


class _Encoded:
    __slots__ = ("sign", "genes", "fitness", "support", "confidence")

    def __init__(self, sign: float, genes: list[list[float]]):
        self.sign = sign
        self.genes = genes  # per feature: [permutation, threshold, b1, b2]
        self.fitness = self.support = self.confidence = 0.0

    def vector_size(self) -> int:
        return len(self.genes) * 4 + 1

    def get(self, i: int) -> float:
        if i == 0:
            return self.sign
        i -= 1
        return self.genes[i // 4][i % 4]

    def set(self, i: int, v: float) -> None:
        if i == 0:
            self.sign = v
        else:
            i -= 1
            self.genes[i // 4][i % 4] = v

    def copy(self) -> "_Encoded":
        return _Encoded(self.sign, [g[:] for g in self.genes])


def _decode_range(gene: list[float], dom: FeatureDomain):
    b1, b2 = gene[2], gene[3]
    if dom.kind == "string":
        span = len(dom.values)
        idx = int(min(max(b1 * span, 0.0), span - 1.0))
        return dom.values[idx]
    span = dom.hi - dom.lo
    lo, hi = dom.lo + span * b1, dom.lo + span * b2
    if dom.kind == "int":
        lo, hi = float(int(lo)), float(int(hi))  # C++ Int truncation
    return (min(lo, hi), max(lo, hi))


def _decode(ind: _Encoded, domains: list[FeatureDomain], rng: RefRNG):
    """EncodedNAR::Decode (encoded_nar.cpp:57-84): permutation-desc order,
    per-feature keep draw, implication split."""
    p = len(ind.genes)
    order = sorted(range(p), key=lambda i: ind.genes[i][0], reverse=True)
    sign_after = int(ind.sign * (p - 1))
    ante, cons = {}, {}
    processed = 0
    for fi in order:
        if ind.genes[fi][1] < rng.next():
            processed += 1
            continue
        decoded = _decode_range(ind.genes[fi], domains[fi])
        if processed > sign_after:
            cons[fi] = decoded
        else:
            ante[fi] = decoded
        processed += 1
    return ante, cons


def _rand_indices(except_i: int, pop: int, k: int, rng: RefRNG) -> list[int]:
    """GetRandIndices (differential_functions.cpp:8-19): rejection into an
    ordered set, except_index removed, ascending order."""
    s = {except_i}
    while len(s) < k + 1:
        s.add(int(rng.next() * pop))
    s.discard(except_i)
    return sorted(s)


def _rand1bin(pop: list[_Encoded], i: int, cross: float, scale: float,
              rng: RefRNG) -> _Encoded:
    idx = _rand_indices(i, len(pop), 3, rng)
    s1, s2, s3 = pop[idx[0]], pop[idx[1]], pop[idx[2]]
    new = pop[i].copy()
    for g in range(new.vector_size()):
        if rng.next() < cross:
            v = s1.get(g) + scale * (s2.get(g) - s3.get(g))
            new.set(g, min(max(v, 0.0), 1.0))
    return new


# --- quality evaluation (nar.cpp:25-73) ----------------------------------------


def _fits(columns: list[str], side: dict) -> Column:
    conds = []
    for fi, rng in sorted(side.items()):
        c = F.col(columns[fi])
        if isinstance(rng, tuple):
            conds.append(c.isNotNull() & (c >= F.lit(rng[0])) & (c <= F.lit(rng[1])))
        else:
            conds.append(c.isNotNull() & (c == F.lit(rng)))
    return reduce(lambda a, b: a & b, conds) if conds else F.lit(True)


def _qualities(counts, n_rows: int, n_features: int, n_incl: int):
    fit_ante, fit_both = counts
    if fit_ante == 0 or fit_both == 0:
        return 0.0, 0.0, 0.0
    support = fit_both / n_rows
    confidence = fit_both / fit_ante
    inclusion = n_incl / n_features
    return (confidence + support + inclusion) / 3.0, support, confidence


def _eval_batch(df: DataFrame, columns: list[str], rules: list) -> list:
    """Evaluate many (ante, cons) pairs in one conditional-sum agg."""
    aggs = []
    for j, (ante, cons) in enumerate(rules):
        if not ante or not cons:
            aggs += [F.lit(0).alias(f"a{j}"), F.lit(0).alias(f"b{j}")]
            continue
        fa = _fits(columns, ante)
        fb = fa & _fits(columns, cons)
        aggs.append(F.sum(F.when(fa, 1).otherwise(0)).alias(f"a{j}"))
        aggs.append(F.sum(F.when(fb, 1).otherwise(0)).alias(f"b{j}"))
    row = df.agg(*aggs).collect()[0]
    return [(int(row[f"a{j}"] or 0), int(row[f"b{j}"] or 0)) for j in range(len(rules))]


# --- the miner ------------------------------------------------------------------


def mine_nars(
    df: DataFrame,
    columns: list[str] | None = None,
    minsup: float = 0.0,
    minconf: float = 0.0,
    population_size: int = 100,
    max_fitness_evaluations: int = 100,
    crossover_probability: float = 0.9,
    differential_scale: float = 0.5,
    seed: int = 2,
    order_col: str | None = None,
    max_domain: int = 10_000,
    batch_init: int = 32,
) -> list[NarRule]:
    """DES NAR mining (des.cpp ExecuteInternal, kRand1Bin strategy).

    Faithful to the reference's seeded trajectory: same mt19937 stream,
    same draw order (encode, then decode-threshold draws, then per-gene
    crossover draws), same strictly-greater acceptance and collection
    rules. ``order_col`` fixes categorical first-appearance order (the
    reference's row order); omit it for order-free value-sorted domains.
    ``batch_init`` bounds how many initial-population evaluations share
    one agg job (wide agg expressions compile quadratically)."""
    columns = list(columns or df.columns)
    p = len(columns)
    if p < 2:
        raise ValueError("NAR mining needs at least two feature columns")
    rng = RefRNG(seed)
    data = df.select(*columns).persist()
    n_rows = data.count()
    domains = _feature_domains(df, columns, order_col, max_domain)

    # initial population: all RNG draws first (ctor order: sign, 4p genes,
    # then decode's p threshold draws -- encoded_nar.cpp:87-95), evaluation
    # batched afterwards since it draws nothing.
    population: list[_Encoded] = []
    decoded_init = []
    for _ in range(population_size):
        sign = rng.next()
        genes = [[rng.next() for _ in range(4)] for _ in range(p)]
        ind = _Encoded(sign, genes)
        decoded_init.append(_decode(ind, domains, rng))
        population.append(ind)
    for lo in range(0, population_size, batch_init):
        chunk = decoded_init[lo : lo + batch_init]
        counts = _eval_batch(data, columns, chunk)
        for off, (ante, cons) in enumerate(chunk):
            ind = population[lo + off]
            ind.fitness, ind.support, ind.confidence = _qualities(
                counts[off], n_rows, p, len(ante) + len(cons)
            )
    population.sort(key=lambda x: x.fitness, reverse=True)  # stable_sort

    collected: list[NarRule] = []
    for i in range(max_fitness_evaluations):
        ci = i % population_size
        mutant = _rand1bin(
            population, ci, crossover_probability, differential_scale, rng
        )
        ante, cons = _decode(mutant, domains, rng)
        counts = _eval_batch(data, columns, [(ante, cons)])[0]
        fit, sup, conf = _qualities(counts, n_rows, p, len(ante) + len(cons))
        mutant.fitness, mutant.support, mutant.confidence = fit, sup, conf
        if fit > population[ci].fitness:
            population[ci] = mutant
            if sup > minsup and conf > minconf:
                collected.append(
                    NarRule(
                        {columns[k]: v for k, v in ante.items()},
                        {columns[k]: v for k, v in cons.items()},
                        fit, sup, conf,
                    )
                )
    data.unpersist()
    collected.sort(key=lambda r: r.fitness, reverse=True)
    return collected
