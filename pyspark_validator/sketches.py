"""Mergeable sketches: HyperLogLog (register-exposed), Count-Min, and KLL.

Why custom: Spark's approx_count_distinct is HLL++ but never exposes registers, so
FAIDA-style register-wise inclusion testing (reference:
faida/inclusion_testing/hll_data.h:28-37 -- "dep subseteq ref iff every register of
dep <= ref's") and cross-snapshot sketch merging (checkpoint manifests) are
impossible with the built-in. Likewise percentile_approx answers a one-shot
query but cannot hand back a sketch to persist in a checkpoint manifest and
merge across snapshots/runs -- the KLL here can.

Execution model: the hashing is done JVM-side (xxhash64 -- whole-stage codegen),
then ONE mapInPandas pass computes a per-Arrow-batch partial sketch (numpy
vectorized, no per-row Python), emitting one serialized sketch row per batch.
Partials are tiny (2^p bytes for HLL, depth*width*8 for CMS) and are merged on the
driver -- a few KB per partition, the classic treeAggregate shape. Sketches
serialize to bytes => they can be persisted in the checkpoint manifest and merged
across snapshots/runs (the mergeable-sketch requirement of the north star).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


# ---------------------------------------------------------------------------
# HyperLogLog
@dataclass
class HLL:
    p: int  # 2^p registers
    registers: np.ndarray  # uint8[2^p]

    @property
    def m(self) -> int:
        return 1 << self.p

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def cardinality(self) -> float:
        """Standard HLL estimator with linear-counting small-range correction."""
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)
        return float(e)

    def register_contains(self, other: "HLL") -> bool:
        """FAIDA inclusion test (hll_data.h:28-37): other subseteq self is
        *plausible* iff every register of other <= self's. A single greater
        register PROVES non-inclusion; all-<= is a high-confidence accept."""
        assert self.p == other.p
        return bool(np.all(other.registers <= self.registers))

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int) -> "HLL":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())

    @classmethod
    def empty(cls, p: int) -> "HLL":
        return cls(p, np.zeros(1 << p, dtype=np.uint8))


def _hll_update(registers: np.ndarray, hashes: np.ndarray, p: int) -> None:
    """Vectorized register update from a batch of 64-bit hashes."""
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & _MASK64
    # rank = leading zeros of rest + 1 (capped at 64 - p + 1)
    # vectorized leading-zero count via bit_length emulation on uint64
    fl = np.zeros(len(rest), dtype=np.int64)
    nz = rest != 0
    # log2 on float is exact enough for leading-zero on 53-bit mantissa; use
    # a split to stay exact: top 32 bits first, then low 32.
    top = (rest >> np.uint64(32)).astype(np.uint32)
    low = (rest & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    bl_top = np.zeros(len(rest), dtype=np.int64)
    t_nz = top != 0
    bl_top[t_nz] = np.floor(np.log2(top[t_nz].astype(np.float64))).astype(np.int64) + 1
    bl_low = np.zeros(len(rest), dtype=np.int64)
    l_nz = low != 0
    bl_low[l_nz] = np.floor(np.log2(low[l_nz].astype(np.float64))).astype(np.int64) + 1
    bitlen = np.where(t_nz, bl_top + 32, bl_low)
    rank = np.where(nz, 64 - bitlen + 1, 64 - p + 1).astype(np.int64)
    np.maximum.at(registers, idx, np.minimum(rank, 255).astype(np.uint8))


def hll_sketch(df: DataFrame, columns: list[str], p: int = 12) -> HLL:
    """Build an HLL over the distinct tuples of ``columns``.

    xxhash64 JVM-side; one mapInPandas partial per Arrow batch; driver merges the
    <=#batches tiny partials (2^p bytes each).
    """
    hashed = df.select(F.xxhash64(*columns).alias("h"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        regs = np.zeros(1 << p, dtype=np.uint8)
        seen = False
        for b in batches:
            if len(b):
                seen = True
                _hll_update(regs, b["h"].to_numpy(dtype=np.int64).view(np.uint64), p)
        if seen:
            yield pd.DataFrame({"regs": [regs.tobytes()]})

    rows = hashed.mapInPandas(partials, "regs binary").collect()
    out = HLL.empty(p)
    for r in rows:
        out = out.merge(HLL.from_bytes(r.regs, p))
    return out


def hll_column_sketches(
    df: DataFrame, columns: list[str] | None = None, p: int = 12
) -> dict[str, HLL]:
    """Per-column HLLs from ONE scan (the FAIDA sketch-build pass,
    faida/hll_data.h: every column's register file fills from the same
    table read).  NULL cells are excluded -- SQL IND semantics; Spark's
    xxhash64(NULL) would otherwise alias all nulls to one shared value.
    Returns {column: HLL}; partials are (#batches x #columns) tiny rows."""
    columns = list(columns or df.columns)
    hashed = df.select(
        *[
            F.when(F.col(c).isNotNull(), F.xxhash64(c)).alias(f"h{i}")
            for i, c in enumerate(columns)
        ]
    )
    k = len(columns)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        regs = [np.zeros(1 << p, dtype=np.uint8) for _ in range(k)]
        seen = False
        for b in batches:
            if len(b):
                seen = True
                for i in range(k):
                    vals = b[f"h{i}"].dropna().to_numpy(dtype=np.int64)
                    if len(vals):
                        _hll_update(regs[i], vals.view(np.uint64), p)
        if seen:
            yield pd.DataFrame(
                {"i": list(range(k)), "regs": [r.tobytes() for r in regs]}
            )

    rows = hashed.mapInPandas(partials, "i int, regs binary").collect()
    out = {c: HLL.empty(p) for c in columns}
    for r in rows:
        c = columns[r["i"]]
        out[c] = out[c].merge(HLL.from_bytes(r.regs, p))
    return out


def hll_inclusion(
    lhs_df: DataFrame, lhs_cols: list[str], rhs_df: DataFrame, rhs_cols: list[str], p: int = 14
) -> dict:
    """FAIDA-style approximate inclusion: returns register verdict + cardinalities.
    'refuted'=True PROVES lhs not subseteq rhs (some lhs hash absent from rhs).
    NOTE: lhs/rhs column *values* must hash identically => same types/order."""
    l = hll_sketch(lhs_df, lhs_cols, p)
    r = hll_sketch(rhs_df, rhs_cols, p)
    plausible = r.register_contains(l)
    return {
        "plausible": plausible,
        "refuted": not plausible,
        "lhs_cardinality": l.cardinality(),
        "rhs_cardinality": r.cardinality(),
    }


# ---------------------------------------------------------------------------
# Count-Min sketch (heavy hitters at 10^12 scale: top-k without a full groupBy)
@dataclass
class CMS:
    depth: int
    width: int
    table: np.ndarray  # int64[depth, width]
    n: int = 0

    def merge(self, other: "CMS") -> "CMS":
        assert (self.depth, self.width) == (other.depth, other.width)
        return CMS(self.depth, self.width, self.table + other.table, self.n + other.n)

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Point-estimate counts for a batch of xxhash64 values (vectorized)."""
        h = hashes.astype(np.uint64)
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(self.depth):
            idx = ((h * np.uint64(2 * d + 1) + np.uint64(d * 0x9E3779B9)) & _MASK64) % np.uint64(self.width)
            est = np.minimum(est, self.table[d, idx.astype(np.int64)])
        return est

    def to_bytes(self) -> bytes:
        return self.table.tobytes()


def cms_sketch(df: DataFrame, columns: list[str], depth: int = 5, width: int = 8192) -> CMS:
    """Count-Min over tuple frequencies; same partial/merge shape as hll_sketch."""
    hashed = df.select(F.xxhash64(*columns).alias("h"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = np.zeros((depth, width), dtype=np.int64)
        n = 0
        for b in batches:
            if not len(b):
                continue
            h = b["h"].to_numpy(dtype=np.int64).view(np.uint64)
            n += len(h)
            for d in range(depth):
                idx = ((h * np.uint64(2 * d + 1) + np.uint64(d * 0x9E3779B9)) & _MASK64) % np.uint64(width)
                np.add.at(table[d], idx.astype(np.int64), 1)
        if n:
            yield pd.DataFrame({"table": [table.tobytes()], "n": [n]})

    rows = hashed.mapInPandas(partials, "table binary, n long").collect()
    out = CMS(depth, width, np.zeros((depth, width), dtype=np.int64), 0)
    for r in rows:
        out = out.merge(
            CMS(depth, width, np.frombuffer(r.table, dtype=np.int64).reshape(depth, width).copy(), r.n)
        )
    return out


# ---------------------------------------------------------------------------
# KLL quantile sketch (mergeable; persists in checkpoint manifests)


@dataclass
class KLL:
    """Karnin-Lang-Liberty quantile sketch over doubles.

    ``levels[i]`` holds items of weight 2^i; level capacities shrink
    geometrically from ``k`` at the top (c = 2/3, floor 2). Compaction keeps
    every other element of a sorted over-full level and promotes it one level
    up; the kept-offset alternates DETERMINISTICALLY (a counter, not a coin)
    so runs are reproducible -- the textbook analysis randomizes it, and the
    alternation preserves the rank-error bound on stream-order-independent
    data, which is what parquet scans give us. Size is O(k) regardless of n;
    rank error ~ O(1/k)."""

    k: int
    levels: list[np.ndarray]
    n: int = 0
    _coin: int = 0

    @classmethod
    def empty(cls, k: int = 200) -> "KLL":
        return cls(k=k, levels=[np.empty(0, dtype=np.float64)], n=0)

    def _cap(self, level: int) -> int:
        h = len(self.levels) - 1
        return max(int(np.ceil(self.k * (2.0 / 3.0) ** (h - level))), 2)

    def _compress(self) -> None:
        while sum(len(b) for b in self.levels) > sum(
            self._cap(i) for i in range(len(self.levels))
        ):
            for i, buf in enumerate(self.levels):
                if len(buf) > self._cap(i):
                    srt = np.sort(buf)
                    keep = srt[self._coin % 2 :: 2]
                    self._coin += 1
                    self.levels[i] = np.empty(0, dtype=np.float64)
                    if i + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[i + 1] = np.concatenate([self.levels[i + 1], keep])
                    break
            else:
                break

    def update_batch(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compress()

    def merge(self, other: "KLL") -> "KLL":
        assert self.k == other.k
        out = KLL.empty(self.k)
        out.n = self.n + other.n
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        for i in range(depth):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]).astype(np.float64))
        out._coin = self._coin + other._coin
        out._compress()
        return out

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate(self.levels) if self.levels else np.empty(0)
        wts = np.concatenate(
            [np.full(len(b), 1 << i, dtype=np.int64) for i, b in enumerate(self.levels)]
        ) if self.levels else np.empty(0, dtype=np.int64)
        order = np.argsort(vals, kind="mergesort")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        vals, wts = self._weighted()
        if not len(vals):
            return float("nan")
        cum = np.cumsum(wts)
        target = q * cum[-1]
        return float(vals[int(np.searchsorted(cum, target, side="left").clip(0, len(vals) - 1))])

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> float:
        """Approximate fraction of items <= x."""
        vals, wts = self._weighted()
        if not len(vals):
            return float("nan")
        cum = np.cumsum(wts)
        i = int(np.searchsorted(vals, x, side="right"))
        return float(cum[i - 1] / cum[-1]) if i > 0 else 0.0

    def to_bytes(self) -> bytes:
        import struct

        head = struct.pack("<qqq", self.k, self.n, len(self.levels))
        lens = struct.pack(f"<{len(self.levels)}q", *[len(b) for b in self.levels])
        return head + lens + b"".join(b.astype(np.float64).tobytes() for b in self.levels)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        import struct

        k, n, nlev = struct.unpack_from("<qqq", data, 0)
        off = 24
        lens = struct.unpack_from(f"<{nlev}q", data, off)
        off += 8 * nlev
        levels = []
        for ln in lens:
            levels.append(np.frombuffer(data, dtype=np.float64, count=ln, offset=off).copy())
            off += 8 * ln
        return cls(k=int(k), levels=levels, n=int(n))


def kll_sketch(df: DataFrame, column: str, k: int = 200) -> KLL:
    """Build a KLL over a numeric column: one mapInPandas pass emits a
    serialized per-partition sketch (O(k) bytes), driver merges -- the same
    treeAggregate shape as hll_sketch/cms_sketch, so the result can be stored
    in the checkpoint manifest and merged with later snapshots' sketches."""
    vals = df.select(F.col(column).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = KLL.empty(k)
        for b in batches:
            if len(b):
                sk.update_batch(b["v"].to_numpy(dtype=np.float64))
        if sk.n:
            yield pd.DataFrame({"sk": [sk.to_bytes()]})

    rows = vals.mapInPandas(partials, "sk binary").collect()
    out = KLL.empty(k)
    for r in rows:
        out = out.merge(KLL.from_bytes(r.sk))
    return out


# ---------------------------------------------------------------------------
# one-pass multi-column sketch profile (the north star's "combined in a
# single salted, skew-aware shuffle pass")


@dataclass
class ColumnSketches:
    """All three mergeable sketches for one column, plus exact null/row
    counts, as produced by :func:`sketch_profile`. Serializable pieces can be
    persisted in the checkpoint manifest and merged with later snapshots."""

    column: str
    hll: HLL
    cms: CMS
    kll: "KLL | None"
    n: int
    n_null: int

    def distinct_est(self) -> float:
        return self.hll.cardinality()

    def quantiles(self, qs: list[float]) -> "list[float] | None":
        return self.kll.quantiles(qs) if self.kll is not None else None

    def heavy_hitter_counts(self, spark, values: list) -> dict:
        """CMS point estimates for candidate values. The CMS is keyed by JVM
        xxhash64, so candidates are hashed by one tiny Spark job (len(values)
        rows) -- never a Python re-implementation of the hash."""
        rows = spark.createDataFrame(
            [(v,) for v in values], f"v {'string' if values and isinstance(values[0], str) else 'bigint'}"
        ).select(F.xxhash64("v").alias("h")).collect()
        hashes = np.array([r.h for r in rows], dtype=np.int64)
        est = self.cms.estimate_hashes(hashes)
        return {v: int(e) for v, e in zip(values, est)}


def _sketch_profile_frame(
    df: DataFrame,
    columns: list[str],
    p: int = 12,
    kll_k: int = 200,
    cms_depth: int = 5,
    cms_width: int = 8192,
    fanin: int = 64,
) -> tuple[DataFrame, list]:
    """HLL + CMS + KLL for EVERY requested column in ONE scan.

    The separate ``hll_sketch``/``cms_sketch``/``kll_sketch`` builders each
    cost a table scan; a 100 TB profile of 50 columns must not cost 150
    scans. Here the per-column hashing/casting is JVM-side (xxhash64 +
    try-cast to double), one mapInPandas pass updates every column's three
    sketches per Arrow batch (numpy, no per-row Python), and emits ONE
    serialized partial row per (input partition, column).

    Merging is a bounded-fan-in tree, not a driver collect: level 1 groups
    partials by (column, salt) with ``salt = spark_partition_id() % fanin``
    -- the salt bounds how many partials any single reducer materializes
    (applyInPandas loads a whole group: group bytes ~ (P/fanin) *
    sketch_bytes, so set fanin ~ sqrt(P) for very large task counts) and
    spreads the merge across the cluster instead of hot-spotting one reducer
    per column -- then level 2 merges the <=fanin survivors per column. Two
    tiny shuffles (P*C rows, then fanin*C rows); the driver receives exactly
    C rows.

    Numeric columns (castable to double) get a KLL; the KLL of a non-numeric
    column is None. NULLs are counted exactly and excluded from all sketches.
    """
    meta = []
    sel = []
    # date deliberately absent: cast(date as double) is not a valid Spark
    # cast; timestamps cast to epoch seconds
    numeric_kinds = ("int", "bigint", "smallint", "tinyint", "double", "float",
                     "decimal", "timestamp")
    for i, c in enumerate(columns):
        dt = df.schema[c].dataType.simpleString()
        is_num = any(dt.startswith(k) for k in numeric_kinds)
        meta.append((c, is_num))
        sel.append(F.xxhash64(F.col(c)).alias(f"h{i}"))
        sel.append(F.col(c).isNull().alias(f"m{i}"))
        if is_num:
            sel.append(F.col(c).cast("double").alias(f"v{i}"))

    hashed = df.select(*sel)
    out_schema = (
        "col string, hll binary, cms binary, kll binary, n long, n_null long"
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        regs = {i: np.zeros(1 << p, dtype=np.uint8) for i in range(len(meta))}
        tables = {
            i: np.zeros((cms_depth, cms_width), dtype=np.int64)
            for i in range(len(meta))
        }
        klls = {i: KLL.empty(kll_k) for i, (_, num) in enumerate(meta) if num}
        n = {i: 0 for i in range(len(meta))}
        n_null = {i: 0 for i in range(len(meta))}
        for b in batches:
            if not len(b):
                continue
            for i, (_, num) in enumerate(meta):
                mask = b[f"m{i}"].to_numpy(dtype=bool)
                h = b[f"h{i}"].to_numpy(dtype=np.int64)[~mask]
                n[i] += len(b)
                n_null[i] += int(mask.sum())
                if len(h):
                    hu = h.view(np.uint64)
                    _hll_update(regs[i], hu, p)
                    for d in range(cms_depth):
                        idx = (
                            (hu * np.uint64(2 * d + 1) + np.uint64(d * 0x9E3779B9))
                            & _MASK64
                        ) % np.uint64(cms_width)
                        # bincount beats np.add.at ~3x at these widths
                        tables[i][d] += np.bincount(
                            idx.astype(np.int64), minlength=cms_width
                        )
                if num:
                    v = b[f"v{i}"].to_numpy(dtype=np.float64)
                    v = v[~np.isnan(v)]
                    if len(v):
                        klls[i].update_batch(v)
        rows = []
        for i, (c, num) in enumerate(meta):
            if n[i] == 0:
                continue
            rows.append(
                {
                    "col": c,
                    "hll": regs[i].tobytes(),
                    "cms": tables[i].tobytes(),
                    "kll": klls[i].to_bytes() if num and klls[i].n else None,
                    "n": n[i],
                    "n_null": n_null[i],
                }
            )
        if rows:
            yield pd.DataFrame(rows)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        regs = None
        table = None
        kll = None
        n = 0
        n_null = 0
        for r in pdf.itertuples(index=False):
            regs = (
                np.frombuffer(r.hll, dtype=np.uint8).copy()
                if regs is None
                else np.maximum(regs, np.frombuffer(r.hll, dtype=np.uint8))
            )
            t = np.frombuffer(r.cms, dtype=np.int64).reshape(cms_depth, cms_width)
            table = t.copy() if table is None else table + t
            if r.kll is not None:
                k2 = KLL.from_bytes(r.kll)
                kll = k2 if kll is None else kll.merge(k2)
            n += int(r.n)
            n_null += int(r.n_null)
        return pd.DataFrame(
            [
                {
                    "col": pdf["col"].iloc[0],
                    "hll": regs.tobytes(),
                    "cms": table.tobytes(),
                    "kll": kll.to_bytes() if kll is not None else None,
                    "n": n,
                    "n_null": n_null,
                }
            ]
        )

    level0 = hashed.mapInPandas(partials, out_schema).withColumn(
        "salt", F.spark_partition_id() % F.lit(fanin)
    )
    level1 = level0.groupBy("col", "salt").applyInPandas(
        lambda pdf: merge_group(pdf.drop(columns=["salt"])), out_schema
    )
    final = level1.groupBy("col").applyInPandas(merge_group, out_schema)
    return final, meta


def sketch_profile(
    df: DataFrame,
    columns: list[str],
    p: int = 12,
    kll_k: int = 200,
    cms_depth: int = 5,
    cms_width: int = 8192,
    fanin: int = 64,
) -> dict[str, ColumnSketches]:
    final, meta = _sketch_profile_frame(
        df, columns, p=p, kll_k=kll_k, cms_depth=cms_depth,
        cms_width=cms_width, fanin=fanin,
    )
    result = {}
    for r in final.collect():
        c = r.col
        is_num = dict(meta)[c]
        result[c] = ColumnSketches(
            column=c,
            hll=HLL.from_bytes(r.hll, p),
            cms=CMS(
                cms_depth,
                cms_width,
                np.frombuffer(r.cms, dtype=np.int64)
                .reshape(cms_depth, cms_width)
                .copy(),
                int(r.n) - int(r.n_null),
            ),
            kll=KLL.from_bytes(r.kll) if (is_num and r.kll is not None) else None,
            n=int(r.n),
            n_null=int(r.n_null),
        )
    return result
