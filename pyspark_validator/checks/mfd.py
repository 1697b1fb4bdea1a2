"""Metric functional dependency (MFD) validation.

Reference (metric/metric_verifier.h:28-141, metric/enums.h:9-28): X -> Y holds with
parameter delta iff, within every X-cluster, all Y values fit in a ball of radius
delta under the chosen metric -- i.e. the cluster's Y-diameter (max pairwise
distance) is <= delta. Supported metrics there: euclidean (1-d and multi-d),
levenshtein, cosine over q-gram vectors; algorithms brute / approx / calipers.

Spark design -- metric-specific plans, never a driver loop:
  * euclidean 1-d: diameter == max(Y) - min(Y), a pure algebraic agg -- ONE shuffle,
    map-side combinable, skew-immune. (The reference needs pairwise scans; on a
    totally ordered 1-d metric the diameter collapses to range.)
  * euclidean k-d / levenshtein / cosine: diameter needs pairwise distances. We
    self-join each X-cluster with itself (equi-join on the X key -- hash-partitioned,
    AQE skew-split applies) keeping ordered pairs a<b, evaluate the distance with
    BUILT-IN JVM expressions (F.levenshtein; arithmetic for euclidean; q-gram cosine
    via a vectorized pandas UDF only where Spark lacks a primitive), then
    groupBy(X).max(dist). Pair blowup is quadratic per cluster -- exactly the
    reference's brute algorithm (enums.h:23 kBrute) -- so ``cluster_cap`` guards
    against a hot key exploding the join.
  * approx (enums.h:21-22 kApprox, metric_verifier.cpp ApproxVerifyCluster): the
    2-approximation -- radius r = max distance from one pivot point; the true
    diameter lies in [r, 2r] and the cluster is judged by 2r <= delta. One
    pivot join + one max agg: LINEAR in cluster size, no pair join, skew-safe.
    algo='auto' (default) verifies small clusters exactly and oversized ones
    with the approx bound, so every cluster gets an answer; algo='approx'
    forces the approx path everywhere (reference kApprox parity); algo='brute'
    restores the refuse-oversized behavior. (kCalipers, the single-node 2-d
    convex-hull walk, is subsumed by approx at scale and not implemented.)

The per-row invariant (span-sequence equality) is unaffected: Y here is a scalar
projection (e.g. total_text_len, an embedding dim, or a span text field).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pyspark_validator.canonical import NullMode, null_safe_key

_METRICS = ("euclidean", "levenshtein", "cosine")


def _qgram_cosine_dist(q: int):
    """Vectorized q-gram cosine distance (reference: util/qgram_vector.cpp +
    metric_verifier.h:48-50). Pandas UDF: Arrow-batched, never per-row Python."""

    @pandas_udf("double")
    def dist(a: pd.Series, b: pd.Series) -> pd.Series:
        def grams(s: str) -> dict[str, int]:
            d: dict[str, int] = {}
            for i in range(max(len(s) - q + 1, 0)):
                g = s[i : i + q]
                d[g] = d.get(g, 0) + 1
            return d

        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(None)
                continue
            ga, gb = grams(x), grams(y)
            dot = sum(v * gb.get(k, 0) for k, v in ga.items())
            na = sum(v * v for v in ga.values()) ** 0.5
            nb = sum(v * v for v in gb.values()) ** 0.5
            out.append(1.0 - (dot / (na * nb)) if na and nb else (0.0 if not na and not nb else 1.0))
        return pd.Series(out, dtype="float64")

    return dist


@dataclass
class MFDCheck:
    """Lazy MFD check of lhs -> rhs under ``metric`` with radius ``parameter``."""

    df: DataFrame
    lhs: list[str]
    rhs: list[str]
    metric: str = "euclidean"
    parameter: float = 0.0
    q: int = 2  # q-gram size for cosine (reference default config::kQGramSize)
    null_mode: NullMode = NullMode.EQUAL
    cluster_cap: int = 10_000
    highlight_cap: int = 100
    #: brute | approx | auto (enums.h:18-27; auto = brute below cluster_cap,
    #: approx 2-bound above it -- no refused clusters)
    algo: str = "auto"
    #: reference knob (metric_verifier.h:35 dist_from_null_is_infinity): when True
    #: a cluster containing a NULL RHS value can never fit in a finite ball ->
    #: violating; when False NULL values are skipped (distance undefined).
    dist_from_null_is_infinity: bool = False

    def __post_init__(self) -> None:
        if self.metric not in _METRICS:
            raise ValueError(f"unknown metric: {self.metric}; choose from {_METRICS}")
        if self.algo not in ("brute", "approx", "auto"):
            raise ValueError(f"unknown algo: {self.algo}")
        if self.metric in ("levenshtein", "cosine") and len(self.rhs) != 1:
            raise ValueError(f"{self.metric} MFD takes exactly one RHS column")
        if self.metric == "euclidean" and len(self.rhs) not in (1, 2):
            raise ValueError("euclidean MFD supports 1-d or 2-d RHS")

    @property
    def _xk(self) -> list[Column]:
        return [
            null_safe_key(F.col(c), self.null_mode).alias(f"__x{i}")
            for i, c in enumerate(self.lhs)
        ]

    @property
    def _xk_names(self) -> list[str]:
        return [f"__x{i}" for i in range(len(self.lhs))]

    # ---- fast path: 1-d euclidean -> range agg --------------------------------
    def _diameters_1d(self) -> DataFrame:
        y = F.col(self.rhs[0]).cast("double")
        return (
            self.df.select(*self._xk, y.alias("__y"))
            .groupBy(*self._xk_names)
            .agg(
                F.count(F.lit(1)).alias("cluster_size"),
                F.coalesce(F.max("__y") - F.min("__y"), F.lit(0.0)).alias("diameter"),
                (F.count(F.lit(1)) - F.count("__y")).alias("n_nulls"),
            )
            .withColumn("diameter_lb", F.col("diameter"))
            .withColumn("is_approx", F.lit(False))
        )

    # ---- pairwise path: cluster self-join -------------------------------------
    def _pair_dist(self, a: str, b: str) -> Column:
        if self.metric == "levenshtein":
            return F.levenshtein(
                F.col(f"{a}.__y0").cast("string"), F.col(f"{b}.__y0").cast("string")
            ).cast("double")
        if self.metric == "cosine":
            return _qgram_cosine_dist(self.q)(
                F.col(f"{a}.__y0").cast("string"), F.col(f"{b}.__y0").cast("string")
            )
        # euclidean 2-d
        dx = F.col(f"{a}.__y0").cast("double") - F.col(f"{b}.__y0").cast("double")
        dy = F.col(f"{a}.__y1").cast("double") - F.col(f"{b}.__y1").cast("double")
        return F.sqrt(dx * dx + dy * dy)

    @cached_property
    def _clusters(self) -> DataFrame:
        ys = [F.col(c).alias(f"__y{i}") for i, c in enumerate(self.rhs)]
        base = self.df.select(*self._xk, *ys)
        any_null = F.lit(False)
        for i in range(len(self.rhs)):
            any_null = any_null | F.col(f"__y{i}").isNull()
        sizes = base.groupBy(*self._xk_names).agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sum(any_null.cast("long")).alias("n_nulls"),
        )
        return base, sizes  # type: ignore[return-value]

    def _approx_records(self, keys: DataFrame) -> DataFrame:
        """2-approximation records for the given cluster keys
        (metric_verifier.cpp ApproxVerifyCluster): radius r from a
        deterministic pivot (the min Y tuple standing in for the reference's
        points[0]); diameter in [r, 2r], verdict by 2r. One equi-join + one
        max agg -- linear, no pair blowup."""
        base, sizes = self._clusters
        yn = [f"__y{i}" for i in range(len(self.rhs))]
        rows = base.join(keys.select(*self._xk_names), self._xk_names, "left_semi")
        pivots = rows.dropna(subset=yn).groupBy(*self._xk_names).agg(
            F.min(F.struct(*yn)).alias("__p")
        )
        j = rows.join(pivots, self._xk_names, "left")
        if self.metric == "levenshtein":
            d = F.levenshtein(
                F.col(yn[0]).cast("string"), F.col("__p.__y0").cast("string")
            ).cast("double")
        elif self.metric == "cosine":
            d = _qgram_cosine_dist(self.q)(
                F.col(yn[0]).cast("string"), F.col("__p.__y0").cast("string")
            )
        else:  # euclidean 2-d
            dx = F.col(yn[0]).cast("double") - F.col("__p.__y0").cast("double")
            dy = F.col(yn[1]).cast("double") - F.col("__p.__y1").cast("double")
            d = F.sqrt(dx * dx + dy * dy)
        radii = j.groupBy(*self._xk_names).agg(F.max(d).alias("__r"))
        return (
            keys.join(radii, self._xk_names, "left")
            .select(
                *self._xk_names,
                "cluster_size",
                (F.coalesce(F.col("__r"), F.lit(0.0)) * 2).alias("diameter"),
                "n_nulls",
                F.coalesce(F.col("__r"), F.lit(0.0)).alias("diameter_lb"),
                F.lit(True).alias("is_approx"),
            )
        )

    def _diameters_pairwise(self) -> DataFrame:
        base, sizes = self._clusters
        if self.algo == "approx":
            return self._approx_records(sizes)
        small = sizes.filter(F.col("cluster_size") <= self.cluster_cap)
        # distinct Y per cluster first: distances depend only on values, and
        # dedup collapses the quadratic blowup for heavy repeated values
        # (reference dedups via its value-id probing table the same way).
        vals = base.join(
            small.select(*self._xk_names), self._xk_names, "left_semi"
        ).dropDuplicates(self._xk_names + [f"__y{i}" for i in range(len(self.rhs))])
        a, b = vals.alias("a"), vals.alias("b")
        cond = None
        for k in self._xk_names:
            c = F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}"))
            cond = c if cond is None else cond & c
        # ordered pairs a<b by Y tuple => each unordered pair once
        ord_cols_a = [F.col(f"a.__y{i}") for i in range(len(self.rhs))]
        ord_cols_b = [F.col(f"b.__y{i}") for i in range(len(self.rhs))]
        lt = F.struct(*ord_cols_a) < F.struct(*ord_cols_b)
        pairs = a.join(b, cond & lt, "inner").select(
            *[F.col(f"a.{k}").alias(k) for k in self._xk_names],
            self._pair_dist("a", "b").alias("__d"),
        )
        diam = pairs.groupBy(*self._xk_names).agg(F.max("__d").alias("diameter"))
        # singleton / single-value clusters have diameter 0
        exact = (
            small.join(diam, self._xk_names, "left")
            .select(
                *self._xk_names,
                "cluster_size",
                F.coalesce("diameter", F.lit(0.0)).alias("diameter"),
                "n_nulls",
            )
            .withColumn("diameter_lb", F.col("diameter"))
            .withColumn("is_approx", F.lit(False))
        )
        if self.algo == "brute":
            return exact  # oversized clusters are refused (see oversized())
        over = sizes.filter(F.col("cluster_size") > self.cluster_cap)
        return exact.unionByName(self._approx_records(over))

    @cached_property
    def diameters(self) -> DataFrame:
        if self.metric == "euclidean" and len(self.rhs) == 1:
            return self._diameters_1d()
        return self._diameters_pairwise()

    def oversized(self) -> DataFrame:
        """Clusters exceeding cluster_cap: refused under algo='brute',
        resolved by the 2-approximation otherwise."""
        if self.metric == "euclidean" and len(self.rhs) == 1:
            return self.diameters.filter(F.lit(False))
        _, sizes = self._clusters
        return sizes.filter(F.col("cluster_size") > self.cluster_cap)

    def summary(self) -> DataFrame:
        """Single row: holds (GetResult analog), n_clusters, n_violating_clusters,
        max_diameter, n_oversized, n_approx_clusters. Approx-judged clusters
        use the reference kApprox decision (2 * pivot radius vs parameter);
        their `diameter` is the upper bound 2r, so max_diameter stays an upper
        bound of the true max diameter. Only algo='brute' leaves oversized
        clusters unanswered (and then they block holds)."""
        viol = F.col("diameter") > self.parameter
        if self.dist_from_null_is_infinity:
            # a NULL coordinate makes the cluster's diameter infinite
            # (metric_verifier.h dist_from_null_is_infinity) -- but a cluster
            # that is ONLY nulls has no points and trivially holds.
            viol = viol | (
                (F.col("n_nulls") > 0) & (F.col("n_nulls") < F.col("cluster_size"))
            )
        s = self.diameters.agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum(viol.cast("long")).alias("n_violating_clusters"),
            F.max("diameter").alias("max_diameter"),
            F.sum(F.when(viol, F.col("cluster_size")).otherwise(0)).alias(
                "n_violating_rows"
            ),
            F.sum(F.col("is_approx").cast("long")).alias("n_approx_clusters"),
        )
        n_over = self.oversized().agg(F.count(F.lit(1)).alias("n_oversized"))
        refused = (
            F.col("n_oversized") if self.algo == "brute" else F.lit(0).cast("long")
        )
        return s.crossJoin(n_over).select(
            ((F.col("n_violating_clusters") == 0) & (refused == 0)).alias("holds"),
            "n_clusters",
            "n_violating_clusters",
            "n_violating_rows",
            "max_diameter",
            "n_oversized",
            "n_approx_clusters",
        )

    def highlights(self) -> DataFrame:
        """Violating clusters by diameter desc, capped (reference highlights:
        metric/highlight_calculator.h). Gated: run after a failed verdict."""
        return (
            self.diameters.filter(F.col("diameter") > self.parameter)
            .orderBy(F.desc("diameter"))
            .limit(self.highlight_cap)
        )


def mfd_check(
    df: DataFrame,
    lhs: list[str],
    rhs: list[str],
    metric: str = "euclidean",
    parameter: float = 0.0,
    q: int = 2,
    null_mode: NullMode = NullMode.EQUAL,
    cluster_cap: int = 10_000,
    highlight_cap: int = 100,
    dist_from_null_is_infinity: bool = False,
    algo: str = "auto",
) -> MFDCheck:
    """Validate a metric FD. See MFDCheck."""
    return MFDCheck(
        df=df,
        lhs=list(lhs),
        rhs=list(rhs),
        metric=metric,
        parameter=parameter,
        q=q,
        null_mode=null_mode,
        cluster_cap=cluster_cap,
        highlight_cap=highlight_cap,
        dist_from_null_is_infinity=dist_from_null_is_infinity,
        algo=algo,
    )
