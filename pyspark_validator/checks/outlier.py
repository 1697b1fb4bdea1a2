"""Univariate outlier-row detection (robust fences).

The row-level anomaly check the reference's DataStats + typo-finding
scenarios imply but never package: given a numeric column, compute robust
fences once, then flag every row outside them. Three published methods:

  * iqr      -- Tukey fences: [q1 - f*IQR, q3 + f*IQR], f = 1.5 default
  * mad      -- modified z-score (Iglewicz-Hoaglin): |0.6745 (x - median)|
                / MAD > threshold (3.5 default)
  * zscore   -- classic |x - mean| / std > threshold (3.0 default);
                non-robust, included for parity with common expectations

Spark design: pass 1 is ONE agg computing the centers (exact percentiles in
oracle mode, percentile_approx at scale -- same switch as
stats.deviation_stats); pass 2 broadcasts the two fence literals into a
row-level filter, so flagging is scan-speed with full predicate pushdown.
Never a join, never a window.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAD_C = 0.6745  # Phi^{-1}(0.75): scales MAD to sigma-equivalents


@dataclass
class OutlierCheck:
    """Lazy outlier-row check over one numeric column."""

    df: DataFrame
    column: str
    method: str = "iqr"
    threshold: float | None = None  # method default when None
    exact: bool = True  # exact percentiles (sandbox) vs percentile_approx

    def __post_init__(self) -> None:
        if self.method not in ("iqr", "mad", "zscore"):
            raise ValueError("method must be iqr|mad|zscore")

    @cached_property
    def fences(self) -> tuple[float | None, float | None]:
        """(lo, hi) fence values; (None, None) when undefined (all-null
        column, or zero spread under mad/zscore -- every value is the
        center, nothing is an outlier)."""
        x = F.col(self.column).cast("double")

        def pct(p: float) -> Column:
            return (
                F.percentile(x, F.lit(p))
                if self.exact
                else F.percentile_approx(x, F.lit(p), 10000)
            )

        if self.method == "iqr":
            f = 1.5 if self.threshold is None else self.threshold
            row = self.df.agg(pct(0.25).alias("q1"), pct(0.75).alias("q3")).collect()[0]
            if row["q1"] is None:
                return None, None
            iqr = row["q3"] - row["q1"]
            return row["q1"] - f * iqr, row["q3"] + f * iqr
        if self.method == "mad":
            t = 3.5 if self.threshold is None else self.threshold
            med = self.df.agg(pct(0.5).alias("m")).collect()[0]["m"]
            if med is None:
                return None, None
            mad = self.df.agg(
                (
                    F.percentile(F.abs(x - F.lit(med)), F.lit(0.5))
                    if self.exact
                    else F.percentile_approx(
                        F.abs(x - F.lit(med)), F.lit(0.5), 10000
                    )
                ).alias("mad")
            ).collect()[0]["mad"]
            if not mad:  # zero spread: no outliers definable
                return None, None
            half = t * mad / _MAD_C
            return med - half, med + half
        t = 3.0 if self.threshold is None else self.threshold
        row = self.df.agg(
            F.avg(x).alias("m"), F.stddev_pop(x).alias("s")
        ).collect()[0]
        if row["m"] is None or not row["s"]:
            return None, None
        return row["m"] - t * row["s"], row["m"] + t * row["s"]

    def _flag(self) -> Column:
        lo, hi = self.fences
        x = F.col(self.column).cast("double")
        if lo is None:
            return F.lit(False)
        return x.isNotNull() & ((x < F.lit(lo)) | (x > F.lit(hi)))

    def summary(self) -> DataFrame:
        """Single row: [n, n_outliers, outlier_fraction, fence_lo, fence_hi,
        holds] -- holds iff no outliers (callers wanting a budget gate filter
        on outlier_fraction instead)."""
        lo, hi = self.fences
        x = F.col(self.column).cast("double")
        flag = self._flag()
        return self.df.agg(
            F.sum(x.isNotNull().cast("long")).alias("n"),
            F.sum(flag.cast("long")).alias("n_outliers"),
        ).select(
            "n",
            "n_outliers",
            F.try_divide(F.col("n_outliers"), F.col("n")).alias(
                "outlier_fraction"
            ),
            F.lit(lo).cast("double").alias("fence_lo"),
            F.lit(hi).cast("double").alias("fence_hi"),
            (F.col("n_outliers") == 0).alias("holds"),
        )

    def violations(self, id_cols: list[str] | None = None, cap: int = 1000) -> DataFrame:
        """Outlier rows [id_cols..., value], most extreme first (distance
        beyond its fence), capped."""
        lo, hi = self.fences
        x = F.col(self.column).cast("double")
        sel = [*(id_cols or []), x.alias("value")]
        if lo is None:
            return self.df.select(*sel).limit(0)
        dist = F.greatest(F.lit(lo) - x, x - F.lit(hi))
        return (
            self.df.filter(self._flag())
            .select(*sel, dist.alias("exceedance"))
            .orderBy(F.col("exceedance").desc(), *(id_cols or []))
            .limit(cap)
        )


def outlier_check(
    df: DataFrame,
    column: str,
    method: str = "iqr",
    threshold: float | None = None,
    exact: bool = True,
) -> OutlierCheck:
    """Robust univariate outlier-row detection. See OutlierCheck."""
    return OutlierCheck(
        df=df, column=column, method=method, threshold=threshold, exact=exact
    )


def embedding_outlier_check(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    top_k: int = 10,
    score_threshold: float | None = None,
) -> "EmbeddingOutlierCheck":
    """Embedding-space outlier detection via the DIAGONAL Mahalanobis score:
    score(x) = sum_j ((x_j - mean_j) / std_j)^2. Corrupt vectors (decode
    bugs, wrong-model embeddings, zeroed axes) score orders of magnitude
    above the bulk. The diagonal form keeps the whole pipeline JVM-side and
    engine-replayable (the full-covariance variant needs a matrix inverse --
    a driver-side numpy step -- without changing the plan shape).

    Plan: per-dim (n, sum, sum-of-squares) partials via ONE posexplode agg
    (shuffle carries dim rows); the collected mean/std literals broadcast
    into a zip_with + aggregate score expression, so scoring is scan-speed;
    top-k via TakeOrderedAndProject. See EmbeddingOutlierCheck."""
    return EmbeddingOutlierCheck(
        df=df,
        vec_col=vec_col,
        id_col=id_col,
        top_k=top_k,
        score_threshold=score_threshold,
    )


@dataclass
class EmbeddingOutlierCheck:
    df: DataFrame
    vec_col: str = "embedding"
    id_col: str = "vec_id"
    top_k: int = 10
    score_threshold: float | None = None

    @cached_property
    def _stats(self) -> tuple[list, list]:
        e = self.df.select(F.posexplode(F.col(self.vec_col)).alias("idx", "v"))
        v = F.col("v").cast("double")
        rows = (
            e.groupBy("idx")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(v).alias("s"),
                F.sum(v * v).alias("ss"),
            )
            .orderBy("idx")
            .collect()
        )
        means, stds = [], []
        for r in rows:
            m = r["s"] / r["n"]
            var = max(r["ss"] / r["n"] - m * m, 0.0)
            means.append(m)
            stds.append(var**0.5 if var > 0 else 1.0)  # constant dim: no signal
        return means, stds

    def _score(self) -> Column:
        means, stds = self._stats
        m_arr = F.array(*[F.lit(float(m)) for m in means])
        s_arr = F.array(*[F.lit(float(s)) for s in stds])
        diffs = F.zip_with(
            F.col(self.vec_col).cast("array<double>"),
            m_arr,
            lambda x, m: x - m,
        )
        z = F.zip_with(diffs, s_arr, lambda d, s: d / s)
        return F.aggregate(
            z, F.lit(0.0), lambda acc, t: acc + t * t
        )

    def scores(self) -> DataFrame:
        """[id, score] for every vector (lazy; scan-speed expression)."""
        return self.df.select(
            F.col(self.id_col).alias("id"), self._score().alias("score")
        )

    def top(self) -> DataFrame:
        """The top_k highest-scoring vectors (distributed heap), score desc
        then id asc."""
        return self.scores().orderBy(
            F.col("score").desc(), F.col("id")
        ).limit(self.top_k)

    def summary(self) -> DataFrame:
        """Single row: [n, dim, mean_score, max_score, n_flagged, holds].
        With no ``score_threshold`` the expected mean score is ~dim
        (chi-square with dim dof under normality) and holds is
        informational (always true)."""
        means, _ = self._stats
        s = self._score()
        flag = (
            F.lit(False)
            if self.score_threshold is None
            else s > F.lit(self.score_threshold)
        )
        return self.df.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(s).alias("mean_score"),
            F.max(s).alias("max_score"),
            F.sum(flag.cast("long")).alias("n_flagged"),
        ).select(
            "n",
            F.lit(len(means)).alias("dim"),
            "mean_score",
            "max_score",
            "n_flagged",
            (F.col("n_flagged") == 0).alias("holds"),
        )
