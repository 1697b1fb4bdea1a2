"""Probabilistic Approximate Constraint (Domain PAC) validation.

Reference (pac/domain_pac.h:15-21, pac_verifier/pac_verifier.h:13-35,
domain_pac_verifier.h): a Domain PAC "Pr(x in D +- epsilon) >= delta" over an
ordered domain D. The verifier computes each value's distance to the domain,
sorts them, and reads (epsilon, delta) pairs off the empirical CDF -- either
validating one parameter given the other, or picking a knee via the elbow
method when neither is pinned.

Spark design: the distance is a pure Column expression; delta-for-epsilon is
one conditional-mean aggregation, epsilon-for-delta is one quantile
(percentile_approx = the KLL-family sketch -- the trillion-row path; exact
percentile for oracles), and the ECDF grid is a single agg returning
``delta_steps`` quantiles. The elbow search runs driver-side over the tiny
grid, mirroring the reference's diagonal-threshold scan
(pac_verifier.h:22-26)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_distance(col: Column, lo: float, hi: float) -> Column:
    """Distance to the interval domain [lo, hi]: 0 inside, linear outside."""
    x = col.cast("double")
    return F.greatest(F.lit(0.0), F.lit(float(lo)) - x, x - F.lit(float(hi)))


def value_set_distance(col: Column, values: list) -> Column:
    """Distance to a finite numeric domain: min |x - v| over the set."""
    x = col.cast("double")
    return F.least(*[F.abs(x - F.lit(float(v))) for v in values])


def categorical_distance(col: Column, values: list) -> Column:
    """0 if the value is in the domain, else 1 (unordered domain)."""
    return F.when(col.isin(values), F.lit(0.0)).otherwise(F.lit(1.0))


@dataclass
class DomainPACCheck:
    """Lazy Domain-PAC check over a distance expression.

    Build the distance with one of the helpers above (or any Column).
    NULL distances are excluded, matching the reference's typed-tuple filter.
    """

    df: DataFrame
    distance: Column
    exact: bool = False

    def _dists(self) -> DataFrame:
        return self.df.select(self.distance.alias("__d")).filter(
            F.col("__d").isNotNull()
        )

    def delta_for_epsilon(self, epsilon: float) -> DataFrame:
        """Pr(dist <= epsilon): single row [epsilon, delta, n]."""
        return self._dists().agg(
            F.lit(float(epsilon)).alias("epsilon"),
            F.avg((F.col("__d") <= epsilon).cast("double")).alias("delta"),
            F.count(F.lit(1)).alias("n"),
        )

    def epsilon_for_delta(self, delta: float) -> DataFrame:
        """Smallest epsilon with Pr(dist <= epsilon) >= delta: the delta-quantile
        of the distance distribution. Single row [epsilon, delta]."""
        q = (
            F.percentile(F.col("__d"), F.lit(float(delta)))
            if self.exact
            else F.percentile_approx(F.col("__d"), F.lit(float(delta)), 10000)
        )
        return self._dists().agg(
            q.alias("epsilon"), F.lit(float(delta)).alias("delta")
        )

    def holds(self, epsilon: float, delta: float) -> DataFrame:
        """Verdict for a fully specified PAC: Pr(dist <= eps) >= delta.
        [holds, epsilon, delta, actual_delta, n, n_violating_rows]."""
        d = F.col("__d")
        return self._dists().agg(
            F.lit(float(epsilon)).alias("epsilon"),
            F.lit(float(delta)).alias("delta"),
            F.avg((d <= epsilon).cast("double")).alias("actual_delta"),
            F.count(F.lit(1)).alias("n"),
            F.sum((d > epsilon).cast("long")).alias("n_violating_rows"),
        ).select(
            (F.col("actual_delta") >= F.col("delta")).alias("holds"),
            "epsilon",
            "delta",
            "actual_delta",
            "n",
            "n_violating_rows",
        )

    def ecdf(self, min_delta: float = 0.9, steps: int = 100) -> DataFrame:
        """(epsilon_i, delta_i) grid rows for delta_i in [min_delta, 1]: ONE
        aggregation returning all quantiles (the sketched ECDF of FindEpsilons,
        domain_pac_verifier.h:44-48)."""
        deltas = [
            min_delta + (1.0 - min_delta) * i / max(steps - 1, 1)
            for i in range(steps)
        ]
        probs = F.array(*[F.lit(d) for d in deltas])
        q = (
            F.percentile(F.col("__d"), probs)
            if self.exact
            else F.percentile_approx(F.col("__d"), probs, 10000)
        )
        row = self._dists().agg(q.alias("eps"))
        pairs = row.select(
            F.explode(
                F.arrays_zip(
                    F.col("eps").alias("epsilon"),
                    F.array(*[F.lit(d) for d in deltas]).alias("delta"),
                )
            ).alias("p")
        )
        return pairs.select(F.col("p.epsilon").alias("epsilon"), F.col("p.delta").alias("delta"))

    def elbow(
        self, min_delta: float = 0.9, steps: int = 100, diagonal_threshold: float = 1e-5
    ) -> dict:
        """Pick the knee of the ECDF: the largest delta whose local slope
        d(epsilon)/d(delta) stays below ``diagonal_threshold`` x the full range
        (the reference's 'still considered horizontal' scan). Driver-side over
        the ``steps``-row grid. Returns {'epsilon','delta'}."""
        grid = [(r.epsilon, r.delta) for r in self.ecdf(min_delta, steps).collect()]
        if not grid:
            return {"epsilon": 0.0, "delta": 1.0}
        eps_range = max(e for e, _ in grid) - min(e for e, _ in grid)
        if eps_range == 0:  # flat ECDF: everything is in the domain
            return {"epsilon": grid[-1][0], "delta": 1.0}
        best = grid[0]
        for (e0, d0), (e1, d1) in zip(grid, grid[1:]):
            slope = (e1 - e0) / max(d1 - d0, 1e-12) / eps_range
            if slope <= diagonal_threshold:
                best = (e1, d1)
            else:
                break
        return {"epsilon": best[0], "delta": best[1]}


def domain_pac_check(
    df: DataFrame, distance: Column, exact: bool = False
) -> DomainPACCheck:
    """Validate a Domain PAC. Build ``distance`` with interval_distance /
    value_set_distance / categorical_distance."""
    return DomainPACCheck(df=df, distance=distance, exact=exact)
