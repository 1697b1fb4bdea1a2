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


    # -- reference-exact refinement (pac_verifier.cpp, domain_pac_verifier.cpp)

    _DIST_THRESHOLD = 1e-12  # PACVerifier::kDistThreshold

    def highlights(self, eps_1: float, eps_2: float | None = None) -> DataFrame:
        """GetHighlights (domain_pac_verifier.cpp:158-182): the original rows
        whose distance lies in (eps_1, eps_2], in-domain rows (distance below
        the float threshold) excluded. ``eps_2`` defaults to the refined
        epsilon, like the reference's ``pac_->GetEpsilon()`` fallback."""
        if eps_2 is None:
            eps_2 = self.refine()["epsilon"]
        if eps_2 <= eps_1:
            return self.df.withColumn("__d", self.distance).filter(F.lit(False))
        d = F.col("__d")
        return (
            self.df.withColumn("__d", self.distance)
            .filter(
                d.isNotNull()
                & (d >= self._DIST_THRESHOLD)
                & (d > eps_1)
                & (d <= eps_2)
            )
        )

    def _cdf(self, max_distinct: int) -> tuple[list[float], list[int]]:
        """Sorted distinct distances with cumulative counts -- ONE groupBy.
        The reference sorts all n distances; every step of its walk reads
        only bucket boundaries, so the distinct-distance CDF is sufficient
        AND exact. ``max_distinct`` guards the collect (near-continuous
        distance columns should quantize the distance expression first; the
        walk itself touches only O(delta_steps) ranks, so a sketched-quantile
        path exists at scale -- see ecdf())."""
        rows = (
            self._dists()
            .groupBy("__d")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("__d")
            .limit(max_distinct + 1)
            .collect()
        )
        if len(rows) > max_distinct:
            raise ValueError(
                f"more than max_distinct={max_distinct} distinct distances; "
                "quantize the distance expression or raise the guard"
            )
        vals, cum, total = [], [], 0
        for r in rows:
            total += r["c"]
            vals.append(float(r["__d"]))
            cum.append(total)
        return vals, cum

    def _eps_delta_for_epsilon(self, vals, cum, epsilon):
        """GetEpsilonDeltaForEpsilon (domain_pac_verifier.cpp:141-156):
        step back from the first distance > epsilon, then absorb the
        near-equal run."""
        n = cum[-1]
        import bisect

        i = bisect.bisect_right(vals, epsilon)
        if i > 0:
            i -= 1
        eps = vals[i]
        while i + 1 < len(vals) and vals[i + 1] - eps < self._DIST_THRESHOLD:
            i += 1
        return eps, cum[i] / n

    def _find_epsilons(self, vals, cum, min_delta, delta_steps):
        """FindEpsilons (domain_pac_verifier.cpp:46-105) on the CDF."""
        import math

        n = cum[-1]
        min_tuples = math.ceil(min_delta * n)
        if delta_steps <= 1:
            step = n - min_tuples
        else:
            step = int((n - min_tuples) / (delta_steps - 1))
        if step == 0:
            step = 1
        # domain = distances below the float threshold
        domain_size = 0
        for v, c in zip(vals, cum):
            if abs(v) < self._DIST_THRESHOLD:
                domain_size = c
            else:
                break
        result = []
        if n and domain_size / n > min_delta - self._DIST_THRESHOLD:
            result.append((0.0, domain_size / n))
        curr = domain_size
        needed = min_tuples
        while needed <= n:
            if needed > curr:
                curr = min(needed, n)
                # eps = distance of the curr-th element; absorb the run
                import bisect

                b = bisect.bisect_left(cum, curr)
                eps = vals[b]
                while b + 1 < len(vals) and vals[b + 1] - eps < self._DIST_THRESHOLD:
                    b += 1
                curr = cum[b]
                result.append((eps, curr / n))
            needed += step
        result.append((vals[-1], 1.0))
        return result

    def refine(
        self,
        min_epsilon: float = 0.0,
        max_epsilon: float = -1.0,
        min_delta: float | None = None,
        delta_steps: int | None = None,
        diagonal_threshold: float = 1e-5,
        max_distinct: int = 100_000,
    ) -> dict:
        """The reference's exact (epsilon, delta) refinement: FindEpsilons +
        FindEpsilonDelta replayed verbatim (pac_verifier.cpp:74-235,
        domain_pac_verifier.cpp:46-156) over the distinct-distance CDF.
        Option defaults mirror PACVerifier::RegisterOptions: min_delta
        defaults to 0.9 unless an epsilon bound was given (then 0);
        delta_steps defaults to round((1 - min_delta) * 1000)."""
        if min_delta is None:
            min_delta = 0.0 if (min_epsilon > 0 or max_epsilon >= 0) else 0.9
        if delta_steps is None:
            delta_steps = round((1 - min_delta) * 1000)
        thresh = self._DIST_THRESHOLD
        vals, cum = self._cdf(max_distinct)
        if not vals:
            return {"epsilon": 0.0, "delta": 1.0}
        emp = self._find_epsilons(vals, cum, min_delta, delta_steps)

        # TryValidatePAC (pac_verifier.cpp:74-95)
        if max_epsilon >= 0:
            import bisect

            i = bisect.bisect_left([d for _, d in emp], min_delta)
            if i < len(emp) and emp[i][0] > max_epsilon:
                return {"epsilon": emp[i][0], "delta": emp[i][1]}
        if max_epsilon >= 0 and min_epsilon > 0 and max_epsilon - min_epsilon < thresh:
            e, d = self._eps_delta_for_epsilon(vals, cum, min_epsilon)
            return {"epsilon": e, "delta": d}

        # CheckPairsBetweenMinMaxEpsilon (pac_verifier.cpp:97-120)
        if max_epsilon >= 0 and min_epsilon > 0:
            import bisect

            j = bisect.bisect_right([e for e, _ in emp], min_epsilon)
            if j < len(emp) and emp[j][0] > max_epsilon:
                e, d = self._eps_delta_for_epsilon(vals, cum, min_epsilon)
                return {"epsilon": max(min_epsilon, e), "delta": d}
        if min_epsilon > 0:
            e, d = self._eps_delta_for_epsilon(vals, cum, min_epsilon)
            if e > emp[-1][0] - thresh:
                return {"epsilon": e, "delta": d}

        # BuildECDF (pac_verifier.cpp:135-178)
        import bisect

        begin = 0
        end = len(emp)
        if min_epsilon > 0:
            begin = bisect.bisect_right([e for e, _ in emp], min_epsilon)
            e, d = self._eps_delta_for_epsilon(vals, cum, min_epsilon)
            if d > min_delta - thresh or begin == end:
                if begin > 0:
                    begin -= 1
                    emp[begin] = (max(min_epsilon, e), d)
                else:
                    # the reference never reaches begin==0 here (its pairs
                    # always start at eps 0 when min_delta allows); insert
                    emp.insert(0, (max(min_epsilon, e), d))
                    end += 1
        if max_epsilon >= 0:
            end = begin + bisect.bisect_right(
                [e for e, _ in emp[begin:end]], max_epsilon
            )
        # unique by near-equal delta (diagonal threshold)
        stripped = []
        for pair in emp[begin:end]:
            if stripped and pair[1] - stripped[-1][1] < diagonal_threshold:
                continue
            stripped.append(pair)

        if len(stripped) == 1:
            return {"epsilon": stripped[0][0], "delta": stripped[0][1]}

        # elbow: the LAST i whose epsilon gap ties the maximum (the
        # reference's > max - kDistThreshold update rule)
        max_gap, best = -1.0, 0
        for i in range(len(stripped) - 1):
            gap = stripped[i + 1][0] - stripped[i][0]
            if gap > max_gap - thresh:
                max_gap = gap
                best = i
        if max_gap < 0:
            return {"epsilon": stripped[-1][0], "delta": stripped[-1][1]}
        return {"epsilon": stripped[best][0], "delta": stripped[best][1]}


def chebyshev_box_distance(
    cols: list[Column | str],
    lows: list[float],
    highs: list[float],
    coeffs: list[float] | None = None,
) -> Column:
    """Parallelepiped distance (parallelepiped.cpp:15-37): per dimension 0
    inside [low, high] else the leveled distance to the nearer bound, combined
    with max (Chebyshev). Null components contribute 0
    (metric_based_domain.cpp:41-47)."""
    coeffs = coeffs or [1.0] * len(lows)
    dims = []
    for c, lo, hi, w in zip(cols, lows, highs, coeffs):
        x = (F.col(c) if isinstance(c, str) else c).cast("double")
        d = F.when(x < lo, (F.lit(float(lo)) - x) * w).when(
            x > hi, (x - F.lit(float(hi))) * w
        ).otherwise(F.lit(0.0))
        dims.append(F.coalesce(d, F.lit(0.0)))
    return F.greatest(F.lit(0.0), *dims)


def ball_distance(
    cols: list[Column | str],
    center: list[float],
    radius: float,
    coeffs: list[float] | None = None,
) -> Column:
    """Ball distance (ball.h:26-28): max(0, ||(x - c) .* w||_2 - r), null
    components contributing 0 to the sum."""
    coeffs = coeffs or [1.0] * len(center)
    terms = []
    for c, ci, w in zip(cols, center, coeffs):
        x = (F.col(c) if isinstance(c, str) else c).cast("double")
        t = (x - F.lit(float(ci))) * F.lit(float(w))
        terms.append(F.coalesce(t * t, F.lit(0.0)))
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return F.greatest(F.lit(0.0), F.sqrt(s) - F.lit(float(radius)))


def domain_pac_check(
    df: DataFrame, distance: Column, exact: bool = False
) -> DomainPACCheck:
    """Validate a Domain PAC. Build ``distance`` with interval_distance /
    value_set_distance / categorical_distance / chebyshev_box_distance /
    ball_distance."""
    return DomainPACCheck(df=df, distance=distance, exact=exact)
