"""Categorical association measures (chi2, Cramér's V, mutual information,
Theil's U / uncertainty coefficient).

Completes the engine's dependency-strength spectrum: checks/fd.py gives the
reference's AFD error family (g1/pdep/tau/mu+/rho,
fd/afd_metric_calculator.h), checks/sfd.py gives CORDS' sampled chi2 gate --
this module gives the exact, full-table symmetric-and-directional association
measures over a pair of categorical columns:

  * chi2 / p-gate          (Pearson contingency, exact counts)
  * Cramér's V             sqrt((chi2/n) / (min(r,c)-1))
  * bias-corrected V       (Bergsma 2013)
  * mutual information     MI = H(A) + H(B) - H(A,B)   [natural log]
  * Theil's U              U(A|B) = MI / H(A), U(B|A) = MI / H(B)
                           (directional, like pdep: U(B|A)=1 <=> FD A -> B)

Spark design: ONE shuffle builds the joint census groupBy(a, b).count()
(map-side combine absorbs hot cells); marginals, entropies and the chi2
expectation grid are derived from that census with post-shuffle re-aggs and
broadcast joins whose input is at most #distinct-pairs rows. The census size
is the scale contract: for unbounded string domains, bucket first (the CORDS
approach -- checks/sfd.py buckets skewed/high-cardinality columns the same
way; stats.is_categorical is the pre-flight).

Differs from sfd.py on purpose: SFD answers "is there ANY soft dependency"
cheaply on a sample with reference-exact bucketing; assoc_check answers "how
strong, in which direction" exactly on the full table.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_validator.canonical import NullMode, null_safe_key
from pyspark_validator.checks.sfd import chi2_ppf


@dataclass
class AssocCheck:
    """Lazy exact association measures between two categorical columns."""

    df: DataFrame
    col_a: str
    col_b: str
    alpha: float = 0.05
    null_mode: NullMode = NullMode.EQUAL

    @cached_property
    def census(self) -> DataFrame:
        """Joint census [__a, __b, cnt] -- the single full-table shuffle.
        Persisted: marginals, entropies and the chi2 grid all branch off it,
        and without the persist EACH branch would re-scan the full table
        (pinned single-scan in test_plan_audit.py)."""
        a = null_safe_key(F.col(self.col_a), self.null_mode, None)
        b = null_safe_key(F.col(self.col_b), self.null_mode, None)
        return (
            self.df.select(a.alias("__a"), b.alias("__b"))
            .groupBy("__a", "__b")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .persist()
        )

    def summary(self) -> DataFrame:
        """Single row: [n, r, c, chi2, chi2_critical, dof, cramers_v,
        cramers_v_corrected, h_a, h_b, h_ab, mutual_info, theil_u_a_given_b,
        theil_u_b_given_a, dependent].

        ``dependent`` gates chi2 at chi2_ppf(1-alpha, dof). Theil's U is NULL
        when the conditioned entropy is 0 (constant column -- undefined, the
        scipy/pandas convention).
        """
        cen = self.census
        ra = cen.groupBy("__a").agg(F.sum("cnt").alias("ca"))
        cb = cen.groupBy("__b").agg(F.sum("cnt").alias("cb"))
        tot = cen.agg(
            F.sum("cnt").alias("n"),
            F.count(F.lit(1)).alias("n_cells"),
        )

        def _ent(df: DataFrame, cnt: str) -> F.Column:
            # -sum(p ln p) computed as ln(n) - sum(c ln c)/n  (one agg, exact)
            c = F.col(cnt).cast("double")
            return F.sum(c * F.log(c)).alias(f"__sum_{cnt}")

        sa = ra.agg(F.count(F.lit(1)).alias("r"), _ent(ra, "ca"))
        sb = cb.agg(F.count(F.lit(1)).alias("c"), _ent(cb, "cb"))
        sab = cen.agg(_ent(cen, "cnt"))

        cells = (
            cen.join(F.broadcast(ra), "__a")
            .join(F.broadcast(cb), "__b")
            .crossJoin(F.broadcast(tot.select("n")))
        )
        e = F.col("ca").cast("double") * F.col("cb") / F.col("n")
        # observed cells only: sum (o-e)^2/e + correction for zero-observed
        # cells, whose contribution is e = ca*cb/n each. sum over ALL grid
        # cells of e = n, sum over observed of e is computable here, so
        # chi2 = sum_obs((o-e)^2/e - e) + n  -- no grid materialization.
        chi2_obs = cells.agg(
            F.sum(
                (F.col("cnt") - e) * (F.col("cnt") - e) / e - e
            ).alias("__chi2_minus_n")
        )

        n = F.col("n").cast("double")
        r = F.col("r").cast("double")
        c = F.col("c").cast("double")
        h_a = F.log(n) - F.col("__sum_ca") / n
        h_b = F.log(n) - F.col("__sum_cb") / n
        h_ab = F.log(n) - F.col("__sum_cnt") / n
        mi = F.greatest(h_a + h_b - h_ab, F.lit(0.0))
        chi2 = F.col("__chi2_minus_n") + n
        phi2 = chi2 / n
        v = F.when(
            F.least(r, c) > 1, F.sqrt(phi2 / (F.least(r, c) - 1))
        ).otherwise(F.lit(0.0))
        # Bergsma bias correction
        phi2c = F.greatest(phi2 - (r - 1) * (c - 1) / (n - 1), F.lit(0.0))
        rc = r - (r - 1) * (r - 1) / (n - 1)
        cc = c - (c - 1) * (c - 1) / (n - 1)
        vc = F.when(
            F.least(rc, cc) > 1, F.sqrt(phi2c / (F.least(rc, cc) - 1))
        ).otherwise(F.lit(0.0))
        u_ab = F.when(h_a > 0, mi / h_a)  # U(A|B): NULL when H(A)=0
        u_ba = F.when(h_b > 0, mi / h_b)

        base = (
            tot.crossJoin(sa)
            .crossJoin(sb)
            .crossJoin(sab)
            .crossJoin(chi2_obs)
        )
        # dof needs r/c at plan-build time only symbolically; the critical
        # value is computed driver-side from the collected r/c is avoided:
        # emit dof and gate via a scalar ppf udf-free two-step -- instead we
        # inline the gate for the common small-dof case by computing the
        # critical value lazily in a second tiny select (1-row frame).
        out = base.select(
            F.col("n").cast("bigint").alias("n"),
            F.col("r").cast("bigint").alias("r"),
            F.col("c").cast("bigint").alias("c"),
            chi2.alias("chi2"),
            ((r - 1) * (c - 1)).cast("bigint").alias("dof"),
            v.alias("cramers_v"),
            vc.alias("cramers_v_corrected"),
            h_a.alias("h_a"),
            h_b.alias("h_b"),
            h_ab.alias("h_ab"),
            mi.alias("mutual_info"),
            u_ab.alias("theil_u_a_given_b"),
            u_ba.alias("theil_u_b_given_a"),
        )
        # dof is data-dependent (unknown at plan-build time), so the gate
        # uses the Wilson-Hilferty closed form as a JVM expression instead of
        # the driver-side exact chi2_ppf (which needs dof as a python float).
        return out.withColumn(
            "chi2_critical",
            _chi2_crit_expr(F.col("dof"), 1.0 - self.alpha),
        ).withColumn(
            "dependent", F.col("chi2") > F.col("chi2_critical")
        )

    def unpersist(self) -> None:
        """Release the cached joint census (mirrors FusedPass.unpersist /
        CanonicalDocs.unpersist); safe to call before census materializes."""
        if "census" in self.__dict__:
            self.census.unpersist()

    def __enter__(self) -> "AssocCheck":
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()


def _norm_ppf(p: float) -> float:
    """Standard-normal inverse CDF, exact to double precision by bisection
    on math.erf (same bisection idiom as sfd.chi2_ppf)."""
    import math

    if not (0.0 < p < 1.0):
        raise ValueError("p must lie in (0, 1)")
    lo, hi = -12.0, 12.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if 0.5 * (1.0 + math.erf(mid / math.sqrt(2.0))) < p:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def _chi2_crit_expr(dof_col, p: float):
    """Wilson–Hilferty inverse-chi2 approximation as a JVM expression:
    chi2_crit(dof) ~= dof * (1 - 2/(9 dof) + z_p * sqrt(2/(9 dof)))^3.

    Exact enough for a drift gate at any dof >= 1 (relative error < 1% for
    dof >= 3; the exact driver-side chi2_ppf in sfd.py remains the reference
    for fixed-dof checks where dof is known at plan time).
    """
    z = _norm_ppf(p)
    d = dof_col.cast("double")
    t = (
        1.0
        - F.try_divide(F.lit(2.0), 9.0 * d)
        + F.lit(z) * F.sqrt(F.try_divide(F.lit(2.0), 9.0 * d))
    )
    # dof = 0 (a constant column): no test to run -- critical value 0, and the
    # ``dependent`` gate is also forced false by the caller's chi2 = 0
    return F.when(d > 0, d * t * t * t).otherwise(F.lit(0.0))


def assoc_check(
    df: DataFrame,
    col_a: str,
    col_b: str,
    alpha: float = 0.05,
    null_mode: NullMode = NullMode.EQUAL,
) -> AssocCheck:
    """Exact categorical association measures between two columns."""
    return AssocCheck(
        df=df, col_a=col_a, col_b=col_b, alpha=alpha, null_mode=null_mode
    )
