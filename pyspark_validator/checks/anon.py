"""k-anonymity / l-diversity validation.

The privacy dual of the UCC check: where UCC demands every cluster of the
quasi-identifier PLI have size 1, k-anonymity (Sweeney 2002) demands every
cluster have size >= k -- a row in a smaller cluster is re-identifiable.
l-diversity (Machanavajjhala et al. 2006) additionally demands each cluster
contain >= l "well-represented" sensitive values; we implement the two
published instantiations that are algebraic at scale:

  * distinct l-diversity: n_distinct(sensitive) >= l per cluster
  * entropy l-diversity:  H(sensitive | cluster) >= ln(l) per cluster

Spark design (same plan family as checks/fd.py): with a sensitive column the
engine runs groupBy(QI, sensitive).count() -> groupBy(QI) -- ONE shuffle keyed
by (QI, sensitive) with map-side combine absorbing hot clusters, then an
algebraic rollup (sum / count / sum(c*ln c) gives group size, distinct-count
and entropy in the same pass, no count_distinct expansion). Without a
sensitive column it is the single groupBy(QI).count() of checks/ucc.py.
Per-partition verdicts are exact because the partition id is derived from the
QI key itself (every cluster lives wholly in one logical partition), matching
the engine-wide determinism rule (canonical.py).

Violation collection is naturally bounded: a k-anonymity violation is a
cluster with FEWER than k rows, so the violations frame carries at most
(k-1) rows per violating cluster by construction -- no salted capped collect
needed (contrast ucc.py, where violating clusters are unbounded).

Not in the reference repo (its scope is dependency profiling, not privacy),
but the same PLI-cluster-size algebra as ucc/ucc_verifier/ucc_verifier.cpp:
46-59; included because a 10^12-document training corpus with user metadata
is exactly where suppression audits run.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property
from math import log

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_validator.canonical import NullMode, null_safe_key


@dataclass
class AnonCheck:
    """Lazy k-anonymity (and optional l-diversity) check.

    ``summary()`` / ``verdicts()`` never materialize clusters; ``violations()``
    lists the sub-k clusters (bounded output: < k rows per cluster by
    definition of a violation).
    """

    df: DataFrame
    quasi_identifiers: list[str]
    k: int = 2
    sensitive: str | None = None
    l: int = 2  # noqa: E741  (the published parameter name)
    num_partitions: int = 64
    null_mode: NullMode = NullMode.EQUAL
    _keys: list[Column] = field(init=False, repr=False)

    def __post_init__(self) -> None:
        if not self.quasi_identifiers:
            raise ValueError("anon_check requires at least one quasi-identifier")
        if self.k < 1:
            raise ValueError("k must be >= 1")
        if self.sensitive is not None and self.l < 1:
            raise ValueError("l must be >= 1")
        self._keys = [
            null_safe_key(F.col(c), self.null_mode, None).alias(f"__k_{i}")
            for i, c in enumerate(self.quasi_identifiers)
        ]

    @cached_property
    def _partition_col(self) -> Column:
        # partition on the QI key itself => clusters never straddle partitions
        # => per-partition verdicts are exact (same rule as UCCCheck).
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.quasi_identifiers]),
            F.lit(self.num_partitions),
        ).cast("int")

    @cached_property
    def cluster_stats(self) -> DataFrame:
        """One row per QI cluster: [partition_id, __k_*, cnt] plus, when a
        sensitive column is set, n_distinct_s and entropy_s (natural log)."""
        knames = [f"__k_{i}" for i in range(len(self.quasi_identifiers))]
        if self.sensitive is None:
            return (
                self.df.select(self._partition_col.alias("partition_id"), *self._keys)
                .groupBy("partition_id", *knames)
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
        s_key = null_safe_key(F.col(self.sensitive), self.null_mode, None)
        level = (
            self.df.select(
                self._partition_col.alias("partition_id"),
                *self._keys,
                s_key.alias("__s"),
            )
            .groupBy("partition_id", *knames, "__s")
            .agg(F.count(F.lit(1)).alias("c_sy"))
        )
        c = F.col("c_sy").cast("double")
        return (
            level.groupBy("partition_id", *knames)
            .agg(
                F.sum("c_sy").alias("cnt"),
                F.count(F.lit(1)).alias("n_distinct_s"),
                F.sum(c * F.log(c)).alias("__sum_clnc"),
            )
            # H(S | cluster) = ln(cnt) - sum(c ln c)/cnt  (exact, algebraic)
            .withColumn(
                "entropy_s",
                F.log(F.col("cnt").cast("double"))
                - F.col("__sum_clnc") / F.col("cnt"),
            )
            .drop("__sum_clnc")
        )

    def _flags(self) -> tuple[Column, Column | None, Column | None]:
        kviol = F.col("cnt") < self.k
        if self.sensitive is None:
            return kviol, None, None
        lviol = F.col("n_distinct_s") < self.l
        # entropy l-diversity: H >= ln(l); guard l=1 (ln 1 = 0, H >= 0 always)
        eviol = F.col("entropy_s") < F.lit(log(self.l)) - F.lit(1e-12)
        return kviol, lviol, eviol

    def verdicts(self) -> DataFrame:
        """Per-partition verdict: [partition_id, n_rows, n_clusters,
        min_cluster_size, n_k_violating_clusters, n_k_violating_rows,
        suppression_ratio, (l-diversity fields), holds].

        suppression_ratio = fraction of rows that must be suppressed to make
        the partition k-anonymous (rows in sub-k clusters / rows). Algebraic
        aggs only => map-side combine => skew-immune.
        """
        kviol, lviol, eviol = self._flags()
        cnt = F.col("cnt")
        aggs = [
            F.sum(cnt).alias("n_rows"),
            F.count(F.lit(1)).alias("n_clusters"),
            F.min(cnt).alias("min_cluster_size"),
            F.sum(kviol.cast("long")).alias("n_k_violating_clusters"),
            F.sum(F.when(kviol, cnt).otherwise(0)).alias("n_k_violating_rows"),
        ]
        if self.sensitive is not None:
            aggs += [
                F.min("n_distinct_s").alias("min_distinct_sensitive"),
                F.sum(lviol.cast("long")).alias("n_l_violating_clusters"),
                F.sum(F.when(lviol, cnt).otherwise(0)).alias("n_l_violating_rows"),
                F.sum(eviol.cast("long")).alias("n_entropy_violating_clusters"),
            ]
        out = (
            self.cluster_stats.groupBy("partition_id")
            .agg(*aggs)
            .withColumn(
                "suppression_ratio",
                F.col("n_k_violating_rows") / F.col("n_rows"),
            )
        )
        holds = F.col("n_k_violating_clusters") == 0
        if self.sensitive is not None:
            holds = holds & (F.col("n_l_violating_clusters") == 0)
        return out.withColumn("holds", holds)

    def summary(self) -> DataFrame:
        """Global single-row verdict (sums of the per-partition fields plus
        global min_cluster_size / suppression_ratio / holds)."""
        v = self.verdicts()
        aggs = [
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_clusters").alias("n_clusters"),
            F.min("min_cluster_size").alias("min_cluster_size"),
            F.sum("n_k_violating_clusters").alias("n_k_violating_clusters"),
            F.sum("n_k_violating_rows").alias("n_k_violating_rows"),
        ]
        if self.sensitive is not None:
            aggs += [
                F.min("min_distinct_sensitive").alias("min_distinct_sensitive"),
                F.sum("n_l_violating_clusters").alias("n_l_violating_clusters"),
                F.sum("n_l_violating_rows").alias("n_l_violating_rows"),
                F.sum("n_entropy_violating_clusters").alias(
                    "n_entropy_violating_clusters"
                ),
            ]
        out = v.agg(*aggs).withColumn(
            "suppression_ratio", F.col("n_k_violating_rows") / F.col("n_rows")
        )
        holds = F.col("n_k_violating_clusters") == 0
        if self.sensitive is not None:
            holds = holds & (F.col("n_l_violating_clusters") == 0)
        return out.withColumn("holds", holds)

    def violations(self) -> DataFrame:
        """Violating clusters with their QI values:
        [partition_id, <quasi_identifiers...>, cluster_size, violates_k,
        (violates_l, violates_entropy_l, n_distinct_sensitive)].

        Join-free: cluster_stats already carries the canonical key values; we
        re-derive the original columns by joining back only for multi-typed
        fidelity -- instead we re-aggregate carrying the raw QI columns, which
        keeps this a projection of one extra grouped pass over violating keys
        only (semi-join on the sub-k / sub-l key set).
        """
        kviol, lviol, eviol = self._flags()
        flag = kviol if lviol is None else (kviol | lviol | eviol)
        knames = [f"__k_{i}" for i in range(len(self.quasi_identifiers))]
        viol_keys = self.cluster_stats.filter(flag).alias("v")
        tagged = self.df.select(
            self._partition_col.alias("partition_id"),
            *self._keys,
            *[F.col(c) for c in self.quasi_identifiers],
        ).alias("t")
        cond = F.col("t.partition_id") == F.col("v.partition_id")
        for kn in knames:
            cond = cond & F.col(f"t.{kn}").eqNullSafe(F.col(f"v.{kn}"))
        sel = [
            F.col("t.partition_id").alias("partition_id"),
            *[F.col(f"t.{c}").alias(c) for c in self.quasi_identifiers],
            F.col("v.cnt").alias("cluster_size"),
            (F.col("v.cnt") < self.k).alias("violates_k"),
        ]
        if self.sensitive is not None:
            sel += [
                (F.col("v.n_distinct_s") < self.l).alias("violates_l"),
                (
                    F.col("v.entropy_s") < F.lit(log(self.l)) - F.lit(1e-12)
                ).alias("violates_entropy_l"),
                F.col("v.n_distinct_s").alias("n_distinct_sensitive"),
            ]
        return (
            tagged.join(viol_keys, on=cond, how="inner")
            .select(*sel)
            .dropDuplicates(["partition_id", *self.quasi_identifiers])
        )


def anon_check(
    df: DataFrame,
    quasi_identifiers: list[str],
    k: int = 2,
    sensitive: str | None = None,
    l: int = 2,  # noqa: E741
    num_partitions: int = 64,
    null_mode: NullMode = NullMode.EQUAL,
) -> AnonCheck:
    """Validate k-anonymity (and, with ``sensitive``, distinct + entropy
    l-diversity) over the quasi-identifier columns. See AnonCheck."""
    return AnonCheck(
        df=df,
        quasi_identifiers=list(quasi_identifiers),
        k=k,
        sensitive=sensitive,
        l=l,
        num_partitions=num_partitions,
        null_mode=null_mode,
    )


def suppress_to_k(
    df: DataFrame,
    quasi_identifiers: list[str],
    k: int = 2,
    null_mode: NullMode = NullMode.EQUAL,
) -> DataFrame:
    """Enforcement counterpart of the k-anonymity audit: return ``df``
    WITHOUT the rows of sub-k quasi-identifier clusters (record suppression,
    the baseline anonymization operator). Two shuffles on the same QI key
    (cluster sizes, then the filtering join); the dropped side is bounded by
    (k-1) rows per dropped cluster. Columns pass through unchanged."""
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = [
        null_safe_key(F.col(c), null_mode, None).alias(f"__k_{i}")
        for i, c in enumerate(quasi_identifiers)
    ]
    knames = [f"__k_{i}" for i in range(len(quasi_identifiers))]
    big = (
        df.select(*keys)
        .groupBy(*knames)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= k)
        .drop("__cnt")
    )
    tagged = df.select("*", *keys)
    cond = None
    for kn in knames:
        eq = tagged[kn].eqNullSafe(big[kn])
        cond = eq if cond is None else (cond & eq)
    return tagged.join(big, on=cond, how="left_semi").drop(*knames)
