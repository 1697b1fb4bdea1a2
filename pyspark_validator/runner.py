"""ValidationSuite: load-once / execute-many orchestration with checkpoint/resume.

Mirrors the reference's Algorithm lifecycle (algorithm.cpp:76-96: LoadData once,
Execute re-callable with new params) at suite granularity: ``load`` resolves +
caches the canonical projection; each ``run`` executes a set of named checks
against it, records per-partition verdicts in the checkpoint manifest, and skips
partitions already validated for the same (check, snapshot).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark_validator.canonical import CanonicalDocs, canonicalize
from pyspark_validator.checkpoint import CheckpointManager
from pyspark_validator.checks.fd import fd_check
from pyspark_validator.checks.ucc import ucc_check


@dataclass
class CheckSpec:
    """One named check. ``kind`` in {'ucc','fd','ind','nd','mfd','sd','md',
    'ac','nar','sfd','anon','assoc','reconcile','precedence','outlier',
    'interval_overlap','custom'}; ``params`` are forwarded; single-row checks
    (nd/mfd/sd/md/ac/nar/assoc/reconcile/precedence/interval_overlap) are
    framed as partition 0 for the manifest;
    'custom' takes fn(canon_df) -> verdicts DataFrame with a partition_id +
    holds column."""

    name: str
    kind: str
    params: dict[str, Any] = field(default_factory=dict)
    fn: Callable[[DataFrame], DataFrame] | None = None


class ValidationSuite:
    def __init__(
        self,
        spark: SparkSession,
        docs: DataFrame,
        num_partitions: int = 64,
        checkpoint_path: str | None = None,
        snapshot_id: str = "snapshot-0",
        doc_id_col: str = "doc_id",
        spans_col: str = "spans",
    ):
        self.spark = spark
        self.num_partitions = num_partitions
        self.snapshot_id = snapshot_id
        # the user-facing input schema, before canonicalize adds derived
        # columns -- what a "schema" kind check validates against
        self.input_schema = docs.schema
        self.canon: CanonicalDocs = canonicalize(
            docs,
            num_partitions=num_partitions,
            doc_id_col=doc_id_col,
            spans_col=spans_col,
        )
        self.ckpt = (
            CheckpointManager(spark, checkpoint_path) if checkpoint_path else None
        )
        # check objects holding persisted censuses (AssocCheck/BenfordCheck
        # style); drained by unpersist() so long sessions don't leak blocks
        self._live_checks: list = []

    def _verdicts_for(self, spec: CheckSpec, df: DataFrame) -> DataFrame:
        if spec.kind == "ucc":
            return ucc_check(
                df,
                spec.params["columns"],
                num_partitions=self.num_partitions,
                partition_key=spec.params.get("partition_key", "doc_id"),
            ).verdicts()
        if spec.kind == "fd":
            c = fd_check(
                df,
                spec.params["lhs"],
                spec.params["rhs"],
                num_partitions=self.num_partitions,
            )
            return c.verdicts()
        if spec.kind == "ind":
            from pyspark_validator.checks.ind import ind_check

            rhs_df = spec.params.get("rhs_df")
            if rhs_df is None:
                rhs_df = self.spark.read.parquet(spec.params["rhs_table"])
            return ind_check(
                df, spec.params["lhs"], rhs_df, spec.params["rhs"]
            ).verdicts(num_partitions=self.num_partitions)
        if spec.kind == "nd":
            from pyspark.sql import functions as F

            from pyspark_validator.checks.nd import nd_check

            # single-row verdict framed as partition 0 for the manifest
            return nd_check(
                df,
                spec.params["lhs"],
                spec.params["rhs"],
                weight=spec.params["weight"],
                num_partitions=self.num_partitions,
            ).withColumn("partition_id", F.lit(0))
        if spec.kind == "sfd":
            from pyspark.sql import functions as F

            from pyspark_validator.checks.sfd import sfd_check

            s = sfd_check(
                df,
                spec.params["col_a"],
                spec.params["col_b"],
                **{
                    k: v
                    for k, v in spec.params.items()
                    if k not in ("col_a", "col_b", "expect")
                },
            ).summary()
            # verdict framing: expect 'sfd' (default), 'correlated', or
            # 'independent' -- holds iff the pair matches the expectation
            expect = spec.params.get("expect", "sfd")
            holds = {
                "sfd": F.col("sfd_holds"),
                "correlated": F.col("correlated"),
                "independent": ~F.col("sfd_holds") & ~F.col("correlated"),
            }[expect]
            return s.select(holds.alias("holds"), "*").withColumn(
                "partition_id", F.lit(0)
            )
        if spec.kind in ("ac", "nar"):
            # single-row verdict checks framed as partition 0 for the manifest
            from pyspark.sql import functions as F

            if spec.kind == "ac":
                from pyspark_validator.canonical import partition_id_expr
                from pyspark_validator.checks.ac import ac_check

                c = ac_check(
                    df,
                    spec.params["lhs"],
                    spec.params["rhs"],
                    spec.params.get("binop", "+"),
                    weight=spec.params.get("weight", 0.1),
                    bumps_limit=spec.params.get("bumps_limit", 0),
                    num_partitions=self.num_partitions,
                )
                pk = spec.params.get("partition_key", "doc_id")
                exc = c.exceptions(
                    [pk, *spec.params.get("id_cols", [])],
                    ranges=spec.params.get("ranges"),
                )
                # true per-partition verdicts (north-rule shape): every
                # partition reports, exception-bearing ones fail
                pids = df.select(
                    partition_id_expr(pk, self.num_partitions).alias(
                        "partition_id"
                    )
                ).distinct()
                per_part = exc.groupBy(
                    partition_id_expr(pk, self.num_partitions).alias(
                        "partition_id"
                    )
                ).agg(F.count(F.lit(1)).alias("n_exceptions"))
                return (
                    pids.join(per_part, "partition_id", "left")
                    .select(
                        "partition_id",
                        F.coalesce("n_exceptions", F.lit(0)).alias(
                            "n_exceptions"
                        ),
                    )
                    .select(
                        (F.col("n_exceptions") == 0).alias("holds"),
                        "n_exceptions",
                        "partition_id",
                    )
                )
            else:
                from pyspark_validator.checks.nar import nar_check

                s = nar_check(
                    df, spec.params["ante"], spec.params["cons"]
                ).qualities()
                s = s.select(
                    (
                        F.col("confidence")
                        >= F.lit(spec.params.get("min_confidence", 1.0))
                    ).alias("holds"),
                    "*",
                )
            return s.withColumn("partition_id", F.lit(0))
        if spec.kind == "sketch_profile":
            # one-pass HLL+CMS+KLL profile (sketches.sketch_profile);
            # informational verdict, optionally persisted to a SketchStore so
            # later snapshots can merge/drift without rescanning this one
            from pyspark.sql import functions as F

            from pyspark_validator.sketches import sketch_profile

            prof = sketch_profile(
                df,
                spec.params["columns"],
                p=spec.params.get("p", 12),
                fanin=spec.params.get("fanin", 64),
            )
            if spec.params.get("store_path"):
                from pyspark_validator.checkpoint import SketchStore

                SketchStore(self.spark, spec.params["store_path"]).record(
                    self.snapshot_id, prof
                )
            rows = [
                (c, s.n, s.n_null, float(s.distinct_est()))
                for c, s in sorted(prof.items())
            ]
            v = self.spark.createDataFrame(
                rows, "column string, n_rows long, n_null long, distinct_est double"
            ).withColumn("holds", F.lit(True))
            return v.withColumn("partition_id", F.lit(0))
        if spec.kind == "schema":
            # metadata-only (no scan); framed as partition 0 for the manifest
            from pyspark.sql import functions as F

            from pyspark_validator.schema import (
                SchemaSpec,
                _VERDICT_SCHEMA,
                schema_check,
            )

            rows = [
                tuple(d[k] for k in ("column", "status", "expected", "actual", "holds"))
                for d in schema_check(
                    self.input_schema, SchemaSpec.from_dict(spec.params)
                )
            ]
            v = self.spark.createDataFrame(rows, _VERDICT_SCHEMA)
            return v.withColumn("partition_id", F.lit(0))
        if spec.kind == "anon":
            from pyspark_validator.checks.anon import anon_check

            return anon_check(
                df,
                spec.params["quasi_identifiers"],
                k=spec.params.get("k", 2),
                sensitive=spec.params.get("sensitive"),
                l=spec.params.get("l", 2),
                num_partitions=self.num_partitions,
            ).verdicts()
        if spec.kind == "assoc":
            from pyspark.sql import functions as F

            from pyspark_validator.checks.assoc import assoc_check

            # verdict framing: expect 'independent' (default -- these columns
            # should NOT be associated) or 'dependent'; validate before the
            # check is built so a bad spec never lands in _live_checks
            expect = spec.params.get("expect", "independent")
            if expect not in ("independent", "dependent"):
                raise ValueError(
                    f"assoc check {spec.name!r}: expect must be "
                    f"'independent' or 'dependent', got {expect!r}"
                )
            check = assoc_check(
                df,
                spec.params["col_a"],
                spec.params["col_b"],
                alpha=spec.params.get("alpha", 0.05),
            )
            self._live_checks.append(check)  # released by Runner.unpersist()
            s = check.summary()
            holds = (
                ~F.col("dependent")
                if expect == "independent"
                else F.col("dependent")
            )
            return s.select(holds.alias("holds"), "*").withColumn(
                "partition_id", F.lit(0)
            )
        if spec.kind == "reconcile":
            from pyspark.sql import functions as F

            from pyspark_validator.checks.reconcile import reconciliation_check

            child = spec.params.get("child_df")
            if child is None:
                child = self.spark.read.parquet(spec.params["child_table"])
            s = reconciliation_check(
                df,
                child,
                spec.params["parent_keys"],
                spec.params["child_keys"],
                F.expr(spec.params["stored"]),
                F.expr(spec.params["derived_agg"]),
                abs_tol=spec.params.get("abs_tol", 0.0),
                rel_tol=spec.params.get("rel_tol", 0.0),
                expect_children=spec.params.get("expect_children", True),
            ).summary()
            return s.withColumn("partition_id", F.lit(0))
        if spec.kind == "precedence":
            from pyspark.sql import functions as F

            from pyspark_validator.checks.temporal import precedence_check

            s = precedence_check(
                df,
                spec.params["keys"],
                spec.params["ts_col"],
                F.expr(spec.params["antecedent"]),
                F.expr(spec.params["consequent"]),
                strict=spec.params.get("strict", True),
            )
            return s.withColumn("partition_id", F.lit(0))
        if spec.kind == "interval_overlap":
            from pyspark.sql import functions as F

            from pyspark_validator.checks.temporal import interval_overlap_check

            s = interval_overlap_check(
                df,
                spec.params["keys"],
                spec.params["start_col"],
                spec.params["end_col"],
                allow_touching=spec.params.get("allow_touching", True),
            )
            return s.withColumn("partition_id", F.lit(0))
        if spec.kind == "outlier":
            from pyspark.sql import functions as F

            from pyspark_validator.checks.outlier import outlier_check

            s = outlier_check(
                df,
                spec.params["column"],
                method=spec.params.get("method", "iqr"),
                threshold=spec.params.get("threshold"),
                exact=spec.params.get("exact", True),
            ).summary()
            max_frac = spec.params.get("max_outlier_fraction")
            if max_frac is not None:
                s = s.withColumn(
                    "holds",
                    F.coalesce(
                        F.col("outlier_fraction") <= F.lit(max_frac), F.lit(True)
                    ),
                )
            return s.withColumn("partition_id", F.lit(0))
        if spec.kind in ("mfd", "sd", "md"):
            # single-row verdict checks framed as partition 0 for the manifest
            from pyspark.sql import functions as F

            if spec.kind == "mfd":
                from pyspark_validator.checks.mfd import mfd_check

                s = mfd_check(
                    df,
                    spec.params["lhs"],
                    spec.params["rhs"],
                    metric=spec.params.get("metric", "euclidean"),
                    parameter=spec.params.get("parameter", 0.0),
                ).summary()
            elif spec.kind == "sd":
                from pyspark_validator.checks.sd import sd_check

                s = sd_check(
                    df,
                    spec.params["order_col"],
                    spec.params["value_col"],
                    g1=spec.params.get("g1", 0.0),
                    g2=spec.params.get("g2", float("inf")),
                ).summary()
            else:
                from pyspark_validator.checks.md import md_check

                s = md_check(
                    df,
                    spec.params["lhs"],
                    spec.params["rhs"],
                    left_id=spec.params.get("left_id", "doc_id"),
                ).summary()
            return s.withColumn("partition_id", F.lit(0))
        if spec.kind in (
            "distinct",
            "row_predicate",
            "completeness",
            "numeric_profile",
            "histogram_drift",
            "type_conformance",
            "span_integrity",
            "pii_budget",
            "token_budget",
            "media_context",
            "interleaved_quality",
            "benford",
            "class_balance",
        ):
            # agg-shaped kinds whose only home is fused.py: run each as its
            # own single-member pass so they work without "fuse": true too
            from pyspark_validator.fused import FusedPass, member_from_spec

            fp = FusedPass(
                df,
                num_partitions=self.num_partitions,
                partition_col="partition_id",
            )
            routed = member_from_spec(fp, spec.name, spec.kind, spec.params)
            assert routed  # these kinds never fall back
            return fp.verdict(spec.name)
        if spec.kind == "custom":
            assert spec.fn is not None
            return spec.fn(df)
        raise ValueError(f"unknown check kind: {spec.kind}")

    def run(self, checks: list[CheckSpec]) -> dict[str, DataFrame]:
        """Execute checks, resuming past completed partitions. Returns the verdict
        DataFrame per check (only the partitions computed in THIS run)."""
        results: dict[str, DataFrame] = {}
        for spec in checks:
            df = self.canon.df
            if self.ckpt is not None:
                df = self.ckpt.filter_pending(df, spec.name, self.snapshot_id)
            verdicts = self._verdicts_for(spec, df)
            if self.ckpt is not None:
                # materialize once so record + return don't recompute
                verdicts = verdicts.localCheckpoint(eager=True)
                self.ckpt.record_verdicts(spec.name, self.snapshot_id, verdicts)
            results[spec.name] = verdicts
        return results

    def run_fused(self, checks: list[CheckSpec]) -> dict[str, DataFrame]:
        """Like ``run``, but every aggregation-shaped check shares ONE scan +
        ONE P-row shuffle (fused.py); non-fusable kinds fall back to the
        per-check path. Fused checks report TRUE per-partition verdicts
        (the north-rule shape) instead of the partition-0 framing ``run``
        uses for single-row checks.

        Resume composes: the fused scan reads only partitions pending for at
        least one fused check, and each check's verdicts are post-filtered to
        its own pending set before being recorded -- identical manifest
        semantics to the per-check path at one scan's cost."""
        from pyspark.sql import functions as F

        from pyspark_validator.fused import FusedPass, member_from_spec

        fp = FusedPass(
            self.canon.df,
            num_partitions=self.num_partitions,
            partition_col="partition_id",
        )
        fused_names: list[str] = []
        rest: list[CheckSpec] = []
        for spec in checks:
            if member_from_spec(fp, spec.name, spec.kind, spec.params):
                fused_names.append(spec.name)
            else:
                rest.append(spec)
        results = self.run(rest) if rest else {}
        if not fused_names:
            return results
        if self.ckpt is not None:
            # scan only partitions pending for >= 1 fused check: drop those
            # done for ALL of them
            manifest = self.ckpt.manifest().filter(
                (F.col("snapshot_id") == self.snapshot_id)
                & F.col("check_id").isin(fused_names)
            )
            done_all = (
                manifest.groupBy("partition_id")
                .agg(F.count_distinct("check_id").alias("k"))
                .filter(F.col("k") == len(fused_names))
                .select("partition_id")
            )
            # safe to swap the frame post-registration: member exprs are
            # unbound F.col references, resolved when grouped() runs
            fp.df = fp.df.join(
                F.broadcast(done_all.withColumnRenamed("partition_id", "__done")),
                on=fp.df["partition_id"] == F.col("__done"),
                how="left_anti",
            )
        for name in fused_names:
            v = fp.verdict(name)
            if self.ckpt is not None:
                v = self.ckpt.filter_pending(v, name, self.snapshot_id)
                v = v.localCheckpoint(eager=True)
                self.ckpt.record_verdicts(name, self.snapshot_id, v)
            results[name] = v
        return results

    def unpersist(self) -> None:
        self.canon.unpersist()
        for check in self._live_checks:
            check.unpersist()
        self._live_checks.clear()
