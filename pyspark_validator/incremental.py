"""Incremental (dynamic) validation: apply insert/delete delta batches without
recomputing validated partitions.

Reference precedent: DynamicFDVerifier / DynPLI keep a cluster map keyed by value
and apply batch inserts/deletes to it (fd/fd_verifier/dynamic_fd_verifier.h:20-45,
dynamic_position_list_index.h:32-34). The distributed analog keeps the PLI-level
*count state* -- (partition_id, key..., cnt) for UCC, (partition_id, x..., y...,
ycnt) for FD -- as a versioned parquet table (an Iceberg table + MERGE INTO on a
real deployment):

  apply_delta:
    1. aggregate the delta batch to per-key +/- counts (one small shuffle),
    2. touched logical partitions = distinct partition_id in the delta (tiny),
    3. MERGE: full-outer sum of delta vs ONLY the touched state partitions;
       untouched state files are carried over BY REFERENCE -- the 10^12-row
       state is never re-read or rewritten for a 10^6-row delta,
    4. verdicts are re-derived for touched partitions only.

Versioning is a per-partition file manifest (the local-fs stand-in for an
Iceberg snapshot): ``manifest_v{n}.json`` maps partition_id -> the version
directory holding its current files. apply_delta writes ONLY the touched
``partition_id=`` directories into ``v{n+1}/`` and the new manifest points
untouched partitions at their existing files, so the write cost of a delta is
O(touched partitions), not O(state). Reads resolve the manifest to an explicit
file list (file-level pruning: ``read(partition_ids=...)`` lists only those
partitions' directories -- stronger than parquet partition pruning, nothing
else is even enumerated).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_validator.canonical import partition_id_expr


class _IncrementalState:
    """Versioned, hash-partitioned count-state table on disk.

    Layout (the local-fs stand-in for an Iceberg table + snapshot manifests):
      _meta.json          current version + the state schema (for empty reads)
      manifest_v{n}.json  {partition_id: "v{k}/partition_id={pid}"} -- version n
                          references each partition's CURRENT directory, which
                          may live in any older version dir (carried by ref)
      v{k}/partition_id={pid}/part-*.parquet

    Data files additionally store the partition id as a ``pid`` data column so a
    manifest-resolved multi-path read keeps the column without relying on
    partition-value inference across version directories.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- version bookkeeping (local-fs JSON; an Iceberg catalog at deployment) --
    def _meta_path(self) -> str:
        return os.path.join(self.path, "_meta.json")

    def _meta(self) -> dict:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": -1}

    def current_version(self) -> int:
        return self._meta()["version"]

    def _save_meta(self, version: int, schema_json: str) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(self._meta_path(), "w") as f:
            json.dump(
                {"version": version, "schema": schema_json, "updated_at": time.time()},
                f,
            )

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, f"manifest_v{version}.json")

    def manifest(self, version: int | None = None) -> dict[str, str]:
        v = self.current_version() if version is None else version
        if v < 0:
            raise ValueError(f"no state at {self.path}; call initialize() first")
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def _vdir(self, version: int) -> str:
        return os.path.join(self.path, f"v{version}")

    def _write_version(self, df: DataFrame, version: int) -> dict[str, str]:
        """Write df's rows partitioned by partition_id under v{version}/ and
        return {pid: relative dir} for the directories actually written."""
        out = self._vdir(version)
        (
            df.withColumn("pid", F.col("partition_id"))
            .write.mode("overwrite")
            .partitionBy("partition_id")
            .parquet(out)
        )
        written: dict[str, str] = {}
        for name in os.listdir(out):
            if name.startswith("partition_id="):
                written[name.split("=", 1)[1]] = f"v{version}/{name}"
        return written

    def write_full(self, df: DataFrame) -> int:
        """Full (re)initialization: write every partition into a new version."""
        v = self.current_version() + 1
        written = self._write_version(df, v)
        with open(self._manifest_path(v), "w") as f:
            json.dump(written, f)
        self._save_meta(v, df.schema.json())
        return v

    def write_delta(self, merged: DataFrame, touched: list[int]) -> int:
        """Write ONLY the touched partitions' new contents; every untouched
        partition keeps its existing files, referenced by the new manifest."""
        v = self.current_version() + 1
        prev = self.manifest()
        written = self._write_version(merged, v)
        new_manifest = {
            pid: rel for pid, rel in prev.items() if int(pid) not in set(touched)
        }
        new_manifest.update(written)  # touched partitions that emptied out drop
        with open(self._manifest_path(v), "w") as f:
            json.dump(new_manifest, f)
        self._save_meta(v, self._meta()["schema"])
        return v

    def vacuum(self, keep_last: int = 1) -> dict[str, int]:
        """Garbage-collect old state versions: retain the newest ``keep_last``
        manifests (snapshots), delete older manifest files plus every
        ``partition_id=`` directory that no retained manifest references.
        Retention is reference-based, not age-based: an untouched partition's
        files may live in an arbitrarily old ``v{k}/`` directory and survive
        as long as a retained manifest points at them -- the same contract as
        Iceberg's expire_snapshots + remove_orphan_files pair, which this
        local-fs layout stands in for. Without periodic vacuuming a
        streaming/delta cadence accumulates a version directory per batch.
        Returns {"manifests_deleted": n, "dirs_deleted": n}.
        """
        import shutil

        cur = self.current_version()
        if cur < 0:
            return {"manifests_deleted": 0, "dirs_deleted": 0}
        keep_last = max(1, keep_last)
        versions = sorted(
            int(f[len("manifest_v") : -len(".json")])
            for f in os.listdir(self.path)
            if f.startswith("manifest_v") and f.endswith(".json")
        )
        retained = versions[-keep_last:]
        live: set[str] = set()
        for v in retained:
            live.update(self.manifest(v).values())
        dirs_deleted = 0
        for name in os.listdir(self.path):
            if not (name.startswith("v") and name[1:].isdigit()):
                continue
            vdir = os.path.join(self.path, name)
            for sub in os.listdir(vdir):
                if not sub.startswith("partition_id="):
                    continue
                if f"{name}/{sub}" not in live:
                    shutil.rmtree(os.path.join(vdir, sub))
                    dirs_deleted += 1
            if not any(
                s.startswith("partition_id=") for s in os.listdir(vdir)
            ):
                shutil.rmtree(vdir)
        manifests_deleted = 0
        for v in versions:
            if v not in retained:
                os.remove(self._manifest_path(v))
                manifests_deleted += 1
        return {
            "manifests_deleted": manifests_deleted,
            "dirs_deleted": dirs_deleted,
        }

    def read(self, partition_ids: list[int] | None = None) -> DataFrame:
        """Manifest-resolved read. With partition_ids, only those partitions'
        directories are listed at all (file-level pruning)."""
        man = self.manifest()
        if partition_ids is not None:
            want = {str(p) for p in partition_ids}
            man = {pid: rel for pid, rel in man.items() if pid in want}
        paths = [os.path.join(self.path, rel) for rel in man.values()]
        if not paths:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(self._meta()["schema"]))
            return self.spark.createDataFrame([], schema)
        return (
            self.spark.read.parquet(*paths)
            .withColumnRenamed("pid", "partition_id")
        )


class IncrementalUCC:
    """Dynamic UCC: maintain per-key cluster counts; verdicts from state only."""

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        columns: list[str],
        num_partitions: int = 64,
    ):
        self.spark = spark
        self.columns = list(columns)
        self.num_partitions = num_partitions
        self.state = _IncrementalState(spark, state_path)

    def _keyed(self, df: DataFrame) -> DataFrame:
        return df.select(
            partition_id_expr(
                F.struct(*[F.col(c) for c in self.columns]), self.num_partitions
            ).alias("partition_id"),
            *[F.col(c) for c in self.columns],
        )

    def initialize(self, df: DataFrame) -> int:
        counts = (
            self._keyed(df)
            .groupBy("partition_id", *self.columns)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return self.state.write_full(counts)

    def apply_delta(
        self, inserts: DataFrame | None = None, deletes: DataFrame | None = None
    ) -> DataFrame:
        """Merge a delta batch into the state; returns the NEW verdicts of the
        touched partitions (untouched partitions keep their recorded verdicts).
        Rows deleted below zero are clamped out (matching DynPLI's precondition
        that deletes reference existing rows)."""
        parts = []
        if inserts is not None:
            parts.append(self._keyed(inserts).withColumn("d", F.lit(1)))
        if deletes is not None:
            parts.append(self._keyed(deletes).withColumn("d", F.lit(-1)))
        if not parts:
            raise ValueError("apply_delta needs inserts and/or deletes")
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        dcounts = delta.groupBy("partition_id", *self.columns).agg(
            F.sum("d").alias("dcnt")
        )
        touched = [
            r.partition_id
            for r in dcounts.select("partition_id").distinct().collect()
        ]
        # file-level-pruned read of ONLY the touched slice + full-outer merge;
        # untouched partitions are never read -- write_delta carries their
        # files by reference in the new manifest.
        hot = self.state.read(partition_ids=touched)
        on = ["partition_id", *self.columns]
        merged = (
            hot.join(dcounts, on=on, how="full_outer")
            .select(
                *on,
                (
                    F.coalesce(F.col("cnt"), F.lit(0))
                    + F.coalesce(F.col("dcnt"), F.lit(0))
                ).alias("cnt"),
            )
            .filter(F.col("cnt") > 0)
        )
        self.state.write_delta(merged, touched)
        return self.verdicts(partition_ids=touched)

    def verdicts(self, partition_ids: list[int] | None = None) -> DataFrame:
        """Per-partition UCC verdicts derived purely from state (same fields as
        UCCCheck.verdicts)."""
        s = self.state.read(partition_ids=partition_ids)
        cnt = F.col("cnt")
        viol = cnt > 1
        return (
            s.groupBy("partition_id")
            .agg(
                F.sum(cnt).alias("n_rows"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.sum(viol.cast("long")).alias("n_violating_clusters"),
                F.sum(F.when(viol, cnt).otherwise(0)).alias("n_violating_rows"),
                F.sum(cnt * (cnt - 1)).alias("violating_pairs"),
            )
            .withColumn(
                "aucc_error",
                F.when(
                    F.col("n_rows") > 1,
                    F.col("violating_pairs")
                    / (F.col("n_rows") * (F.col("n_rows") - F.lit(1))),
                ).otherwise(F.lit(0.0)),
            )
            .withColumn("holds", F.col("n_violating_clusters") == 0)
        )


class IncrementalFD:
    """Dynamic FD: maintain (X, Y)-level counts; verdicts from state only
    (DynamicFDVerifier analog: only touched X-groups are re-judged)."""

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        lhs: list[str],
        rhs: list[str],
        num_partitions: int = 64,
    ):
        self.spark = spark
        self.lhs = list(lhs)
        self.rhs = list(rhs)
        self.num_partitions = num_partitions
        self.state = _IncrementalState(spark, state_path)

    @property
    def _cols(self) -> list[str]:
        # rhs may overlap lhs (the reference permits e.g. {0,1} -> {1,4});
        # select/group on the unique union
        return list(dict.fromkeys(self.lhs + self.rhs))

    def _keyed(self, df: DataFrame) -> DataFrame:
        return df.select(
            partition_id_expr(
                F.struct(*[F.col(c) for c in self.lhs]), self.num_partitions
            ).alias("partition_id"),
            *[F.col(c) for c in self._cols],
        )

    def initialize(self, df: DataFrame) -> int:
        counts = (
            self._keyed(df)
            .groupBy("partition_id", *self._cols)
            .agg(F.count(F.lit(1)).alias("ycnt"))
        )
        return self.state.write_full(counts)

    def apply_delta(
        self, inserts: DataFrame | None = None, deletes: DataFrame | None = None
    ) -> DataFrame:
        parts = []
        if inserts is not None:
            parts.append(self._keyed(inserts).withColumn("d", F.lit(1)))
        if deletes is not None:
            parts.append(self._keyed(deletes).withColumn("d", F.lit(-1)))
        if not parts:
            raise ValueError("apply_delta needs inserts and/or deletes")
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        dcounts = delta.groupBy("partition_id", *self._cols).agg(
            F.sum("d").alias("dcnt")
        )
        touched = [
            r.partition_id
            for r in dcounts.select("partition_id").distinct().collect()
        ]
        hot = self.state.read(partition_ids=touched)
        on = ["partition_id", *self._cols]
        merged = (
            hot.join(dcounts, on=on, how="full_outer")
            .select(
                *on,
                (
                    F.coalesce(F.col("ycnt"), F.lit(0))
                    + F.coalesce(F.col("dcnt"), F.lit(0))
                ).alias("ycnt"),
            )
            .filter(F.col("ycnt") > 0)
        )
        self.state.write_delta(merged, touched)
        return self.verdicts(partition_ids=touched)

    def afd_measures(self) -> DataFrame:
        """g1 / pdep / tau / mu+ / rho recomputed from the count state after any
        number of delta batches (DynamicAFD analog: the reference's
        dynamic_verifying_afd example re-reads measures after each batch).
        All marginals derive from the stored (X, Y)-level counts -- no rescan
        of the data."""
        s = self.state.read()
        ycnt = F.col("ycnt")
        x_level = s.groupBy(*self.lhs).agg(
            F.sum(ycnt).alias("cx"),
            F.count(F.lit(1)).alias("n_distinct_y"),
            F.sum(ycnt * (ycnt - 1)).alias("y_pairs"),
            F.sum(ycnt * F.log(ycnt.cast("double"))).alias("y_ln_sum"),
        )
        x = x_level.agg(
            F.sum("cx").alias("n"),
            F.count(F.lit(1)).alias("k_x"),
            F.sum("n_distinct_y").alias("k_xy"),
            F.sum(F.col("cx") * (F.col("cx") - 1) - F.col("y_pairs")).alias(
                "conflict_pairs"
            ),
            F.sum(
                F.when(F.col("n_distinct_y") > 1, F.col("cx")).otherwise(0)
            ).alias("g2_rows"),
            F.sum("y_ln_sum").alias("sum_cxy_ln"),
            F.sum(F.col("cx") * F.log(F.col("cx").cast("double"))).alias(
                "sum_cx_ln"
            ),
        )
        pdep_num = x_level.agg(
            F.sum((F.col("y_pairs") + F.col("cx")) / F.col("cx")).alias("pdep_num")
        )
        y_level = (
            s.groupBy(*self.rhs)
            .agg(F.sum(ycnt).alias("cy"))
            .agg(
                F.sum(F.col("cy") * F.col("cy")).alias("sum_cy2"),
                F.sum(F.col("cy") * F.log(F.col("cy").cast("double"))).alias(
                    "sum_cy_ln"
                ),
                F.count(F.lit(1)).alias("k_y"),
            )
        )
        j = x.crossJoin(pdep_num).crossJoin(y_level)
        n = F.col("n").cast("double")
        pdep_xy = F.col("pdep_num") / n
        pdep_y = F.col("sum_cy2") / (n * n)
        k_x = F.col("k_x").cast("double")
        tau = F.when(pdep_y == 1.0, F.lit(1.0)).otherwise(
            (pdep_xy - pdep_y) / (F.lit(1.0) - pdep_y)
        )
        mu = F.lit(1.0) - (F.lit(1.0) - pdep_xy) / (F.lit(1.0) - pdep_y) * (n - 1) / (
            n - k_x
        )
        mu_plus = F.when((pdep_y == 1.0) | (k_x == n), F.lit(1.0)).otherwise(
            F.greatest(F.lit(0.0), mu)
        )
        h_y = F.log(n) - F.col("sum_cy_ln") / n
        h_y_given_x = -(F.col("sum_cxy_ln") - F.col("sum_cx_ln")) / n
        fi = F.when(F.col("k_y") < 2, F.lit(0.0)).otherwise(
            (h_y - h_y_given_x) / h_y
        )
        return j.select(
            (F.col("conflict_pairs") / (n * n - n)).alias("g1"),
            (F.col("g2_rows") / n).alias("g2"),
            pdep_xy.alias("pdep"),
            tau.alias("tau"),
            mu_plus.alias("mu_plus"),
            (k_x / F.col("k_xy")).alias("rho"),
            fi.alias("fi"),
            F.col("n").alias("n_rows"),
            F.col("k_x").alias("n_distinct_x"),
            F.col("k_xy").alias("n_distinct_xy"),
        )

    def verdicts(self, partition_ids: list[int] | None = None) -> DataFrame:
        """Per-partition FD verdicts from state (same fields as FDCheck.verdicts)."""
        s = self.state.read(partition_ids=partition_ids)
        ycnt = F.col("ycnt")
        x_level = s.groupBy("partition_id", *self.lhs).agg(
            F.sum(ycnt).alias("cx"),
            F.count(F.lit(1)).alias("n_distinct_y"),
            F.sum(ycnt * (ycnt - 1)).alias("y_pairs"),
        )
        viol = F.col("n_distinct_y") > 1
        cx = F.col("cx")
        return (
            x_level.groupBy("partition_id")
            .agg(
                F.sum(cx).alias("n_rows"),
                F.count(F.lit(1)).alias("n_distinct_x"),
                F.sum("n_distinct_y").alias("n_distinct_xy"),
                F.sum(viol.cast("long")).alias("n_error_clusters"),
                F.sum(F.when(viol, cx).otherwise(0)).alias("n_error_rows"),
                F.sum(cx * (cx - 1) - F.col("y_pairs")).alias("conflict_pairs"),
            )
            .withColumn(
                "g1_error",
                F.when(
                    F.col("n_rows") > 1,
                    F.col("conflict_pairs")
                    / (F.col("n_rows") * F.col("n_rows") - F.col("n_rows")),
                ).otherwise(F.lit(0.0)),
            )
            .withColumn("holds", F.col("n_error_clusters") == 0)
        )
