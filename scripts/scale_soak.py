#!/usr/bin/env python
"""Scale-soak the dedup/ANN tier on a multi-million-row synthetic corpus.

The 100-TB design claims of the near-dup / ANN operators are plan-pinned by
tests but (before this script) were never EXECUTED beyond the sf0.1 tables.
This harness amplifies the sf tables to millions of rows with REALISTIC
duplicate structure and runs the four headline scale paths end-to-end at
local[$SPARK_GRAFT_CPUS], recording per-op wall time, rows/sec, shuffle
bytes (from the Spark event log, attributed per op via job groups), result
counts, and the hot-bucket drop fraction for the LSH guard.

Amplification design (the part that makes the soak honest):

* Naive text replication (1600 copies of each doc) makes EVERY replica pair a
  mutual near-duplicate -- candidate pairs would grow as rep^2 per source doc
  (~6.5e9 pairs), which no similarity join should ever emit and which models
  nothing real. Instead each replica gets a per-replica word suffix
  ("w" -> "w_<seed>"), making shingle sets DISJOINT across replica groups:
  near-dup clusters keep the base corpus's bounded size, and total candidate
  volume scales LINEARLY with corpus size -- the regime the operators'
  10^12-doc designs assume (bounded cluster sizes, skew guarded by
  max_bucket).
* Planted truth: every ``plant_every``-th source doc uses seed r%%(rep/2) so
  replica r and r+rep/2 are EXACT duplicates -> a closed-form expected pair
  count that both minhash-LSH (recall 1.0 at jaccard 1.0) and prefix-Jaccard
  (exact) must return on top of 'rep x' the base corpus's natural pairs.
* Embeddings: deterministic hash-uniform vectors (random 64-dim cosines
  concentrate near 0, so threshold .95 pairs are exactly the planted ones);
  every ``plant_every_vec``-th id shares its seed with id+1 -> exact-dup
  vector pairs that knn (cosine 1.0 top-1) and SemDeDup (one drop per pair,
  same cluster guaranteed for identical vectors) must find.

Usage: python scripts/scale_soak.py [--rep 1600] [--vec-n 8000000]
           [--sem-n 1000000] [--out /tmp/scale_soak.json]
Numbers land in BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

EVLOG_DIR = "/tmp/soak-evlog"


def amplified_docs(spark, sf_dir: str, rep: int, plant_every: int = 20):
    """rep copies of each sf doc, word-suffixed per replica seed (disjoint
    shingle spaces across replica groups); every plant_every-th doc folds
    seeds mod rep/2 -> (r, r+rep/2) replicas are exact duplicates."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("src_id"), "text"
    )
    half = rep // 2
    planted = F.pmod(F.col("src_id").cast("long"), F.lit(plant_every)) == 0
    r = F.col("r")
    seed = F.when(planted, F.pmod(r, F.lit(half))).otherwise(r)
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("_"), F.col("__seed").cast("string")),
        ),
        " ",
    )
    # repartition BEFORE the explode: the sf source is one tiny parquet file,
    # so without it the whole rep-x amplification (and the write) runs in a
    # single task regardless of cluster size
    return (
        docs.repartition(256)
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
        .withColumn("__seed", seed)
        .select(
            F.concat_ws("#", "src_id", r.cast("string")).alias("doc_id"),
            suffixed.alias("text"),
        )
    )


def synth_embeddings(spark, n: int, dim: int = 64, plant_every: int = 997):
    """n deterministic hash-uniform vectors; id%%plant_every==0 shares its
    seed with id+1 (exact-duplicate pair)."""
    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    planted = F.pmod(F.col("vec_id"), F.lit(plant_every)) == 0
    seed = F.when(planted, F.col("vec_id") + 1).otherwise(F.col("vec_id"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("__seed"), i), F.lit(2001)) - F.lit(1000))
            / F.lit(1000.0)
        ).cast("float"),
    )
    return ids.repartition(256).withColumn("__seed", seed).select(
        "vec_id", vec.alias("embedding")
    )


def _run_op(spark, name, fn):
    sc = spark.sparkContext
    sc.setJobGroup(name, name)
    t0 = time.perf_counter()
    try:
        result = fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    elapsed = round(time.perf_counter() - t0, 2)
    # Release the op's footprint before the next one: shuffle files live on
    # disk until the ContextCleaner notices the shuffle objects are garbage,
    # and with a 48g heap GC may not run for the whole soak -- the first full
    # run died of cumulative shuffle spill (disk 100%) in op 4. Explicit
    # cache drop + JVM GC lets the cleaner reclaim each op's spill promptly.
    spark.catalog.clearCache()
    sc._jvm.System.gc()
    time.sleep(3)
    return result, elapsed


def shuffle_bytes_by_group(app_id: str) -> dict[str, dict[str, int]]:
    """Attribute shuffle read/write bytes per job group from the event log."""
    paths = [p for p in glob.glob(f"{EVLOG_DIR}/*{app_id}*") if os.path.isfile(p)]
    stage_group: dict[int, str] = {}
    out: dict[str, dict[str, int]] = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    if grp:
                        for sid in ev.get("Stage IDs", []):
                            stage_group[sid] = grp
                elif kind == "SparkListenerTaskEnd":
                    grp = stage_group.get(ev.get("Stage ID"))
                    if not grp:
                        continue
                    m = ev.get("Task Metrics") or {}
                    rd = m.get("Shuffle Read Metrics") or {}
                    wr = m.get("Shuffle Write Metrics") or {}
                    acc = out.setdefault(grp, {"shuffle_read": 0, "shuffle_write": 0})
                    acc["shuffle_read"] += int(rd.get("Remote Bytes Read", 0)) + int(
                        rd.get("Local Bytes Read", 0)
                    )
                    acc["shuffle_write"] += int(wr.get("Shuffle Bytes Written", 0))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=1600)
    ap.add_argument("--vec-n", type=int, default=8_000_000)
    ap.add_argument("--sem-n", type=int, default=1_000_000)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/scale_soak.json")
    ap.add_argument("--work-dir", default="/tmp/scale_soak_data")
    ap.add_argument(
        "--prefix-threshold", type=float, default=0.9,
        help="prefix-jaccard similarity threshold: candidate volume grows "
             "~quadratically as this drops (t=0.7 indexes 30%% of each doc's "
             "shingles and overflowed the sandbox disk on this boilerplate-"
             "heavy corpus; 0.9 is the documented scale operating point)",
    )
    ap.add_argument(
        "--ops", default="minhash,audit,prefix,knn,sem",
        help="comma list of ops to run (resume a crashed soak selectively)",
    )
    args = ap.parse_args()
    ops = set(args.ops.split(","))

    shutil.rmtree(EVLOG_DIR, ignore_errors=True)
    os.makedirs(EVLOG_DIR, exist_ok=True)
    shutil.rmtree(args.work_dir, ignore_errors=True)

    from pyspark_validator.session import get_spark

    spark = get_spark(
        app_name="scale-soak",
        # 32 shuffle partitions (the local default) puts 12.5M rows in each
        # prefix-join sort task at 8M docs -- measured UNABLE_TO_ACQUIRE_MEMORY
        # under concurrent SMJ+window consumers. 256 partitions cuts per-task
        # memory 8x; AQE coalesces them back when small.
        shuffle_partitions=256,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVLOG_DIR}",
            # single plain-text file (no rolling dir, no zstd) so the
            # shuffle-byte attribution below can parse it stdlib-only
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
            # zstd shuffles: ~1.4x smaller spill than lz4 -- the sandbox has
            # ~95 GB of usable disk and the prefix-jaccard op's six 400M-row
            # shuffles are the one phase that brushes against it
            "spark.io.compression.codec": "zstd",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        },
    )
    app_id = spark.sparkContext.applicationId
    res: dict = {"rep": args.rep, "vec_n": args.vec_n, "sem_n": args.sem_n}

    # ---- corpus build (written to parquet so every op pays a real scan) ----
    docs_path = f"{args.work_dir}/docs.parquet"
    _, t_build = _run_op(
        spark, "build_docs",
        lambda: amplified_docs(spark, args.sf_dir, args.rep).write.parquet(docs_path),
    )
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    res["n_docs"] = n_docs
    res["build_docs_sec"] = t_build

    from pyspark_validator.pipelines.dedup import (
        _band_explode,
        minhash_lsh_pairs,
        minhash_signatures,
        prefix_jaccard_pairs,
    )

    def _progress(key):
        print(json.dumps({key: res[key]}), flush=True)

    # ---- 1. minhash LSH near-dup pairs -----------------------------------
    if "minhash" in ops:
        pairs, t = _run_op(
            spark, "minhash_lsh",
            lambda: minhash_lsh_pairs(docs, threshold=0.7).count(),
        )
        res["minhash_lsh"] = {"pairs": pairs, "sec": t, "docs_per_sec": round(n_docs / t, 1)}
        _progress("minhash_lsh")

    # hot-bucket audit: pair mass lost to the max_bucket guard (separate
    # signature pass; the public API hides its internals by design)
    def bucket_audit():
        sig = minhash_signatures(docs)
        banded = _band_explode(sig, 16, 4, keep_sig=False)
        sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("bs"))
        row = sizes.agg(
            F.sum(F.col("bs") * (F.col("bs") - 1) / 2).alias("cand_pairs"),
            F.sum(
                F.when(F.col("bs") > 10_000, F.col("bs") * (F.col("bs") - 1) / 2)
                .otherwise(F.lit(0.0))
            ).alias("dropped_pairs"),
            F.max("bs").alias("max_bucket_size"),
        ).collect()[0]
        return {
            "candidate_pairs_banded": int(row["cand_pairs"]),
            "dropped_pairs": int(row["dropped_pairs"]),
            "max_bucket_size": int(row["max_bucket_size"]),
            "dropped_fraction": round(
                row["dropped_pairs"] / row["cand_pairs"], 6
            ) if row["cand_pairs"] else 0.0,
        }

    if "audit" in ops:
        audit, t = _run_op(spark, "minhash_bucket_audit", bucket_audit)
        audit["sec"] = t
        res["minhash_bucket_audit"] = audit
        _progress("minhash_bucket_audit")

    # ---- 2. prefix-filtered exact Jaccard join ---------------------------
    if "prefix" in ops:
        pairs, t = _run_op(
            spark, "prefix_jaccard",
            lambda: prefix_jaccard_pairs(
                docs, threshold=args.prefix_threshold
            ).count(),
        )
        res["prefix_jaccard"] = {
            "pairs": pairs, "sec": t, "threshold": args.prefix_threshold,
            "docs_per_sec": round(n_docs / t, 1),
        }
        _progress("prefix_jaccard")

    # planted truth for both text ops: every 20th src doc, rep/2 exact-dup pairs
    n_src = spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()
    res["planted_text_pairs"] = (n_src // 20 + (1 if n_src % 20 else 0)) * (args.rep // 2)

    from pyspark_validator.pipelines.similarity import (
        knn_join_lsh,
        semantic_dedup_clustered,
    )

    # ---- 3. LSH k-NN join: 10k queries vs the full vector corpus ---------
    vec_path = f"{args.work_dir}/vecs.parquet"
    _, t_vb = _run_op(
        spark, "build_vecs",
        lambda: synth_embeddings(spark, args.vec_n).write.parquet(vec_path),
    )
    vecs = spark.read.parquet(vec_path)
    res["build_vecs_sec"] = t_vb
    queries = vecs.filter(F.pmod(F.col("vec_id"), F.lit(args.vec_n // 10_000)) == 0)

    def knn():
        out = knn_join_lsh(
            queries, vecs, dim=64, k=10, num_bits=12, probes=1, exclude_self=True
        )
        n_res = out.count()
        # planted queries (seed shared with vec_id+1) must see cosine 1.0 top-1
        hits = (
            out.filter(
                (F.pmod(F.col("qid"), F.lit(997)) == 0)
                & (F.col("id") == F.col("qid") + 1)
                & (F.col("rank") == 1)
            ).count()
        )
        return n_res, hits

    if "knn" in ops:
        (n_res, hits), t = _run_op(spark, "knn_join_lsh", knn)
        n_q = queries.count()
        res["knn_join_lsh"] = {
            "queries": n_q, "corpus": args.vec_n, "result_rows": n_res,
            "planted_top1_hits": hits,
            "planted_expected": len([q for q in range(0, args.vec_n, args.vec_n // 10_000) if q % 997 == 0]),
            "sec": t, "vecs_per_sec": round(args.vec_n / t, 1),
        }
        _progress("knn_join_lsh")

    # ---- 4. SemDeDup (clustered) over sem-n vectors ----------------------
    sem = vecs.filter(F.col("vec_id") < args.sem_n)

    def semdedup():
        kept = semantic_dedup_clustered(
            sem, dim=64, threshold=0.95, n_lists=1024,
            sample_size=50_000, iters=4,
        ).count()
        return kept

    if "sem" in ops:
        kept, t = _run_op(spark, "semantic_dedup", semdedup)
        n_planted_vec = len(range(0, args.sem_n - 1, 997))
        res["semantic_dedup"] = {
            "n": args.sem_n, "kept": kept, "dropped": args.sem_n - kept,
            "planted_expected_drops": n_planted_vec,
            "sec": t, "vecs_per_sec": round(args.sem_n / t, 1),
        }
        _progress("semantic_dedup")

    spark.stop()
    time.sleep(2)  # let the event log close/rename
    res["shuffle_bytes"] = shuffle_bytes_by_group(app_id)
    print(json.dumps(res, indent=2))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    shutil.rmtree(args.work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
