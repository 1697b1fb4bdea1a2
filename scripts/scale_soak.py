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


def _json_default(o):
    """numpy scalars (np.bool_/int64/float64) leak out of sketch/pandas
    results; serialize them by value."""
    if hasattr(o, "item"):
        return o.item()
    raise TypeError(f"not JSON serializable: {type(o)}")


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


def plain_docs(spark, sf_dir: str, rep: int, words_per_line: int = 10):
    """rep UNALTERED copies of each sf doc (doc_id = src#r), text re-wrapped
    into ``words_per_line``-word newline lines.

    UNLIKE amplified_docs, gram / line / template keys are NOT suffixed per
    replica: every key's doc count multiplies by rep, so the boilerplate
    gram/line/layout becomes a key shared by up to the WHOLE corpus -- the
    genuine hot key the census tier's two-phase aggregations must absorb.
    That load shape is fatal for pair-emitting similarity ops (candidates
    quadratic in rep -- which is why the similarity soak suffixes) but the
    census ops emit per-occurrence or per-key rows, LINEAR in corpus size,
    so plain replication is exactly the honest stress.

    Closed-form truth: every per-key count at soak scale = rep x the same
    count on the base corpus (replicas are bit-identical), and planted
    checks reduce to cheap base-scale runs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("src"), "text", "source"
    )
    wrapped = F.array_join(
        F.transform(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("__w") / F.lit(words_per_line)).cast("int") - 1,
            ),
            lambda i: F.array_join(
                F.slice(F.col("__w"), i * words_per_line + 1, words_per_line),
                " ",
            ),
        ),
        "\n",
    )
    base = docs.select(
        "src",
        "source",
        # Generate barrier: without explode(array(w)) CollapseProject
        # re-inlines the split once per line slice
        F.explode(F.array(F.split(F.trim(F.col("text")), r"\s+"))).alias("__w"),
    ).select("src", "source", wrapped.alias("text"))
    return (
        base.repartition(256)
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
        .select(
            F.concat_ws("#", F.col("src").cast("string"), F.col("r").cast("string")).alias("doc_id"),
            "src",
            "source",
            "text",
        )
    )


def with_spans(df, chunk: int = 64, media_every: int = 7):
    """Derive the interleaved span column from text, deterministically per
    SOURCE doc: 64-char chunks; chunk i of source doc s is an image span when
    (s + i) % media_every == 0, with media_ref keyed by (s, i) -- NOT by
    replica -- so each media object is reused by every replica (hot
    media_ref keys with reuse == rep)."""
    n_chunks = F.greatest(
        F.ceil(F.length("text") / F.lit(chunk)).cast("int"), F.lit(1)
    )
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.when(
            F.pmod(F.col("src") + i, F.lit(media_every)) == 0,
            F.struct(
                F.lit("image").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.concat_ws(
                    "_", F.lit("m"), F.col("src").cast("string"), i.cast("string")
                ).alias("media_ref"),
                i.alias("offset"),
            ),
        ).otherwise(
            F.struct(
                F.lit("text").alias("kind"),
                F.substring(F.col("text"), i * chunk + 1, chunk).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                i.alias("offset"),
            )
        ),
    )
    return df.withColumn("spans", spans)


def validation_docs(spark, sf_dir: str, rep: int):
    """rep copies of each sf doc with REALISTIC (non-dictionary-degenerate)
    text for the validation-check soak: every word carries a per-replica
    suffix, so each of the rep x base text values is UNIQUE -- parquet's
    dictionary/RLE encodings cannot collapse the corpus the way plain
    replication does (the round-4 2M fused follow-up measured a 400x-
    replicated table compressing to ~54 KB/scan, which made scan-sharing
    wall-neutral by construction; this corpus makes the scan a real cost).

    Planted closed-form violations (require rep >= 4), all on the
    src % 100 == 0 docs so every expected count = n100 exactly:
      r == 1 -> text NULL            (completeness member: sum(n_null))
      r == 2 -> n_chars_s = 'xx'     (type_conformance member: sum(n_bad))
      r == 3 -> first span offset -1 (span_integrity: 'order' flag ONLY --
                 -1 < the remaining ascending offsets, so the strictly-
                 increasing rule still holds and no other flag trips)
    Spans are derived BEFORE the text-null plant so span text fields stay
    non-null (the plant must trip exactly one member each). n_chars / lang /
    source keep their base values, so every distribution at soak scale is
    EXACTLY the base distribution and drift/profile truths are closed-form.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("src"), "text", "lang", "source", "n_chars"
    )
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("_"), F.col("r").cast("string")),
        ),
        " ",
    )
    planted = F.pmod(F.col("src"), F.lit(100)) == 0
    base = (
        docs.repartition(256)
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
        .withColumn("text", suffixed)
    )
    base = with_spans(base)
    corrupt = F.transform(
        F.col("spans"),
        lambda x, i: F.when(
            i == 0,
            F.struct(
                x["kind"].alias("kind"),
                x["text"].alias("text"),
                x["media_ref"].alias("media_ref"),
                F.lit(-1).alias("offset"),
            ),
        ).otherwise(x),
    )
    return base.select(
        F.concat_ws(
            "#", F.col("src").cast("string"), F.col("r").cast("string")
        ).alias("doc_id"),
        "src",
        "lang",
        "source",
        F.when(planted & (F.col("r") == 1), F.lit(None).cast("string"))
        .otherwise(F.col("text"))
        .alias("text"),
        "n_chars",
        F.when(planted & (F.col("r") == 2), F.lit("xx"))
        .otherwise(F.col("n_chars").cast("string"))
        .alias("n_chars_s"),
        F.when(planted & (F.col("r") == 3), corrupt)
        .otherwise(F.col("spans"))
        .alias("spans"),
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


def _gram_census_tier(spark, args, ops, res, _progress) -> None:
    """Soak the gram/line/census ops on the plain-replicated corpus -- the
    tier whose shuffles carry gram keys, with the boilerplate key replicated
    into a genuine corpus-scale hot key. Every expectation is a closed form
    in (rep x base-corpus statistic); base statistics are one cheap job each
    over the 5k-doc base frame."""
    from pyspark_validator.pipelines.curation import (
        _exploded_grams,
        contamination_fraction,
        delta_duplicate_spans,
        dsir_bucket_counts,
        duplicate_spans,
        gram_count_index,
    )
    from pyspark_validator.pipelines.dedup import dedup_lines, duplicate_lines
    from pyspark_validator.pipelines.interleaved import (
        layout_census,
        layout_diversity,
        media_reuse_summary,
        span_kind_transitions,
    )

    rep = args.rep
    plain_path = f"{args.work_dir}/plain.parquet"
    _, t_build = _run_op(
        spark, "build_plain",
        lambda: plain_docs(spark, args.sf_dir, rep).write.parquet(plain_path),
    )
    P = spark.read.parquet(plain_path)
    n_docs = P.count()
    res["plain_n_docs"] = n_docs
    res["build_plain_sec"] = t_build
    base = plain_docs(spark, args.sf_dir, 1).persist()
    n_base = base.count()

    if "spans" in ops or "delta_spans" in ops:
        # base truths: G = total gram positions; D2 = natural dup-span rows
        G = _exploded_grams(base, "text", 8, ["doc_id"]).count()
        D2 = duplicate_spans(base).count()
        base_max_df = (
            gram_count_index(base).agg(F.max("n_docs")).collect()[0][0]
        )

    # ---- duplicate_spans at 8M docs: every gram is in >= rep docs, so ALL
    # positions flag -> rows == rep*G exactly; the hottest gram's n_docs is
    # rep * its base df (the map-side combine absorbs rep x the row volume)
    if "spans" in ops:
        def spans_op():
            row = duplicate_spans(P).agg(
                F.count(F.lit(1)).alias("rows"), F.max("n_docs").alias("max_nd")
            ).collect()[0]
            return int(row["rows"]), int(row["max_nd"])

        (rows, max_nd), t = _run_op(spark, "duplicate_spans", spans_op)
        res["duplicate_spans"] = {
            "rows": rows, "expected_rows": rep * G,
            "rows_exact": rows == rep * G,
            "max_n_docs": max_nd, "expected_max_n_docs": rep * base_max_df,
            "max_exact": max_nd == rep * base_max_df,
            "sec": t, "docs_per_sec": round(n_docs / t, 1),
        }
        _progress("duplicate_spans")

    # ---- standing gram index + delta probe: copies of every base doc flag
    # fully (G rows); novel-suffixed docs share no gram with the corpus and
    # flag only on their own internal duplicates (== D2 rows)
    if "delta_spans" in ops:
        idx_path = f"{args.work_dir}/gram_index.parquet"

        def build_index():
            gram_count_index(P).write.parquet(idx_path)
            return spark.read.parquet(idx_path).count()

        idx_rows, t_idx = _run_op(spark, "gram_count_index", build_index)
        copies = base.select(
            F.concat(F.col("doc_id"), F.lit("c")).alias("doc_id"), "text"
        )
        novel = base.select(
            F.concat(F.col("doc_id"), F.lit("n")).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", r"$1_novel").alias("text"),
        )
        delta = copies.unionByName(novel)
        index = spark.read.parquet(idx_path)
        rows, t = _run_op(
            spark, "delta_duplicate_spans",
            lambda: delta_duplicate_spans(delta, index).count(),
        )
        res["delta_duplicate_spans"] = {
            "index_rows": idx_rows, "index_build_sec": t_idx,
            "delta_docs": 2 * n_base, "rows": rows,
            "expected_rows": G + D2, "rows_exact": rows == G + D2,
            "sec": t,
        }
        _progress("delta_duplicate_spans")

    # ---- line dedup tier: census + full rewrite -------------------------
    if "lines" in ops:
        bl = base.select(
            F.col("doc_id").alias("_id"),
            F.explode(F.split("text", "\n")).alias("line"),
        ).filter(F.trim("line") != "")
        b = bl.agg(
            F.count(F.lit(1)).alias("L"),
            F.count_distinct("line").alias("Ldist"),
        ).collect()[0]
        L, Ldist = int(b["L"]), int(b["Ldist"])
        ldp = bl.select("_id", "line").distinct().count()  # (line, doc) pairs
        base_line_max = (
            bl.select("_id", "line").distinct().groupBy("line")
            .agg(F.count(F.lit(1)).alias("d")).agg(F.max("d")).collect()[0][0]
        )

        def lines_census():
            row = duplicate_lines(P).agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n_docs").alias("snd"),
                F.max("n_docs").alias("mnd"),
            ).collect()[0]
            return int(row["rows"]), int(row["snd"]), int(row["mnd"])

        (rows, snd, mnd), t = _run_op(spark, "duplicate_lines", lines_census)
        res["duplicate_lines"] = {
            "rows": rows, "expected_rows": Ldist,
            "sum_n_docs": snd, "expected_sum": rep * ldp,
            "max_n_docs": mnd, "expected_max": rep * base_line_max,
            "exact": rows == Ldist and snd == rep * ldp and mnd == rep * base_line_max,
            "sec": t, "docs_per_sec": round(n_docs / t, 1),
        }
        _progress("duplicate_lines")

        def lines_rewrite():
            row = dedup_lines(P, broadcast_banned=True).agg(
                F.sum("n_removed_lines").alias("rm"),
                F.sum("n_lines").alias("nl"),
            ).collect()[0]
            return int(row["rm"]), int(row["nl"])

        (rm, nl), t = _run_op(spark, "dedup_lines", lines_rewrite)
        res["dedup_lines"] = {
            "removed": rm, "expected_removed": rep * L,
            "n_lines": nl, "expected_n_lines": rep * L,
            "exact": rm == rep * L and nl == rep * L,
            "sec": t, "docs_per_sec": round(n_docs / t, 1),
        }
        _progress("dedup_lines")

    # ---- interleaved censuses: media reuse / layout templates / kind
    # transitions, all sum-mergeable -> soak counts are exactly rep x base
    if "census" in ops:
        bs = with_spans(base)
        base_media = media_reuse_summary(bs, id_col="doc_id").collect()[0]
        base_layout = layout_census(bs, group_col="source").agg(
            F.count(F.lit(1)).alias("rows"), F.sum("n_docs").alias("docs")
        ).collect()[0]
        base_trans = {
            (r["src"], r["dst"]): r["n_transitions"]
            for r in span_kind_transitions(bs).collect()
        }
        PS = with_spans(P)

        def census_op():
            media = media_reuse_summary(PS, id_col="doc_id").collect()[0]
            lc = layout_census(PS, group_col="source").persist()
            layout = lc.agg(
                F.count(F.lit(1)).alias("rows"), F.sum("n_docs").alias("docs")
            ).collect()[0]
            div = layout_diversity(lc).agg(F.max("top_layout_share")).collect()[0][0]
            lc.unpersist()
            trans = {
                (r["src"], r["dst"]): r["n_transitions"]
                for r in span_kind_transitions(PS).collect()
            }
            return media, layout, div, trans

        (media, layout, div, trans), t = _run_op(spark, "interleaved_census", census_op)
        media_ok = (
            media["n_media_slots"] == rep * base_media["n_media_slots"]
            and media["n_distinct_refs"] == base_media["n_distinct_refs"]
            and media["n_hot_refs"] == base_media["n_distinct_refs"]
            and media["max_doc_reuse"] == rep * base_media["max_doc_reuse"]
        )
        layout_ok = (
            layout["rows"] == base_layout["rows"]
            and layout["docs"] == rep * base_layout["docs"]
        )
        trans_ok = trans == {k: rep * v for k, v in base_trans.items()}
        res["interleaved_census"] = {
            "media_slots": int(media["n_media_slots"]),
            "distinct_refs": int(media["n_distinct_refs"]),
            "max_doc_reuse": int(media["max_doc_reuse"]),
            "layout_templates": int(layout["rows"]),
            "max_top_layout_share": round(float(div), 6),
            "media_exact": media_ok, "layout_exact": layout_ok,
            "transitions_exact": trans_ok,
            "sec": t, "docs_per_sec": round(3 * n_docs / t, 1),
        }
        _progress("interleaved_census")

    # ---- DSIR hashed-bigram bucket counts: per-bucket rep x base ---------
    if "dsir" in ops:
        base_counts = {
            r["bucket"]: r["cnt"] for r in dsir_bucket_counts(base).collect()
        }

        def dsir_op():
            got = {r["bucket"]: r["cnt"] for r in dsir_bucket_counts(P).collect()}
            return got

        got, t = _run_op(spark, "dsir_bucket_counts", dsir_op)
        res["dsir_bucket_counts"] = {
            "buckets": len(got),
            "exact": got == {b: rep * c for b, c in base_counts.items()},
            "hottest_bucket_cnt": max(got.values()) if got else 0,
            "sec": t, "docs_per_sec": round(n_docs / t, 1),
        }
        _progress("dsir_bucket_counts")

    # ---- contamination fraction vs a 100-item benchmark ------------------
    if "contam" in ops:
        bench = base.filter(F.pmod(F.col("src"), F.lit(50)) == 0).select(
            F.concat(F.lit("b"), F.col("src").cast("string")).alias("doc_id"),
            "text",
        ).persist()
        n_bench = bench.count()
        base_rows = contamination_fraction(base, bench).count()
        n_bench_gr = (
            _exploded_grams(bench, "text", 8, ["doc_id"])
            .select("doc_id").distinct().count()
        )

        def contam_op():
            out = contamination_fraction(P, bench).persist()
            rows = out.count()
            full = out.filter(
                (F.col("frac") == 1.0)
                & (F.split(F.col("doc_id"), "#")[0] == F.expr("substring(bench_id, 2)"))
            ).count()
            out.unpersist()
            return rows, full

        (rows, full), t = _run_op(spark, "contamination_fraction", contam_op)
        res["contamination_fraction"] = {
            "bench_items": n_bench, "rows": rows,
            "expected_rows": rep * base_rows,
            "rows_exact": rows == rep * base_rows,
            "planted_full_coverage": full,
            "expected_full_coverage": rep * n_bench_gr,
            "planted_exact": full == rep * n_bench_gr,
            "sec": t, "docs_per_sec": round(n_docs / t, 1),
        }
        _progress("contamination_fraction")
        bench.unpersist()

    base.unpersist()


def _validation_tier(spark, args, ops, res, _progress) -> None:
    """Soak the VALIDATION-CHECK tier itself at 8M docs -- the one family
    round 4 left executed only at sf0.1 (VERDICT r4 task 3): the 15-member
    FusedPass vs 15 standalone single-member passes over a MATERIALIZED
    realistic-text parquet (fused scan-amplification at soak scale),
    sketch_profile, the DataStats wide aggregations, and the drift family.
    Every planted truth is closed-form in (rep, base-corpus statistics)."""
    from bench import _fs_bytes_read
    from pyspark_validator.checks.drift import categorical_drift, numeric_drift
    from pyspark_validator.checks.stats import numeric_profile, string_profile
    from pyspark_validator.fused import FusedPass
    from pyspark_validator.sketches import sketch_profile

    rep = args.val_rep
    if rep < 4:
        raise SystemExit("--val-rep must be >= 4 (plants live at r in {1,2,3})")
    val_path = f"{args.work_dir}/validation.parquet"
    _, t_build = _run_op(
        spark, "build_validation",
        lambda: validation_docs(spark, args.sf_dir, rep).write.parquet(val_path),
    )
    P = spark.read.parquet(val_path)
    n_docs = P.count()
    sz_bytes = sum(
        os.path.getsize(p) for p in glob.glob(f"{val_path}/*.parquet")
    )
    res["validation_corpus"] = {
        "n_docs": n_docs, "build_sec": t_build,
        "parquet_bytes": sz_bytes,
        "bytes_per_doc": round(sz_bytes / n_docs, 1),
    }
    # base statistics (rep=1 has no plants: r >= 1 never occurs)
    base = validation_docs(spark, args.sf_dir, 1).persist()
    n_base = base.count()
    n100 = base.filter(F.pmod(F.col("src"), F.lit(100)) == 0).count()
    lang_counts = {
        r["lang"]: r["c"]
        for r in base.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    expected_lang = {k: v / n_base for k, v in lang_counts.items()}
    top_lang = max(lang_counts, key=lang_counts.get)

    edges = [0.0, 100.0, 200.0, 400.0, 800.0, 1600.0]
    probs = [0.2] * 5

    def members():
        return [
            ("nar", lambda p, n: p.add_nar(n, ante={"lang": ["en"]}, cons={"n_chars": (0.0, 1e7)}, min_confidence=0.1)),
            ("ac", lambda p, n: p.add_ac(n, "n_chars", "n_chars", "+", [(0.0, 1e7)])),
            ("row_predicate", lambda p, n: p.add_row_predicate(n, {"n_chars": (0.0, 1e7)})),
            ("completeness", lambda p, n: p.add_completeness(n, "text", max_null_fraction=0.001)),
            ("numeric_profile", lambda p, n: p.add_numeric_profile(n, "n_chars")),
            ("distinct", lambda p, n: p.add_distinct(n, "doc_id")),
            ("type_conformance", lambda p, n: p.add_type_conformance(n, "n_chars_s", "bigint", max_violation_fraction=0.001)),
            ("span_integrity", lambda p, n: p.add_span_integrity(n)),
            ("pii_budget", lambda p, n: p.add_pii_budget(n, text_col="text", max_doc_fraction=1.0)),
            ("benford", lambda p, n: p.add_benford(n, "n_chars")),
            ("class_balance", lambda p, n: p.add_class_balance(n, "lang", expected=expected_lang)),
            ("token_budget", lambda p, n: p.add_token_budget(n)),
            ("media_context", lambda p, n: p.add_media_context(n)),
            ("interleaved_quality", lambda p, n: p.add_interleaved_quality(n)),
            ("histogram_drift", lambda p, n: p.add_histogram_drift(n, "n_chars", edges, probs)),
        ]

    # ---- fused-vs-standalone at soak scale (the 100-TB single-scan story) -
    if "valfused" in ops:
        def standalone_loop():
            per: dict[str, float] = {}
            b0 = _fs_bytes_read(spark)
            for kind, add in members():
                fp = FusedPass(P, num_partitions=32)
                add(fp, f"s_{kind}")
                t0 = time.perf_counter()
                fp.verdict(f"s_{kind}").count()
                per[kind] = round(time.perf_counter() - t0, 2)
                fp.unpersist()
            return per, _fs_bytes_read(spark) - b0

        (per, standalone_bytes), t_standalone = _run_op(
            spark, "val_standalone", standalone_loop
        )

        def fused_pass():
            fp = FusedPass(P, num_partitions=32)
            for kind, add in members():
                add(fp, f"f_{kind}")
            b1 = _fs_bytes_read(spark)
            t0 = time.perf_counter()
            for kind, _ in members():
                fp.verdict(f"f_{kind}").count()
            fused_sec = round(time.perf_counter() - t0, 2)
            fused_bytes = _fs_bytes_read(spark) - b1
            # planted verdict truths out of the SAME fused pass ------------
            comp = fp.verdict("f_completeness").agg(
                F.sum("n_null").alias("x")).collect()[0]["x"]
            bad = fp.verdict("f_type_conformance").agg(
                F.sum("n_bad").alias("x")).collect()[0]["x"]
            spn = fp.verdict("f_span_integrity").agg(
                F.sum("order_violations").alias("o"),
                F.sum("kind_violations").alias("k"),
                F.sum("text_null_violations").alias("t"),
                F.sum("media_null_violations").alias("m"),
            ).collect()[0]
            dis = fp.rollup_distinct("f_distinct").collect()[0]
            ben = fp.rollup_benford("f_benford").collect()[0]
            cb_all_hold = (
                fp.verdict("f_class_balance").filter(~F.col("holds")).count() == 0
            )
            fp.unpersist()
            return {
                "fused_sec": fused_sec, "fused_bytes": fused_bytes,
                "planted_null": int(comp), "planted_bad": int(bad),
                "span_order": int(spn["o"]),
                "span_other": int(spn["k"]) + int(spn["t"]) + int(spn["m"]),
                "distinct_n_rows": int(dis["n_rows"]),
                "distinct_est": float(dis["distinct_est"]),
                "benford_n": int(ben["n"]), "benford_mad": float(ben["mad"]),
                "class_balance_all_hold": bool(cb_all_hold),
            }

        fused, t_fused_total = _run_op(spark, "val_fused", fused_pass)
        base_mad = None
        fp_b = FusedPass(base, num_partitions=32)
        fp_b.add_benford("b", "n_chars")
        fp_b.verdict("b").count()
        base_mad = float(fp_b.rollup_benford("b").collect()[0]["mad"])
        fp_b.unpersist()
        total = round(sum(per.values()), 2)
        res["val_fused"] = {
            "checks": 15, "n_docs": n_docs,
            "standalone_sec": total, "fused_sec": fused["fused_sec"],
            "speedup": round(total / fused["fused_sec"], 2),
            "standalone_src_bytes": standalone_bytes,
            "fused_src_bytes": fused["fused_bytes"],
            "scan_amplification": round(
                standalone_bytes / fused["fused_bytes"], 1
            ) if fused["fused_bytes"] else None,
            "standalone_per_check": per,
            # planted truths (all exact integers except the two bounds)
            "planted_null": fused["planted_null"],
            "planted_null_exact": fused["planted_null"] == n100,
            "planted_bad": fused["planted_bad"],
            "planted_bad_exact": fused["planted_bad"] == n100,
            "span_order": fused["span_order"],
            "span_order_exact": fused["span_order"] == n100,
            "span_other_zero": fused["span_other"] == 0,
            "distinct_n_rows_exact": fused["distinct_n_rows"] == n_docs,
            "distinct_est": round(fused["distinct_est"], 1),
            "distinct_est_within_5pct": abs(fused["distinct_est"] / n_docs - 1.0) <= 0.05,
            "benford_n_exact": fused["benford_n"] == n_docs,
            "benford_mad": fused["benford_mad"],
            "benford_mad_matches_base": abs(fused["benford_mad"] - base_mad) <= 1e-9,
            "class_balance_all_hold": fused["class_balance_all_hold"],
            "expected_n100": n100,
        }
        _progress("val_fused")

    # ---- mergeable-sketch profile (HLL + CMS + KLL in one scan) ----------
    if "sketch" in ops:
        def sketch_op():
            prof = sketch_profile(P, ["doc_id", "lang", "n_chars"])
            return prof

        prof, t = _run_op(spark, "sketch_profile", sketch_op)
        doc_est = prof["doc_id"].distinct_est()
        lang_est = prof["lang"].distinct_est()
        en_est = int(prof["lang"].heavy_hitter_counts(spark, [top_lang])[top_lang])
        en_exact = rep * lang_counts[top_lang]
        med = prof["n_chars"].quantiles([0.5])[0]
        med_rank = (
            base.filter(F.col("n_chars").cast("double") <= F.lit(float(med))).count()
            / n_base
        )
        res["sketch_profile"] = {
            "sec": t, "docs_per_sec": round(n_docs / t, 1),
            "n_exact": prof["doc_id"].n == n_docs,
            "doc_id_distinct_est": round(doc_est, 1),
            "doc_id_est_within_5pct": abs(doc_est / n_docs - 1.0) <= 0.05,
            "lang_distinct_est": round(lang_est, 2),
            "lang_est_exact_smallrange": round(lang_est) == len(lang_counts),
            "top_lang_cms_est": en_est, "top_lang_exact": en_exact,
            "cms_overestimates_only": en_est >= en_exact,
            "cms_within_1pct_of_n": (en_est - en_exact) <= 0.01 * n_docs,
            "kll_median": med,
            "kll_median_rank_in_45_55": 0.45 <= med_rank <= 0.55,
        }
        _progress("sketch_profile")

    # ---- DataStats wide aggregations (numeric + string single passes) ----
    if "datastats" in ops:
        b_num = {
            r["column"]: r
            for r in numeric_profile(base, ["n_chars", "src"]).collect()
        }

        def datastats_op():
            num = {
                r["column"]: r
                for r in numeric_profile(P, ["n_chars", "src"]).collect()
            }
            st = {
                r["column"]: r
                for r in string_profile(P, ["lang", "text"]).collect()
            }
            return num, st

        (num, st), t = _run_op(spark, "datastats_wide", datastats_op)
        nc, bnc = num["n_chars"], b_num["n_chars"]
        res["datastats_wide"] = {
            "sec": t, "docs_per_sec": round(n_docs / t, 1),
            "count_exact": nc["count"] == n_docs,
            "min_max_exact": (nc["min"], nc["max"]) == (bnc["min"], bnc["max"]),
            "sum_exact": nc["sum"] == rep * bnc["sum"],
            "zeros_exact": nc["n_zeros"] == rep * bnc["n_zeros"],
            "avg_matches_base": abs(nc["avg"] - bnc["avg"]) <= 1e-9 * abs(bnc["avg"]),
            "lang_count_exact": st["lang"]["count"] == n_docs,
            "lang_distinct_exact": st["lang"]["n_distinct"] == len(lang_counts),
            "text_nonnull_exact": st["text"]["count"] == n_docs - n100,
            "text_null_exact": st["text"]["n_nulls"] == n100,
        }
        _progress("datastats_wide")

    # ---- drift family: 8M-current vs base baseline, null + planted -------
    if "drift" in ops:
        def drift_op():
            cat = categorical_drift(base, P, "lang").collect()[0]
            num = numeric_drift(base, P, "n_chars", num_bins=50).collect()[0]
            shifted = P.withColumn(
                "n_chars",
                F.col("n_chars")
                + F.when(F.pmod(F.col("src"), F.lit(2)) == 1, F.lit(300)).otherwise(F.lit(0)),
            )
            shift = numeric_drift(base, shifted, "n_chars", num_bins=50).collect()[0]
            return cat, num, shift

        (cat, num, shift), t = _run_op(spark, "drift_family", drift_op)
        res["drift_family"] = {
            "sec": t, "docs_per_sec": round(3 * n_docs / t, 1),
            "cat_counts_exact": cat["n_b"] == n_base and cat["n_c"] == n_docs,
            "cat_psi": round(float(cat["psi"]), 8),
            "cat_null_drift_clean": (not cat["drift_detected"]) and float(cat["psi"]) < 1e-3,
            "num_psi": round(float(num["psi"]), 8),
            "num_null_drift_clean": (not num["drift_detected"]) and float(num["psi"]) < 1e-3,
            "shift_psi": round(float(shift["psi"]), 6),
            "shift_detected": bool(shift["drift_detected"]),
        }
        _progress("drift_family")

    base.unpersist()


def _graph_tier(spark, args, ops, res, _progress) -> None:
    """Soak the graph + sequence tier at 8M vertices/edges/rows -- executed
    evidence for the round-5 additions' scale claims. Every expected count is
    CLOSED-FORM: vertex attributes are pure functions of the vertex id with
    small moduli, so each truth is computed by a one-period python loop and
    must come back exact from the full-scale Spark run.

    Graph shape: n customers (segment 'B' every 1000th id, else 'A';
    nationkey = id %% 25; balance = (id %% 21)*1000 - 10000 as a string) +
    25 nation vertices (vid offset 10^9), one directed in_nation edge per
    customer -- the same shape as the gfd/gdd contract queries, amplified."""
    from pyspark_validator.graphs.gdd import (
        AttrToken,
        Gdd,
        GddConstraint,
        gdd_violations,
    )
    from pyspark_validator.graphs.gfd import Gfd, gfd_violations
    from pyspark_validator.graphs.gspan import gspan_edge_supports
    from pyspark_validator.graphs.io import GraphData, VertexData
    from pyspark_validator.graphs.maxfem import parallel_episode_supports

    n = args.graph_n
    vpath = f"{args.work_dir}/graph_vertices.parquet"
    epath = f"{args.work_dir}/graph_edges.parquet"

    def build():
        customers = spark.range(n).select(
            F.col("id").alias("vid"),
            F.col("id").alias("node_id"),
            F.lit("customer").alias("label"),
            F.create_map(
                F.lit("segment"),
                F.when(F.pmod("id", F.lit(1000)) == 0, "B").otherwise("A"),
                F.lit("nationkey"), F.pmod("id", F.lit(25)).cast("string"),
                F.lit("balance"),
                (F.pmod("id", F.lit(21)) * 1000 - 10000).cast("string"),
            ).alias("attrs"),
        )
        nations = spark.range(25).select(
            (F.col("id") + 1000000000).alias("vid"),
            (F.col("id") + 1000000000).alias("node_id"),
            F.lit("nation").alias("label"),
            F.create_map(
                F.lit("name"), F.concat(F.lit("n"), F.col("id").cast("string")),
                F.lit("nationkey"), F.col("id").cast("string"),
            ).alias("attrs"),
        )
        customers.unionByName(nations).write.parquet(vpath)
        spark.range(n).select(
            F.col("id").alias("src"),
            (F.pmod("id", F.lit(25)) + 1000000000).alias("dst"),
            F.lit("in_nation").alias("label"),
        ).write.parquet(epath)

    _, t_build = _run_op(spark, "build_graph", build)
    vertices = spark.read.parquet(vpath)
    edges = spark.read.parquet(epath)
    res["graph_corpus"] = {"n_customers": n, "build_sec": t_build}

    pattern = GraphData(
        directed=False,
        vertices=[
            VertexData(node_id=0, attrs={"label": "customer"}),
            VertexData(node_id=1, attrs={"label": "nation"}),
        ],
        edges=[(0, 1, "in_nation")],
    )

    if "gfd" in ops:
        # expected: id % 25 == 0 (nation n0) and id % 1000 == 0 (segment B);
        # 1000 % 25 == 0 so that's every multiple of 1000
        exp_viol = sum(
            1 for i in range(0, n, 1000) if i % 25 == 0
        )
        gfd_bad = Gfd(
            pattern,
            [((1, "name"), (-1, "n0"))],
            [((0, "segment"), (-1, "A"))],
        )
        gfd_holds = Gfd(pattern, [], [((0, "nationkey"), (1, "nationkey"))])

        def gfd_op():
            v1 = gfd_violations(vertices, edges, gfd_bad).count()
            v2 = gfd_violations(vertices, edges, gfd_holds).count()
            return v1, v2

        (v1, v2), t = _run_op(spark, "gfd_check", gfd_op)
        res["gfd_check"] = {
            "sec": t, "docs_per_sec": round(2 * n / t, 1),
            "violations": v1, "expected": exp_viol, "exact": v1 == exp_viol,
            "holds_violations": v2, "holds_exact": v2 == 0,
        }
        _progress("gfd_check")

    if "gdd" in ops:
        # expected: id % 25 == 3 and |(id % 21)*1000 - 10000| > 9000
        period = 25 * 21
        per_cycle = [
            i for i in range(period)
            if i % 25 == 3 and abs((i % 21) * 1000 - 10000) > 9000
        ]
        exp_ce = (n // period) * len(per_cycle) + sum(
            1 for i in per_cycle if i < n % period
        )
        gdd = Gdd(
            GraphData(directed=True, vertices=pattern.vertices,
                      edges=pattern.edges),
            [GddConstraint(AttrToken(1, "nationkey"), 3, 0.0, "abs_diff", "eq")],
            [GddConstraint(AttrToken(0, "balance"), 0.0, 9000.0, "abs_diff", "le")],
        )
        ce, t = _run_op(
            spark, "gdd_check",
            lambda: gdd_violations(vertices, edges, gdd).count(),
        )
        res["gdd_check"] = {
            "sec": t, "docs_per_sec": round(n / t, 1),
            "counterexamples": ce, "expected": exp_ce, "exact": ce == exp_ce,
        }
        _progress("gdd_check")

    if "gspan" in ops:
        # 8-edge transactions; labels are functions of id mod 30, so the
        # census truth loops over one lcm(8*t stride, 30) period of t
        def seed_truth():
            counts: dict[tuple, int] = {}
            t_period = 15  # (8*t) % 30 cycles with period 15 in t
            for t_ in range(t_period):
                seen = set()
                for s in range(8):
                    i = 8 * t_ + s
                    a, b, el = i % 5, 10 + i % 3, i % 2
                    seen.add((min(a, b), max(a, b), el))
                for key in seen:
                    counts[key] = counts.get(key, 0) + 1
            n_tx = n // 8
            full, rem = divmod(n_tx, t_period)
            out = {k: v * full for k, v in counts.items()}
            for t_ in range(rem):
                seen = set()
                for s in range(8):
                    i = 8 * t_ + s
                    a, b, el = i % 5, 10 + i % 3, i % 2
                    seen.add((min(a, b), max(a, b), el))
                for key in seen:
                    out[key] = out.get(key, 0) + 1
            return out

        def gspan_op():
            rows = spark.range(n).select(
                (F.col("id") / 8).cast("long").alias("graph_id"),
                F.pmod("id", F.lit(5)).alias("src_label"),
                (F.pmod("id", F.lit(3)) + 10).alias("dst_label"),
                F.pmod("id", F.lit(2)).alias("edge_label"),
            )
            return {
                (r["v1_label"], r["v2_label"], r["edge_label"]): r["support"]
                for r in gspan_edge_supports(rows).collect()
            }

        got, t = _run_op(spark, "gspan_census", gspan_op)
        exp = seed_truth()
        res["gspan_census"] = {
            "sec": t, "edges_per_sec": round(n / t, 1),
            "seeds": len(got), "exact": got == exp,
        }
        _progress("gspan_census")

    if "episodes" in ops:
        # buckets of 100 rows; event = id % 13 -> bucket content is a pure
        # function of bucket % 13
        def episode_truth():
            singles: dict[int, int] = {}
            pairs: dict[tuple, int] = {}
            n_buckets = n // 100
            for bmod in range(13):
                events = sorted({(100 * bmod + i) % 13 for i in range(100)})
                cnt = len(range(bmod, n_buckets, 13))
                for e in events:
                    singles[e] = singles.get(e, 0) + cnt
                for x in range(len(events)):
                    for y in range(x + 1, len(events)):
                        k = (events[x], events[y])
                        pairs[k] = pairs.get(k, 0) + cnt
            return singles, pairs

        def episodes_op():
            rows = spark.range((n // 100) * 100).select(
                (F.col("id") / 100).cast("long").alias("bucket"),
                F.pmod("id", F.lit(13)).alias("event"),
            )
            singles, pairs = {}, {}
            for r in parallel_episode_supports(
                rows, ts_col="bucket", event_col="event", min_support=1
            ).collect():
                if r["event_b"] is None:
                    singles[r["event_a"]] = r["support"]
                else:
                    pairs[(r["event_a"], r["event_b"])] = r["support"]
            return singles, pairs

        (gs, gp), t = _run_op(spark, "episode_census", episodes_op)
        es, ep = episode_truth()
        res["episode_census"] = {
            "sec": t, "rows_per_sec": round(n / t, 1),
            "singles": len(gs), "pairs": len(gp),
            "exact": gs == es and gp == ep,
        }
        _progress("episode_census")


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
        help="comma list of ops to run (resume a crashed soak selectively). "
             "Similarity tier (suffixed corpus): minhash,audit,prefix,knn,sem,"
             "prefix07. Gram/census tier (plain-replicated corpus -- the "
             "hot-key load shape): spans,delta_spans,lines,census,dsir,contam. "
             "Validation tier (realistic-text materialized corpus): "
             "valfused,sketch,datastats,drift. Graph/sequence tier "
             "(synthetic closed-form graph): gfd,gdd,gspan,episodes",
    )
    ap.add_argument(
        "--val-rep", type=int, default=1600,
        help="replication factor for the validation-tier corpus (>= 4; "
             "1600 x sf0.1 = 8M docs)",
    )
    ap.add_argument(
        "--graph-n", type=int, default=8_000_000,
        help="customer-vertex count for the graph/sequence tier soak",
    )
    ap.add_argument(
        "--prefix-budget", type=int, default=100_000_000,
        help="candidate_budget for the prefix07 op (exact-join candidate "
             "estimate above which hot shingles fall back to MinHash prescreen)",
    )
    args = ap.parse_args()
    ops = set(args.ops.split(","))
    SIM_OPS = {"minhash", "audit", "prefix", "prefix07"}
    GRAM_OPS = {"spans", "delta_spans", "lines", "census", "dsir", "contam"}
    VAL_OPS = {"valfused", "sketch", "datastats", "drift"}
    GRAPH_OPS = {"gfd", "gdd", "gspan", "episodes"}

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
            # NO auto-broadcast: at soak scale AQE sees the (small-here) gram
            # count side of duplicate_spans' join-back and converts the
            # intended partitioning-reuse shuffle join into a broadcast --
            # whose driver-side build then fails for memory while 32 local
            # tasks hold the unified pool (driver==executor in local mode).
            # At the 10^12-doc design point that side is NOT broadcastable,
            # so the soak should exercise the documented shuffle-join shape
            # anyway. Explicit F.broadcast() hints (delta-prune, benchmark
            # side, banned lines) are honored regardless of the threshold.
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        },
    )
    app_id = spark.sparkContext.applicationId
    res: dict = {"rep": args.rep, "vec_n": args.vec_n, "sem_n": args.sem_n}

    from pyspark_validator.pipelines.dedup import (
        _band_explode,
        minhash_lsh_pairs,
        minhash_signatures,
        prefix_jaccard_pairs,
    )

    def _progress(key):
        print(json.dumps({key: res[key]}, default=_json_default), flush=True)

    # ---- corpus build (written to parquet so every op pays a real scan) ----
    docs = None
    if ops & SIM_OPS:
        docs_path = f"{args.work_dir}/docs.parquet"
        _, t_build = _run_op(
            spark, "build_docs",
            lambda: amplified_docs(spark, args.sf_dir, args.rep).write.parquet(docs_path),
        )
        docs = spark.read.parquet(docs_path)
        n_docs = docs.count()
        res["n_docs"] = n_docs
        res["build_docs_sec"] = t_build

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

    # planted truth for the text ops: every 20th src doc, rep/2 exact-dup pairs
    n_src = spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()
    res["planted_text_pairs"] = (n_src // 20 + (1 if n_src % 20 else 0)) * (args.rep // 2)

    # ---- 2b. prefix-Jaccard at t=0.7 under a candidate budget ------------
    # The round-3 soak showed the UNBOUNDED exact join at t=0.7 exceeds the
    # sandbox's per-node disk on this boilerplate-heavy corpus. This op
    # proves the bounded path: the census-estimated exact-candidate volume
    # breaches --prefix-budget, hot prefix shingles fall back to the MinHash
    # prescreen, cold shingles stay exact, and the planted jaccard-1.0 pairs
    # (identical MinHash signatures -> LSH recall 1.0) must ALL survive.
    if "prefix07" in ops:
        def prefix07():
            pairs_df, report = prefix_jaccard_pairs(
                docs,
                threshold=0.7,
                candidate_budget=args.prefix_budget,
                on_budget="prescreen",
                return_report=True,
            )
            pairs_df = pairs_df.persist()
            n_pairs = pairs_df.count()
            ids = F.split(F.col("id_a"), "#"), F.split(F.col("id_b"), "#")
            planted_found = pairs_df.filter(
                (ids[0][0] == ids[1][0])
                & (F.pmod(ids[0][0].cast("long"), F.lit(20)) == 0)
                & (
                    F.abs(ids[0][1].cast("long") - ids[1][1].cast("long"))
                    == F.lit(args.rep // 2)
                )
                & (F.col("jaccard") == 1.0)
            ).count()
            pairs_df.unpersist()
            return n_pairs, planted_found, report

        (n_pairs, planted_found, report), t = _run_op(spark, "prefix_jaccard_t07", prefix07)
        res["prefix_jaccard_t07"] = {
            "pairs": n_pairs, "sec": t, "threshold": 0.7,
            "candidate_budget": args.prefix_budget,
            "estimated_exact_candidates": report.get("estimated_exact_candidates"),
            "hot_df_cap": report.get("hot_df_cap"),
            "n_hot_docs": report.get("n_hot_docs"),
            "prescreen_recall_at_t": report.get("prescreen_recall_at_t"),
            "planted_found": planted_found,
            "planted_expected": res["planted_text_pairs"],
            "docs_per_sec": round(n_docs / t, 1),
        }
        _progress("prefix_jaccard_t07")

    # ================= gram/census tier (plain-replicated corpus) =========
    if ops & GRAM_OPS:
        _gram_census_tier(spark, args, ops, res, _progress)

    # ================= validation tier (realistic-text corpus) ============
    if ops & VAL_OPS:
        _validation_tier(spark, args, ops, res, _progress)

    # ================= graph + sequence tier (closed-form graph) ==========
    if ops & GRAPH_OPS:
        _graph_tier(spark, args, ops, res, _progress)

    from pyspark_validator.pipelines.similarity import (
        knn_join_lsh,
        semantic_dedup_clustered,
    )

    # ---- 3. LSH k-NN join: 10k queries vs the full vector corpus ---------
    if ops & {"knn", "sem"}:
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
    if "sem" in ops:
        sem = vecs.filter(F.col("vec_id") < args.sem_n)

        def semdedup():
            kept = semantic_dedup_clustered(
                sem, dim=64, threshold=0.95, n_lists=1024,
                sample_size=50_000, iters=4,
            ).count()
            return kept

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
    print(json.dumps(res, indent=2, default=_json_default))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2, default=_json_default)
    shutil.rmtree(args.work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
