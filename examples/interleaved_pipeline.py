"""End-to-end triage of an INTERLEAVED text+media corpus (the north-rule
input shape: doc_id + spans array<struct<kind,text,media_ref,offset>>):

  1. span-integrity quarantine (schema tier)
  2. structural profile: span-kind transition census + media-object reuse
  3. flatten text spans -> plain text (the bridge to the text tier)
  4. exact dedup of the flattened view, Bloom-gated against a standing corpus
  5. BM25 keyword retrieval + RRF fusion with a second ranked list

Every stage is zero-shuffle per-row exprs, one bounded groupBy, or a
broadcast-gated join; nothing here materializes an unbounded pair space.

Run:  python examples/interleaved_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pyspark_validator as pv
from pyspark_validator.pipelines.bloom import (
    bloom_array,
    bloom_words,
    content_hash_index,
    delta_new_rows,
)
from pyspark_validator.pipelines.interleaved import (
    media_reuse_summary,
    span_kind_transitions,
    spans_to_text,
)
from pyspark_validator.pipelines.retrieval import bm25_topk, rrf_fuse, with_rank
from pyspark_validator.schema import quarantine_by_integrity

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = pv.get_spark(app_name="interleaved-pipeline", master="local[4]", shuffle_partitions=8)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry  # the deterministic interleaved view builder

docs = entry._docs_spans(spark, sf_dir)
print(f"interleaved docs: {docs.count()}")

# -- 1. schema tier: quarantine docs whose span sequence breaks the contract
clean, quarantined = quarantine_by_integrity(docs)
print(f"clean: {clean.count()}  quarantined: {quarantined.count()}")

# -- 2. structural profile
print("span-kind transition census:")
for r in span_kind_transitions(clean).orderBy("src", "dst").collect():
    print(f"  {r['src']:>6} -> {r['dst']:<6} {r['n_transitions']}")
print("media reuse:", media_reuse_summary(clean).collect()[0].asDict())

# -- 3. flatten to the text tier
flat = spans_to_text(clean).select("doc_id", "text")

# -- 4. exact dedup, Bloom-gated against a standing corpus (here: the even
#    half plays the standing corpus, the odd half the incoming delta)
corpus = flat.filter(F.crc32("doc_id") % 2 == 0)
delta = flat.filter(F.crc32("doc_id") % 2 == 1)
idx = content_hash_index(corpus).persist()
m, k = 1 << 20, 7
arr = bloom_array(bloom_words(idx, num_bits=m, num_hashes=k), m)
new = delta_new_rows(delta, idx, bloom=arr, num_bits=m, num_hashes=k)
print(f"delta: {delta.count()}  new after Bloom-gated exact dedup: {new.count()}")

# -- 5. retrieval over the flattened corpus: BM25 + RRF hybrid
q1 = with_rank(
    bm25_topk(flat.dropDuplicates(["doc_id"]), ["spark", "merge"], k=10), "score"
)
q2 = with_rank(
    bm25_topk(flat.dropDuplicates(["doc_id"]), ["vector", "batch"], k=10), "score"
)
fused = rrf_fuse([q1, q2], k=60, topk=5)
print("hybrid top-5:")
for r in fused.collect():
    print(f"  {r['id']}  rrf={r['rrf']:.6f}  lists={r['n_lists']}")

spark.stop()
print("interleaved pipeline done")

# -- appendix: the remaining interleaved-native tiers, driven end-to-end ----
spark2 = pv.get_spark(app_name="interleaved-pipeline-2", master="local[4]", shuffle_partitions=8)
docs2 = entry._docs_spans(spark2, sf_dir)
from pyspark_validator.checks.drift import embedding_centroid_drift
from pyspark_validator.pipelines.interleaved import (
    dedup_boilerplate_spans,
    span_structure_drift,
)

did = F.substring("doc_id", 5, 12).cast("long")
sd = span_structure_drift(docs2.filter(did % 2 == 0), docs2.filter(did % 2 == 1))
print("structure drift (even vs odd):", sd.collect()[0].asDict())

cleaned = dedup_boilerplate_spans(docs2.filter(did % 100 != 0), min_docs=3)
print(
    "boilerplate-span dedup:",
    cleaned.agg(
        F.sum("n_spans").alias("spans"), F.sum("n_removed_spans").alias("removed")
    ).collect()[0].asDict(),
)

from pyspark_validator.pipelines.curation import chunk_manifest
from pyspark_validator.pipelines.interleaved import (
    layout_clusters,
    pack_interleaved,
    span_token_costs,
)

lc = layout_clusters(docs2, min_cluster=2)
print(
    "layout (template) dedup:",
    lc.agg(
        F.count(F.lit(1)).alias("clusters"), F.sum("cluster_size").alias("docs")
    ).collect()[0].asDict(),
)

uniq = docs2.filter(did % 100 != 0)  # unique doc_id keys for packing
packed = pack_interleaved(
    uniq, chunk_tokens=2048, media_token_cost=256, num_bins=8,
    bin_col=did % 8,
)
costs = span_token_costs(uniq).agg(
    F.sum("n_text_tokens").alias("text_tokens"),
    F.sum("n_media_spans").alias("media_spans"),
)
print("multimodal token budget:", costs.collect()[0].asDict())
man = chunk_manifest(packed, chunk_tokens=2048)
print(
    "loader manifest:",
    man.agg(
        F.count(F.lit(1)).alias("slices"),
        F.count_distinct("pack_bin", "chunk_id").alias("chunks"),
    ).collect()[0].asDict(),
)

from pyspark_validator.pipelines.interleaved import (
    caption_pairs,
    interleaved_quality_gate,
    layout_drift,
    media_context_summary,
)

print("caption adjacency:", media_context_summary(docs2).collect()[0].asDict())
pairs = caption_pairs(docs2)
print("image-text pairs extracted:", pairs.count(),
      "(after-side:", pairs.filter(F.col("caption_side") == "after").count(), ")")
gated = interleaved_quality_gate(docs2, max_media=8, min_text_tokens=4)
print(
    "quality gate:",
    gated.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.sum(F.col("flag_low_text").cast("long")).alias("low_text"),
    ).collect()[0].asDict(),
)
ld = layout_drift(docs2.filter(did % 2 == 0), docs2.filter(did % 2 == 1))
print("layout drift (even vs odd):", ld.collect()[0].asDict())

from pyspark_validator.pipelines.interleaved import (
    media_census_drift,
    media_context_census,
    media_context_rollup,
    normalize_interleaved,
    spans_to_text,
)

md = media_census_drift(docs2.filter(did % 2 == 0), docs2.filter(did % 2 == 1))
print("media census drift (even vs odd):", md.collect()[0].asDict())
census = media_context_rollup(
    media_context_census(docs2.withColumn("shard", did % 3), ["shard"])
)
print("per-shard caption census:")
for r in census.orderBy("shard").collect():
    print("  ", r.asDict())
norm = normalize_interleaved(docs2)
print(
    "normalize:",
    norm.agg(
        F.sum("n_dropped_spans").alias("dropped"),
        F.sum("n_merged_spans").alias("merged"),
    ).collect()[0].asDict(),
)
tok_flat = spans_to_text(docs2, media_sentinel="<image>")
print("sentinel flatten sample:", tok_flat.select("text").first()["text"][:80])

emb = spark2.read.parquet(f"{sf_dir}/embeddings.parquet")
cd = embedding_centroid_drift(
    emb.filter(F.col("vec_id") % 2 == 0), emb.filter(F.col("vec_id") % 2 == 1)
)
print("embedding centroid drift:", cd.collect()[0].asDict())
spark2.stop()
print("appendix done")
