"""End-to-end training-data curation over a documents table:

  quality gate (heuristic + unigram-LM perplexity tail cut) -> exact dedup
  + containment (quotation) dedup -> benchmark decontamination (four-tier
  ladder: exact 8-gram, PaLM-style coverage fraction, fuzzy shingle-Jaccard,
  semantic embedding-cosine) -> per-source mixture sampling -> deterministic
  train/val/test split -> concat-and-chunk sequence packing + sliding-window
  chunking.

Every stage is built from the operators in pipelines/ (all JVM exprs or
broadcast joins; the only shuffle in the whole pipeline below is the packing
window's bin exchange and dedup's content-hash groupBy).

Run:  python examples/curation_pipeline.py [documents_parquet]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pyspark_validator as pv
from pyspark_validator.pipelines.curation import (
    decontaminate,
    hash_split,
    mixture_sample,
    pack_sequences,
    pack_summary,
)
from pyspark_validator.pipelines.dedup import dedup_exact
from pyspark_validator.pipelines.text import quality_score

path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
spark = pv.get_spark(app_name="curation", master="local[4]", shuffle_partitions=8)
docs = spark.read.parquet(path)
n0 = docs.count()

# 1. quality gate (stateless per-row exprs)
gated = quality_score(docs).where(F.col("quality") >= 0.2).drop("quality")
n1 = gated.count()

# 1b. perplexity-style gate: self-trained unigram LM, drop the nll tail
# (wrong-language / junk docs sit far from the corpus distribution)
from pyspark_validator.pipelines.text import lm_quality

nll = lm_quality(docs, vocab_size=2000).select("doc_id", "nll")
cut = nll.agg(
    F.percentile_approx("nll", 0.98, 10_000).alias("c")
).collect()[0]["c"]
gated = gated.join(nll, "doc_id").where(F.col("nll") <= cut).drop("nll")
n1b = gated.count()

# 2. exact dedup on the normalized-content hash
deduped = dedup_exact(gated)
n2 = deduped.count()

# 2b. containment tier: short docs quoted verbatim inside longer kept docs
# (overlap coefficient; symmetric Jaccard provably misses these)
from pyspark_validator.pipelines.dedup import containment_pairs

quoted = containment_pairs(deduped, k=3, threshold=0.95).select(
    F.least("id_a", "id_b").alias("doc_id")  # drop the smaller id of each pair
).distinct()
deduped = deduped.join(quoted, "doc_id", "left_anti")
n2b = deduped.count()

# 3. decontamination: treat every 37th doc as the "benchmark suite"
bench = docs.where(F.col("doc_id") % 37 == 0).select("doc_id", "text")
clean = (
    decontaminate(deduped.where(F.col("doc_id") % 37 != 0), bench, n=8)
    .where(~F.col("contaminated"))
    .drop("n_contaminated_grams", "contaminated")
)
n3 = clean.count()

# 3a'. coverage-fraction tier (PaLM-style): a doc is contaminated when it
# covers >= 50% of a benchmark ITEM's distinct 8-grams — attribution the
# any-overlap gate can't give
from pyspark_validator.pipelines.curation import contamination_fraction

cf = contamination_fraction(clean, bench, n=8, min_frac=0.5)
clean = clean.join(cf.select("doc_id").distinct(), "doc_id", "left_anti")
n3a = clean.count()

# 3b. fuzzy tier: near-copies that share few exact 8-grams but keep a high
# shingle Jaccard (prefix-filtered exact similarity join under the hood)
from pyspark_validator.pipelines.curation import decontaminate_fuzzy

clean = (
    decontaminate_fuzzy(clean, bench, k=3, threshold=0.8)
    .where(~F.col("contaminated"))
    .drop("n_benchmark_matches", "max_benchmark_jaccard", "contaminated")
)
n3b = clean.count()

# 3c. semantic tier: paraphrases sharing no surface n-grams at all — LSH-
# bucketed embedding cosine vs a (tiny, broadcast) benchmark embedding set
from pyspark_validator.pipelines.curation import semantic_decontaminate

emb_path = os.path.join(os.path.dirname(path), "embeddings.parquet")
if os.path.exists(emb_path):
    emb = spark.read.parquet(emb_path).select("vec_id", "embedding")
    bench_emb = emb.where(F.col("vec_id") % 25 == 0)
    kept_vecs = semantic_decontaminate(
        emb, bench_emb, dim=64, threshold=0.95, num_bits=8, probes=1
    )
    print("semantic tier (embedding table):", emb.count(), "->", kept_vecs.count())

# 4. mixture: keep all of src0, half of everything else
mixed = mixture_sample(clean, {"src0": 1.0}, default_rate=0.5, salt="mix-v1")
n4 = mixed.count()

# 5. deterministic split (stable under re-runs and engine changes)
split = hash_split(mixed, fractions={"test": 0.05, "val": 0.05, "train": 0.90})
print("funnel:", {"raw": n0, "quality": n1, "lm": n1b, "dedup": n2,
                  "containment": n2b, "decontam": n3, "coverage": n3a,
                  "fuzzy": n3b, "mixture": n4})
split.groupBy("split").count().orderBy("split").show()

# 6. pack the train split into 2048-token sequences across 8 bins
train = split.where(F.col("split") == "train")
packed = pack_sequences(train, chunk_tokens=2048, num_bins=8)
print("packed chunks per bin:")
pack_summary(packed).groupBy("pack_bin").agg(
    F.countDistinct("chunk_id").alias("n_chunks"),
    F.sum("n_tokens").alias("n_tokens"),
).orderBy("pack_bin").show()

# 7. sliding-window chunking of the longest documents (fixed-context prep,
# zero-shuffle) — the per-document alternative to concat-and-chunk packing
from pyspark_validator.pipelines.curation import chunk_documents

long_docs = train.where(F.length("text") > 400)
chunks = chunk_documents(long_docs, chunk_tokens=64, overlap=8)
print("sliding-window chunks over", long_docs.count(), "long docs:",
      chunks.count())
spark.stop()
