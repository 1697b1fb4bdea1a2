"""End-to-end embedding-table pipeline: validate -> quarantine -> dedup ->
retrieval (k-NN join).

  conformance gate (null / wrong-dim / nonfinite / zero / norm band)
    -> quarantine offending vectors
    -> semantic near-duplicate removal (LSH buckets + exact cosine)
    -> k-NN join: every eval query gets its k nearest corpus vectors
       (the hard-negative-mining / retrieval-eval shape).

The conformance gate runs BEFORE any cosine op on purpose: a single NaN
vector silently poisons every dot product it touches, and a zero vector has
no defined direction — validation is what makes the similarity tier safe.

Run:  python examples/embedding_pipeline.py [embeddings_parquet]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pyspark_validator as pv
from pyspark_validator.pipelines.similarity import knn_join_brute, semantic_dedup
from pyspark_validator.schema import embedding_violations

path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/embeddings.parquet"
spark = pv.get_spark(app_name="embeddings", master="local[4]", shuffle_partitions=8)
emb = spark.read.parquet(path).select("vec_id", "embedding")
DIM = 64

# corrupt a few rows so the gate has something to catch (the sandbox table is
# clean): one NaN vector, one truncated vector, one zero vector
corrupted = (
    emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") == 11,
            F.transform("embedding", lambda x: F.lit(float("nan")).cast("float")),
        )
        .when(F.col("vec_id") == 22, F.slice("embedding", 1, DIM - 1))
        .when(
            F.col("vec_id") == 33,
            F.transform("embedding", lambda x: F.lit(0.0).cast("float")),
        )
        .otherwise(F.col("embedding")),
    )
)

# 1. conformance: one-row summary (ONE map-side-combinable agg) + violation rows
summary = pv.embedding_conformance(
    corrupted, dim=DIM, norm_lo=0.5, norm_hi=2.0
).collect()[0]
print("conformance:", summary.asDict())
assert summary.n_nonfinite == 1 and summary.n_bad_dim == 1 and summary.n_zero_vec == 1

bad = embedding_violations(corrupted, dim=DIM, norm_lo=0.5, norm_hi=2.0)
reasons = {r.vec_id: r.reason for r in bad.collect()}
print("violations:", reasons)
assert reasons == {11: "nonfinite", 22: "bad_dim", 33: "zero_vector"}

# 2. quarantine: anti-join the (small) violation id set
clean = corrupted.join(F.broadcast(bad.select("vec_id")), "vec_id", "left_anti")
n_clean = clean.count()
print(f"clean vectors: {n_clean}")

# 3. semantic near-duplicate removal over the validated vectors
deduped = semantic_dedup(clean, dim=DIM, threshold=0.99, num_bits=8)
print(f"after semantic dedup: {deduped.count()}")

# 4. retrieval: every 50th vector is an eval query; 3 nearest corpus
# neighbors each (self excluded)
queries = deduped.filter(F.col("vec_id") % 50 == 0)
nn = knn_join_brute(queries, deduped, k=3, exclude_self=True)
rows = nn.orderBy("qid", "rank").collect()
n_queries = queries.count()
assert len(rows) == 3 * n_queries
print(f"k-NN join: {n_queries} queries x 3 neighbors")
for r in rows[:6]:
    print(f"  q={r.qid:>4}  nn{r.rank}={r.id:>4}  cosine={r.cosine:.4f}")

print("OK")
spark.stop()
