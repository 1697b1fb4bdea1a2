"""Continuous validation over a document stream — the dynamic-verifier loop
(reference: DynamicFDVerifier) lifted onto Structured Streaming.

Each micro-batch of arriving docs is merged into the incremental UCC state;
per-batch verdicts for the touched partitions stream out, and the final state
answers global verdicts at any time. Uses a file source + availableNow trigger
so the demo is self-contained; swap in Kafka/rate sources unchanged.

Run:  python examples/streaming_validation.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pyspark_validator as pv
from pyspark_validator.incremental import IncrementalUCC
from pyspark_validator.streaming import attach_incremental, streaming_violation_counts

spark = pv.get_spark(app_name="stream-validate", master="local[4]", shuffle_partitions=8)

src = tempfile.mkdtemp(prefix="stream_src_")
state = tempfile.mkdtemp(prefix="stream_state_")
ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")

# batch 1: clean docs; batch 2: re-sends doc_0007 (a duplicate) + new docs
spark.createDataFrame(
    [(f"doc_{i:04d}",) for i in range(100)], ["doc_id"]
).write.parquet(os.path.join(src, "b0.parquet"))
spark.createDataFrame(
    [("doc_0007",), ("doc_0100",), ("doc_0101",)], ["doc_id"]
).write.parquet(os.path.join(src, "b1.parquet"))

stream = spark.readStream.schema("doc_id string").parquet(src + "/*")
engine = IncrementalUCC(spark, state, ["doc_id"], num_partitions=16)

def on_batch(verdicts, batch_id):
    bad = verdicts.filter(~F.col("holds")).count()
    print(f"batch {batch_id}: {verdicts.count()} partitions touched, {bad} violated")

q = (
    attach_incremental(stream, engine, ckpt, on_batch_verdicts=on_batch)
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(300)

total = engine.verdicts().agg(
    F.sum("n_rows").alias("rows"), F.sum("n_violating_clusters").alias("viol")
).collect()[0]
print(f"final state: {total.rows} docs validated, {total.viol} duplicate cluster(s)")
print("violating partitions:")
engine.verdicts().filter(~F.col("holds")).show()

spark.stop()
