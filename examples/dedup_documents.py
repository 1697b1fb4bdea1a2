"""Training-data dedup pipeline: exact -> MinHash-LSH near-dup -> SimHash,
over a documents table (doc_id, text).

Run:  python examples/dedup_documents.py [documents_parquet]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_validator as pv
from pyspark_validator.pipelines.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    simhash_pairs,
)

path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
spark = pv.get_spark(app_name="dedup-docs", master="local[4]", shuffle_partitions=8)
docs = spark.read.parquet(path)

print("Exact duplicate clusters (normalized content hash):")
exact_duplicates(docs).show(5, truncate=60)

print("Near-duplicate pairs (MinHash 64 perms, 16 bands, exact-verified @0.8):")
minhash_lsh_pairs(docs, threshold=0.8).show(5)

print("SimHash pairs within hamming distance 3:")
simhash_pairs(docs, max_hamming=3).show(5)

kept = dedup_exact(docs)
print(f"dedup_exact: {docs.count()} rows -> {kept.count()} kept")
spark.stop()
