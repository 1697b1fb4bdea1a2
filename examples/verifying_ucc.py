"""Verify a unique column combination (UCC) — the analog of the reference's
examples/basic/verifying_ucc.py, re-expressed on Spark.

Run:  python examples/verifying_ucc.py [parquet_path col1,col2]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_validator as pv

path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/lineitem.parquet"
cols = (sys.argv[2] if len(sys.argv) > 2 else "l_orderkey,l_linenumber").split(",")

spark = pv.get_spark(app_name="verify-ucc", master="local[4]", shuffle_partitions=8)
df = spark.read.parquet(path)

check = pv.ucc_check(df, cols, num_partitions=16, violation_cap=5)

# load-once / execute-many: summary first, violations only if it fails
# (the reference's early-exit pattern, fd_verifier.cpp:59-62)
summary = check.summary().collect()[0]
print(f"UCC({cols}) holds: {summary.holds}")
print(
    f"  rows={summary.n_rows} distinct={summary.n_distinct} "
    f"violating_clusters={summary.n_violating_clusters} "
    f"violating_rows={summary.n_violating_rows} aucc_error={summary.aucc_error:.6g}"
)
if not summary.holds:
    print("Top violating clusters (capped samples):")
    check.violations().orderBy("partition_id").show(10, truncate=False)

spark.stop()
