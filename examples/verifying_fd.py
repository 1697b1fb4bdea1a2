"""Verify a functional dependency + its AFD error measures — the analog of the
reference's examples/basic/verifying_fd.py + verifying_afd.py.

Run:  python examples/verifying_fd.py [parquet_path lhs_cols rhs_cols]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_validator as pv

path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/orders.parquet"
lhs = (sys.argv[2] if len(sys.argv) > 2 else "o_custkey").split(",")
rhs = (sys.argv[3] if len(sys.argv) > 3 else "o_orderpriority").split(",")

spark = pv.get_spark(app_name="verify-fd", master="local[4]", shuffle_partitions=8)
df = spark.read.parquet(path)

check = pv.fd_check(df, lhs, rhs, num_partitions=16, highlight_cap=5)
s = check.summary().collect()[0]
print(f"FD {lhs} -> {rhs} holds: {s.holds}   g1_error={s.g1_error:.6g}")
print(f"  error clusters={s.n_error_clusters} error rows={s.n_error_rows}")

if not s.holds:
    print("Highlights (most-skewed violating clusters first):")
    check.highlights().show(truncate=False)

print("AFD measures (afd_measures.cpp formulas):")
check.afd_measures().show(truncate=False)
print("PFD per-tuple / per-value:")
check.pfd("per_tuple").show()
check.pfd("per_value").show()

spark.stop()
