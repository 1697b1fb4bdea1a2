"""One-stop table profiling with the discovery tier -- the reference's primary
interactive use case ("what structure does this table have?") re-expressed
Spark-first.

Runs, over the sf0.001 orders/customer/nation tables:
  1. minimal exact FDs to lattice depth 2   (mine_fds; TANE analog)
  2. approximate FDs under a g1 budget       (mine_afds; TANE-with-error)
  3. minimal UCCs of arity <= 2              (mine_uccs; HyUCC analog)
  4. CORDS soft-FD / correlation screen      (mine_sfds)
  5. cross-table inclusion dependencies      (mine_unary_inds exact /
                                              mine_ainds with error; Spider/Mind)

Total Spark work: two grouping-sets jobs per FD/AFD lattice, one job for
UCCs, one inverted-domain shuffle for ALL IND pairs, and the CORDS
contingency passes only on eligible pairs.

Run: python examples/profile_table.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark_validator as pv

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = pv.get_spark(master="local[8]", shuffle_partitions=16)

orders = spark.read.parquet(f"{SF}/orders.parquet")
customer = spark.read.parquet(f"{SF}/customer.parquet")
nation = spark.read.parquet(f"{SF}/nation.parquet")

cols = ["o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority", "o_totalprice"]

print("== minimal exact FDs (|LHS| <= 2) ==")
for lhs, rhs in pv.mine_fds(orders, cols):
    print(f"  {list(lhs) or '{}'} -> {rhs}")

print("== approximate FDs, g1 <= 1e-4 ==")
for lhs, rhs, g1 in pv.mine_afds(orders, cols, max_error=1e-4):
    print(f"  {list(lhs) or '{}'} -> {rhs}   g1={g1:.2e}")

print("== minimal UCCs (arity <= 2) ==")
for ucc in pv.mine_uccs(orders, cols):
    print(f"  {list(ucc)}")

print("== CORDS screen (soft keys / SFDs / correlations) ==")
cords = pv.mine_sfds(orders, ["o_orderstatus", "o_orderpriority", "o_orderdate"])
for k, v in cords.items():
    print(f"  {k}: {v}")

print("== cross-table INDs (exact, Spider) ==")
tables = {
    "orders": orders.select("o_custkey"),
    "customer": customer.select("c_custkey", "c_nationkey"),
    "nation": nation.select("n_nationkey"),
}
for a, b in pv.mine_unary_inds(tables):
    print(f"  {a} ⊆ {b}")

print("== cross-table AINDs (Mind, error <= 0.5) ==")
for a, b, e in pv.mine_ainds(tables, max_error=0.5):
    print(f"  {a} ⊆ {b}   error={e:.3f}")

spark.stop()
