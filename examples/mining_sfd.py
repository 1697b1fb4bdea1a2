"""CORDS soft-FD / correlation mining — the analog of the reference's
mining_sfd example (examples/basic/mining_sfd.py): classify every column
pair of a table as soft-FD, correlated, or independent, after excluding
soft keys (near-unique columns) and trivial (single-valued) columns.

Composition: one wide distinct-count aggregation feeds every pair's
cardinality rule; only eligible pairs pay a contingency chi-square pass,
submitted from concurrent driver threads.

Run:  python examples/mining_sfd.py [orders_parquet]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_validator as pv
from pyspark_validator.discovery import mine_sfds

path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/orders.parquet"
spark = pv.get_spark(app_name="mine-sfd", master="local[4]", shuffle_partitions=8)
orders = spark.read.parquet(path)

out = mine_sfds(orders, max_false_positive_probability=1e-6)

print("Soft keys (near-unique, excluded):", out["soft_keys"])
print("Trivial columns (single value, excluded):", out["trivial_columns"])
print("Soft FDs (determinant -> dependent):", out["sfds"])
print("Correlations:", out["correlations"])

print("\nDrill into one pair with the verifier:")
pv.sfd_check(orders, "o_orderpriority", "o_orderstatus").summary().show(truncate=False)

spark.stop()
