"""Matching-dependency verification — the analog of the reference's
verify_md example: "records whose names are similar must agree on region",
with the engine suggesting the true RHS boundary when the MD fails.

Composition: md_check with a levenshtein LHS classifier (length-band blocked,
no quadratic pair space) and an equality RHS; highlights list the ordered
record pairs that satisfy the LHS but break the RHS, and suggestion() lowers
the RHS boundary to the largest value at which the MD would hold.

Run:  python examples/verifying_md.py [nation_parquet]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_validator as pv
from pyspark_validator.checks.md import ColumnMatch, md_check

path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/nation.parquet"
spark = pv.get_spark(app_name="verify-md", master="local[4]", shuffle_partitions=8)
nation = spark.read.parquet(path)

md = md_check(
    nation,
    lhs=[ColumnMatch("levenshtein", "n_name", "n_name", 0.4)],
    rhs=ColumnMatch("equality", "n_regionkey", "n_regionkey", 1.0),
    left_id="n_nationkey",
)

print("MD levenshtein(n_name) >= 0.4 -> equality(n_regionkey):")
md.summary().show(truncate=False)

print("Violating pairs (similar names, different regions):")
md.highlights().show(10, truncate=False)

print("Suggested MD (true RHS boundary):", md.suggestion())

spark.stop()
