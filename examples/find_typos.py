"""Typo-finding scenario — the analog of the reference's expert demo
("Typo miner": mine almost-FDs, inspect violating clusters whose RHS values are
near-identical strings; those are likely typos).

Composition: fd_check highlights (clusters breaking X -> Y) + a within-cluster
Levenshtein screen: clusters whose distinct RHS values sit within a small edit
distance are flagged as probable typos rather than genuine alternatives.

Run:  python examples/find_typos.py  (synthesizes a demo table with planted typos)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pyspark_validator as pv

spark = pv.get_spark(app_name="find-typos", master="local[4]", shuffle_partitions=8)

# demo data: city -> zip should hold; two typo'd zips planted
rows = (
    [("springfield", "62701")] * 40
    + [("springfield", "627O1")] * 2      # letter O for zero: a typo
    + [("portland", "97201")] * 30
    + [("portland", "97201 ")] * 1        # trailing whitespace typo
    + [("salem", "97301")] * 20
    + [("salem", "10001")] * 15           # genuinely different value, NOT a typo
)
df = spark.createDataFrame(rows, ["city", "zip"])

check = pv.fd_check(df, ["city"], ["zip"], num_partitions=8)
summary = check.summary().collect()[0]
print(f"FD city -> zip holds: {summary.holds}  (g1 error {summary.g1_error:.4f})")

# violating clusters with their distinct RHS values
viol = (
    df.join(
        check.highlights().select("city"),
        on="city",
        how="left_semi",
    )
    .groupBy("city")
    .agg(F.collect_set("zip").alias("zips"))
)

# typo screen: max pairwise Levenshtein among the cluster's values <= 2
pairs = (
    viol.select("city", F.explode("zips").alias("a"))
    .alias("l")
    .join(
        viol.select("city", F.explode("zips").alias("b")).alias("r"),
        on=(F.col("l.city") == F.col("r.city")) & (F.col("l.a") < F.col("r.b")),
    )
    .select(
        F.col("l.city").alias("city"),
        "a",
        "b",
        F.levenshtein("a", "b").alias("dist"),
    )
)
verdict = pairs.groupBy("city").agg(
    F.max("dist").alias("max_dist"),
    F.collect_list(F.struct("a", "b", "dist")).alias("pairs"),
)
print("\nViolating clusters classified:")
for r in verdict.collect():
    kind = "LIKELY TYPO" if r.max_dist <= 2 else "genuine alternatives"
    print(f"  {r.city}: {kind}  (max pairwise edit distance {r.max_dist})")
    for p in r.pairs:
        print(f"      {p.a!r} vs {p.b!r} -> distance {p.dist}")

spark.stop()
