"""Integrity & distribution audit: the session-23 check families end-to-end.

Flow over the TPC-H-ish tables + the interleaved doc table:
(1) privacy — k-anonymity / l-diversity audit, then record suppression and
    re-audit (the enforce-then-verify loop);
(2) conformance — Benford first-digit gate (standalone == fused rollup),
    format-mask profile, null-pattern census, class-balance label-shift gate;
(3) dependency strength — exact association (Cramér's V / Theil's U / MI)
    next to the AFD error family it complements;
(4) temporal & cross-table — event precedence, interval overlaps,
    parent-vs-child rollup reconciliation;
(5) corpus drift — JS divergence, 1-D Wasserstein, Zipf slope, vocabulary
    turnover between snapshot slices; same-media caption consistency on the
    interleaved shape.

Run:  python examples/integrity_audit.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pyspark_validator as pv
from pyspark_validator.checks.anon import suppress_to_k
from pyspark_validator.checks.drift import (
    class_balance,
    js_divergence_drift,
    wasserstein_drift,
)
from pyspark_validator.checks.stats import (
    format_conformance,
    format_profile,
    null_pattern_census,
)
from pyspark_validator.fused import FusedPass
from pyspark_validator.pipelines.interleaved import caption_consistency_summary
from pyspark_validator.pipelines.text import vocab_drift, zipf_signals

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = pv.get_spark(
    app_name="integrity-audit", master="local[4]", shuffle_partitions=8
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry

cust = spark.read.parquet(f"{SF}/customer.parquet")
orders = spark.read.parquet(f"{SF}/orders.parquet")
li = spark.read.parquet(f"{SF}/lineitem.parquet")
ev = spark.read.parquet(f"{SF}/events.parquet")
docs = spark.read.parquet(f"{SF}/documents.parquet")

print("== 1. privacy: k-anonymity / l-diversity, then suppression ==")
cust_b = cust.withColumn("bal_bucket", F.floor(F.col("c_acctbal") / 1000.0))
audit = pv.anon_check(
    cust_b, ["c_nationkey", "c_mktsegment"], k=10, sensitive="bal_bucket", l=5
)
audit.summary().show(truncate=False)
audit.violations().orderBy("cluster_size").show(5, truncate=False)
safe = suppress_to_k(cust_b, ["c_nationkey", "c_mktsegment"], k=10)
pv.anon_check(safe, ["c_nationkey", "c_mktsegment"], k=10).summary().show()

print("== 2. conformance: Benford, formats, null patterns, class balance ==")
pv.benford_check(li, "l_extendedprice").summary().show(truncate=False)
fp = FusedPass(li, num_partitions=8, partition_key="l_orderkey").add_benford(
    "ben", "l_extendedprice"
)
print("fused per-partition verdicts:")
fp.verdict("ben").orderBy("partition_id").show(4)
print("fused global rollup (== standalone):")
fp.rollup_benford("ben").show()
fp.unpersist()
format_conformance(cust, "c_name").show(truncate=False)
format_profile(spark.read.parquet(f"{SF}/part.parquet"), "p_type", k=3).show()
ev_nullable = ev.select(
    F.when(F.col("value") > 100, None).otherwise(F.col("value")).alias("v"),
    F.when(F.col("event_type") == "view", None).otherwise(F.col("props")).alias("p"),
)
null_pattern_census(ev_nullable, ["v", "p"]).show()
class_balance(
    ev, "event_type", {k: 0.2 for k in ["click", "view", "purchase", "signup", "error"]}
).show(truncate=False)

print("== 3. dependency strength: exact association ==")
pv.assoc_check(orders, "o_orderstatus", "o_orderpriority").summary().show(
    truncate=False
)

print("== 4. temporal & cross-table integrity ==")
pv.precedence_check(
    ev, ["user_id"], "ts",
    F.col("event_type") == "click", F.col("event_type") == "purchase",
).show()
iv = orders.select(
    "o_custkey",
    F.col("o_orderdate").cast("date").alias("s"),
    F.date_add(
        F.col("o_orderdate").cast("date"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).cast("int"),
    ).alias("e"),
)
pv.interval_overlap_check(iv, ["o_custkey"], "s", "e").show()
pv.reconciliation_check(
    orders, li, ["o_orderkey"], ["l_orderkey"],
    F.col("o_totalprice"),
    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))),
    rel_tol=0.5,
).summary().show(truncate=False)

print("== 4b. row/vector anomalies ==")
oc = pv.outlier_check(ev, "value", method="iqr")
oc.summary().show()
oc.violations(["event_id"], cap=3).show()
emb = spark.read.parquet(f"{SF}/embeddings.parquet")
pv.embedding_outlier_check(emb, top_k=3).top().show()

print("== 5. corpus drift + interleaved caption consistency ==")
b = ev.filter(F.col("event_id") % 2 == 0)
c = ev.filter(F.col("event_id") % 2 == 1)
js_divergence_drift(b, c, "event_type").show()
wasserstein_drift(b, c, "value", num_bins=30, bin_edges=(0.0, 600.0)).show()
from pyspark_validator.checks.drift import embedding_dimension_drift, topk_drift
topk_drift(b, c, "event_type", k=4).show(truncate=False)
embedding_dimension_drift(
    emb.filter(F.col("vec_id") % 2 == 0), emb.filter(F.col("vec_id") % 2 == 1)
).show()
zipf_signals(docs, max_rank=200).show(truncate=False)
db = docs.filter(F.col("doc_id") % 2 == 0)
dc = docs.filter(F.col("doc_id") % 2 == 1)
vocab_drift(db, dc).show(truncate=False)
ds = entry._docs_spans(spark, SF)
caption_consistency_summary(ds).show(truncate=False)

print("integrity audit complete")
spark.stop()
