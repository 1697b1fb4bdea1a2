"""Fused single-scan validation — the 100 TB pattern.

At trillion-row scale the table scan IS the cost: k checks run as k jobs read
the data k times. Every aggregation-shaped check (NAR rules, AC validation
against standing ranges, row predicates, completeness, numeric profiles,
fixed-bin drift) can instead contribute expressions to ONE
groupBy(partition_id).agg(...) — one scan, one shuffle whose payload is P
rows regardless of table size (pyspark_validator/fused.py).

Composition shown here: DISCOVER the AC ranges once (checks/ac.py, its own
clustering job — typically on yesterday's snapshot), then validate today's
data against the standing ranges inside the fused pass.

Run:  python examples/fused_suite.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_validator as pv
from pyspark_validator.fused import FusedPass

spark = pv.get_spark(app_name="fused-suite", master="local[4]", shuffle_partitions=8)

li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

# phase 1 (discovery, separate job): mine the algebraic ranges of price/qty
ranges = pv.ac_check(li, "l_extendedprice", "l_quantity", "/", weight=0.05).ranges_list()
print(f"discovered {len(ranges)} AC range(s) for l_extendedprice / l_quantity")

# phase 2 (validation, ONE scan for all five checks)
fp = (
    FusedPass(li, num_partitions=16, partition_key="l_orderkey")
    .add_ac("price_per_qty", "l_extendedprice", "l_quantity", "/", ranges=ranges)
    .add_nar(
        "discount_band",
        ante={"l_quantity": (1.0, 50.0)},
        cons={"l_discount": (0.0, 0.11)},
    )
    .add_row_predicate("flags_valid", {"l_returnflag": ["A", "N", "R"]})
    .add_completeness("shipdate_nonnull", "l_shipdate")
    .add_numeric_profile("price_profile", "l_extendedprice")
    .add_distinct("pk_uniqueness", ["l_orderkey", "l_linenumber"], min_ratio=0.99)
)

for name, verdict in fp.verdicts().items():
    rows = verdict.collect()
    ok = sum(1 for r in rows if r.holds)
    print(f"{name}: {ok}/{len(rows)} partitions pass")

print("\nGlobal NAR qualities (identical to nar_check().qualities()):")
fp.rollup_nar("discount_band").show()

print("Global distinct estimate (P partition sketches unioned):")
fp.rollup_distinct("pk_uniqueness").show()

print("The whole suite above was ONE scan + ONE 16-row shuffle:")
fp.grouped().explain(mode="simple")
fp.unpersist()

# -- interleaved-shape members: the same one-scan pass over the doc table ---
import importlib.util

spec = importlib.util.spec_from_file_location("entry", "__spark_entry__.py")
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)
docs = entry._docs_spans(spark, "/root/testdata/sf0.001")
fp2 = (
    FusedPass(docs, num_partitions=8, partition_key="doc_id")
    .add_span_integrity("spans_ok")
    .add_token_budget("tokens", media_token_cost=256)
    .add_media_context("captions", min_caption_ratio=0.5)
    .add_interleaved_quality("quality", max_media=8, min_text_tokens=2,
                             max_flagged_fraction=0.05)
)
for name, verdict in fp2.verdicts().items():
    rows = verdict.collect()
    ok = sum(1 for r in rows if r.holds)
    print(f"{name}: {ok}/{len(rows)} partitions pass")
fp2.unpersist()
spark.stop()
