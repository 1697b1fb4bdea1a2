"""Schema gate before constraints, violation rows, and snapshot-over-snapshot
metric monitoring — the "schema" half of the schema + constraint engine.

Flow: (1) metadata-only StructType diff refuses a mis-shaped table before any
scan; (2) span-sequence integrity + type conformance ride ONE fused scan;
(3) violation rows carry (doc_id, reason, canonical span_seq); (4) verdict
metrics recorded per snapshot become regression alarms on the next snapshot.

Run:  python examples/schema_gate.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pyspark_validator as pv
from pyspark_validator.checkpoint import CheckpointManager
from pyspark_validator.fused import FusedPass
from pyspark_validator.schema import ColumnSpec, SchemaSpec

spark = pv.get_spark(app_name="schema-gate", master="local[4]", shuffle_partitions=8)
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry

docs = entry._docs_spans(spark, "/root/testdata/sf0.001")

# 1. gate on shape -- no scan happens here
spec = SchemaSpec(
    [
        ColumnSpec("doc_id", "string"),
        ColumnSpec(
            "spans",
            "array<struct<kind:string,text:string,media_ref:string,offset:int>>",
            match="contains",  # tolerate evolved media-metadata fields
        ),
    ]
)
verdict = pv.schema_verdict(spark, docs, spec)
verdict.show(truncate=False)
assert verdict.where(~F.col("holds")).count() == 0, "table shape rejected"

# 2. data-level conformance in one fused scan (plus corruption to catch)
bad = F.transform(
    "spans",
    lambda x, i: F.when(
        i == 0,
        F.struct(
            x["kind"].alias("kind"),
            F.when(F.xxhash64("doc_id") % 20 == 0, F.lit(None).cast("string"))
            .otherwise(x["text"])
            .alias("text"),
            x["media_ref"].alias("media_ref"),
            x["offset"].alias("offset"),
        ),
    ).otherwise(x),
)
corrupted = docs.select("doc_id", bad.alias("spans"))
fp = (
    FusedPass(corrupted, num_partitions=16, partition_key="doc_id")
    .add_span_integrity("spans_ok")
    .add_type_conformance("id_shape", "doc_id", "string")
)
fp.verdict("spans_ok").orderBy("partition_id").show(8)

# 3. violation rows: doc_id + reason + offending span sequence
pv.span_integrity_violations(corrupted).show(5, truncate=60)

# 4. record per-snapshot metrics; alarm on the regression
ck = CheckpointManager(spark, tempfile.mkdtemp(prefix="gate_ckpt_") + "/m")
clean_fp = FusedPass(docs, num_partitions=16, partition_key="doc_id").add_span_integrity("spans_ok")
ck.record_verdicts("spans_ok", "snap-1", clean_fp.verdict("spans_ok"))
ck.record_verdicts("spans_ok", "snap-2", fp.verdict("spans_ok"))
ck.metric_regressions(
    "spans_ok", "text_null_violations", "snap-1", "snap-2", min_abs_change=0.5
).where(F.col("regressed")).show()

spark.stop()
