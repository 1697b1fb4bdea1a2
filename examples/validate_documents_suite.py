"""End-to-end interleaved-document validation suite with checkpoint/resume —
the north-rule workflow: canonicalize spans, run UCC + FD + drift checks with
per-partition verdicts, record lineage, resume after a kill.

Run:  python examples/validate_documents_suite.py [docs_parquet checkpoint_dir]
The docs table must have (doc_id string, spans array<struct<kind,text,media_ref,offset>>).
"""

import tempfile

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pyspark_validator as pv
from pyspark_validator.runner import CheckSpec, ValidationSuite

spark = pv.get_spark(app_name="validate-docs", master="local[4]", shuffle_partitions=8)

if len(sys.argv) > 1:
    docs = spark.read.parquet(sys.argv[1])
else:  # derive the demo interleaved table from the driver testdata
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    docs = entry._docs_spans(spark, "/root/testdata/sf0.001")
ckpt = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="val_ckpt_")

suite = ValidationSuite(spark, docs, num_partitions=32, checkpoint_path=ckpt)
results = suite.run(
    [
        CheckSpec(name="ucc_doc_id", kind="ucc", params={"columns": ["doc_id"]}),
        CheckSpec(
            name="fd_doc_spans",
            kind="fd",
            params={"lhs": ["doc_id"], "rhs": ["span_seq"]},
        ),
    ]
)
for name, verdicts in results.items():
    bad = verdicts.filter(~F.col("holds")).count()
    print(f"{name}: {verdicts.count()} partitions validated, {bad} violated")

# Re-running the same suite resumes: everything is already in the manifest.
again = suite.run([CheckSpec(name="ucc_doc_id", kind="ucc", params={"columns": ["doc_id"]})])
print(f"resume: {again['ucc_doc_id'].count()} partitions recomputed (expected 0)")
print(f"manifest at {ckpt}")
suite.unpersist()
spark.stop()
