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
        # round-2 kinds: per-partition AC exceptions, NAR rule quality, SFD
        CheckSpec(
            name="ac_span_key_self",
            kind="ac",
            params={"lhs": "span_key", "rhs": "span_key", "binop": "-",
                    "ranges": [(0.0, 0.0)]},
        ),
        CheckSpec(
            name="nar_span_key_total",
            kind="nar",
            params={"ante": {"span_key": (-(2 ** 63), 2 ** 63 - 1)},
                    "cons": {"span_key": (-(2 ** 63), 2 ** 63 - 1)}},
        ),
        # span counts are strongly associated (every text span is a span):
        # the CORDS contingency test must flag the pair as correlated. A
        # span_key -> span_seq spec would NOT be an SFD here: near-unique
        # determinants are soft KEYS, which CORDS excludes by design.
        CheckSpec(
            name="sfd_span_counts_correlated",
            kind="sfd",
            params={"col_a": "n_spans", "col_b": "n_text_spans",
                    "expect": "correlated"},
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
