"""schema.py: metadata diff, span-sequence integrity, type conformance.

North-rule surface: the engine validates the *shape* of the interleaved-doc
table (doc_id, spans array<struct<kind,text,media_ref,offset>>) before any
constraint runs, and emits violation rows (doc_id + offending span sequence).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_validator.fused import FusedPass
from pyspark_validator.runner import CheckSpec, ValidationSuite
from pyspark_validator.schema import (
    ColumnSpec,
    SchemaSpec,
    schema_check,
    schema_verdict,
    span_integrity_violations,
)

SPANS_DDL = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"

SPAN_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPAN_T),
    ]
)


def _t(text, off):
    return ("text", text, None, off)


def _m(ref, off, kind="image"):
    return (kind, None, ref, off)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("ok_1", [_t("a", 0), _m("media://image/1", 64), _t("b", 128)]),
        ("ok_empty", []),
        ("bad_kind", [_t("a", 0), ("hologram", None, "media://x", 64)]),
        ("bad_text_null", [_t(None, 0)]),
        ("bad_media_null", [("image", None, None, 0)]),
        ("bad_order", [_t("a", 64), _t("b", 0)]),
        ("bad_equal_off", [_t("a", 0), _t("b", 0)]),
        ("bad_neg", [_t("a", -1)]),
        ("bad_null_off", [_t("a", None)]),
        ("bad_null_spans", None),
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


# ---------------------------------------------------------------------------
# metadata diff


def test_schema_check_all_ok(spark, docs):
    spec = SchemaSpec(
        [
            ColumnSpec("doc_id", "string"),
            ColumnSpec("spans", SPANS_DDL),
        ]
    )
    out = schema_check(docs.schema, spec)
    assert all(d["holds"] for d in out)
    assert [d["status"] for d in out] == ["ok", "ok"]


def test_schema_check_missing_and_type_mismatch(spark, docs):
    spec = SchemaSpec(
        [
            ColumnSpec("doc_id", "bigint"),
            ColumnSpec("license", "string"),
            ColumnSpec("rev", "int", required=False),
        ]
    )
    by_col = {d["column"]: d for d in schema_check(docs.schema, spec)}
    assert by_col["doc_id"]["status"] == "type_mismatch"
    assert by_col["doc_id"]["actual"] == "string"
    assert by_col["license"]["status"] == "missing" and not by_col["license"]["holds"]
    assert by_col["rev"]["status"] == "ok"  # optional column may be absent
    assert by_col["spans"]["status"] == "extra" and by_col["spans"]["holds"]


def test_schema_check_extra_forbidden(spark, docs):
    spec = SchemaSpec([ColumnSpec("doc_id", "string")], allow_extra=False)
    by_col = {d["column"]: d for d in schema_check(docs.schema, spec)}
    assert by_col["spans"]["status"] == "extra" and not by_col["spans"]["holds"]


def test_schema_check_nullability(spark, docs):
    spec = SchemaSpec([ColumnSpec("doc_id", "string", nullable=True)])
    by_col = {d["column"]: d for d in schema_check(docs.schema, spec)}
    assert by_col["doc_id"]["status"] == "nullability"


def test_schema_contains_mode(spark, docs):
    # expected struct is a subset of the actual element struct -> ok under
    # contains, type_mismatch under exact
    sub = "array<struct<kind:string,offset:int>>"
    contains = SchemaSpec([ColumnSpec("spans", sub, match="contains")])
    exact = SchemaSpec([ColumnSpec("spans", sub)])
    assert schema_check(docs.schema, contains)[0]["status"] == "ok"
    assert schema_check(docs.schema, exact)[0]["status"] == "type_mismatch"
    # a field the actual struct lacks -> fails even under contains
    missing = SchemaSpec(
        [ColumnSpec("spans", "array<struct<checksum:string>>", match="contains")]
    )
    assert schema_check(docs.schema, missing)[0]["status"] == "type_mismatch"


def test_schema_verdict_frame(spark, docs):
    spec = SchemaSpec([ColumnSpec("doc_id", "string"), ColumnSpec("spans", SPANS_DDL)])
    v = schema_verdict(spark, docs, spec)
    assert [f.name for f in v.schema.fields] == [
        "column", "status", "expected", "actual", "holds",
    ]
    assert v.count() == 2 and v.where(~F.col("holds")).count() == 0


# ---------------------------------------------------------------------------
# span integrity: violation rows


def test_span_integrity_violations(spark, docs):
    rows = span_integrity_violations(docs).collect()
    got = {(r.doc_id, r.reason) for r in rows}
    assert got == {
        ("bad_kind", "kind"),
        ("bad_text_null", "text_null"),
        ("bad_media_null", "media_null"),
        ("bad_order", "order"),
        ("bad_equal_off", "order"),  # strictly increasing
        ("bad_neg", "order"),
        ("bad_null_off", "order"),
        ("bad_null_spans", "order"),
    }
    # offending span sequence rendered for every non-null spans row
    by_doc = {r.doc_id: r.span_seq for r in rows}
    assert by_doc["bad_order"] is not None and "text" in by_doc["bad_order"]
    assert by_doc["bad_null_spans"] is None


# ---------------------------------------------------------------------------
# fused members


def test_fused_span_integrity_and_type_conformance(spark, docs):
    df = docs.withColumn("maybe_num", F.when(F.col("doc_id") == "ok_1", "12.5").otherwise(F.col("doc_id")))
    fp = (
        FusedPass(df, num_partitions=4, partition_key="doc_id")
        .add_span_integrity("spans_ok")
        .add_type_conformance("num_ok", "maybe_num", "double")
    )
    span_v = fp.verdict("spans_ok").collect()
    assert sum(r.n_docs for r in span_v) == 10
    assert sum(r.kind_violations for r in span_v) == 1
    assert sum(r.text_null_violations for r in span_v) == 1
    assert sum(r.media_null_violations for r in span_v) == 1
    assert sum(r.order_violations for r in span_v) == 5
    assert not all(r.holds for r in span_v)

    num_v = fp.verdict("num_ok").collect()
    assert sum(r.n_checked for r in num_v) == 10
    assert sum(r.n_bad for r in num_v) == 9  # only "12.5" casts


def test_fused_span_integrity_holds_on_clean(spark):
    clean = spark.createDataFrame(
        [("d1", [_t("a", 0), _m("media://image/9", 64)]), ("d2", [])],
        DOCS_SCHEMA,
    )
    fp = FusedPass(clean, num_partitions=2, partition_key="doc_id").add_span_integrity("si")
    assert all(r.holds for r in fp.verdict("si").collect())


# ---------------------------------------------------------------------------
# runner + CLI spec route


def test_runner_schema_kind(spark, docs):
    suite = ValidationSuite(spark, docs, num_partitions=4)
    out = suite.run(
        [
            CheckSpec(
                name="shape",
                kind="schema",
                params={
                    "columns": [
                        {"name": "doc_id", "dtype": "string"},
                        {"name": "spans", "dtype": SPANS_DDL},
                        {"name": "license", "dtype": "string"},
                    ]
                },
            ),
            CheckSpec(
                name="si",
                kind="span_integrity",
                params={},
            ),
        ]
    )
    shape = {r.column: r for r in out["shape"].collect()}
    assert shape["license"].status == "missing" and not shape["license"].holds
    assert shape["doc_id"].holds and shape["spans"].holds
    si = out["si"].collect()
    assert sum(r.order_violations for r in si) == 5
    suite.unpersist()


def test_runner_schema_ignores_derived_columns(spark, docs):
    # canonicalize adds partition_id/span_seq; the schema check must validate
    # the user's input schema, not the canonical projection
    suite = ValidationSuite(spark, docs, num_partitions=4)
    out = suite.run(
        [
            CheckSpec(
                name="shape",
                kind="schema",
                params={
                    "columns": [
                        {"name": "doc_id", "dtype": "string"},
                        {"name": "spans", "dtype": SPANS_DDL},
                    ],
                    "allow_extra": False,
                },
            )
        ]
    )
    assert all(r.holds for r in out["shape"].collect())
    suite.unpersist()


# ---------------------------------------------------------------------------
# scale properties: plan shape and incremental algebra of the new members


def test_fused_schema_members_plan(spark, docs, tmp_path):
    """One parquet scan, one exchange, no Python eval: the schema-conformance
    members ride the shared fused scan like every other agg-shaped check."""
    import re

    path = str(tmp_path / "docs.parquet")
    docs.withColumn("maybe_num", F.col("doc_id")).write.parquet(path)
    df = spark.read.parquet(path)
    fp = (
        FusedPass(df, num_partitions=4, partition_key="doc_id")
        .add_span_integrity("si")
        .add_type_conformance("tc", "maybe_num", "double")
    )
    p = df._sc._jvm.PythonSQLUtils.explainString(
        fp.grouped()._jdf.queryExecution(), "formatted"
    )

    def count(node):
        return len(re.findall(rf"^\(\d+\) {node}", p, re.M))

    assert count("Scan parquet") == 1
    assert count("Exchange") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_incremental_fused_schema_members(spark, docs, tmp_path):
    """The new members' partials are pure sums, so they fold append deltas
    AND retract deletes through IncrementalFused."""
    from pyspark_validator.fused import IncrementalFused

    def fp_for(df):
        return (
            FusedPass(df, num_partitions=4, partition_key="doc_id")
            .add_span_integrity("si")
            .add_type_conformance("tc", "doc_id", "double")
        )

    base = docs.filter(~F.col("doc_id").startswith("bad_order"))
    delta = docs.filter(F.col("doc_id").startswith("bad_order"))

    inc = IncrementalFused(fp_for(base), str(tmp_path / "state"))
    inc.initialize()
    inc.apply_delta(delta)
    full = fp_for(docs)
    got = {r.partition_id: r for r in inc.verdict("si").collect()}
    want = {r.partition_id: r for r in full.verdict("si").collect()}
    assert set(got) == set(want)
    for pid, w in want.items():
        assert got[pid].asDict() == w.asDict()

    # retract the delta -> back to the base answer
    inc.apply_delta(deletes=delta)
    back = {r.partition_id: r for r in inc.verdict("si").collect()}
    base_want = {r.partition_id: r for r in fp_for(base).verdict("si").collect()}
    for pid, w in base_want.items():
        assert back[pid].asDict() == w.asDict()


def test_violations_cap_per_partition(spark):
    """max_rows_per_partition bounds the diagnostic table deterministically
    (lowest doc_ids win within each logical partition)."""
    rows = [(f"d{i:03d}", [_t(None, 0)]) for i in range(40)]  # all violate
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    capped = span_integrity_violations(
        df, max_rows_per_partition=2, num_partitions=4
    ).collect()
    assert 0 < len(capped) <= 8
    # deterministic across invocations
    again = span_integrity_violations(
        df, max_rows_per_partition=2, num_partitions=4
    ).collect()
    assert sorted(r.doc_id for r in capped) == sorted(r.doc_id for r in again)
    # uncapped reports all 40
    assert span_integrity_violations(df).count() == 40


def test_quarantine_by_integrity(spark, docs):
    from pyspark_validator.schema import quarantine_by_integrity

    clean, bad = quarantine_by_integrity(docs)
    assert {r.doc_id for r in clean.select("doc_id").collect()} == {
        "ok_1",
        "ok_empty",
    }
    assert bad.count() == 8
    # quarantined rows keep the full original schema for repair
    assert bad.columns == docs.columns
