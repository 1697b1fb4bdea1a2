"""Schema validation: declared table shape vs actual, plus data-level conformance.

The north rule names this engine a *schema + constraint* validation engine over
interleaved text+media documents ``(doc_id: string, spans: array<struct<kind,
text, media_ref, offset>>)``. The reference's analog is its typed table model:
every loaded column carries a declared/inferred type
(``model/table/typed_column_data.h:181-251`` decides a column's type from its
values; ``parser/csv_parser.cpp`` fixes the ingest conventions that ``io.py``
mirrors). A validation engine must be able to say *the table itself is the
wrong shape* before any constraint runs — and to do so at three very different
costs:

1. :func:`schema_check` / :func:`schema_verdict` — **metadata only, no scan**:
   expected vs actual ``StructType``, exact or ``contains`` (structural
   subset) matching for nested types. O(columns), runs on the driver.
2. **Type conformance** — one aggregation-shaped pass: values claimed castable
   to a type must ``try_cast`` cleanly.  Lives in
   ``fused.FusedPass.add_type_conformance`` so it shares the suite's single
   scan; exposed here only via the spec helpers.
3. **Span integrity** — the input-hint invariant on the span sequence (known
   ``kind``, text spans carry ``text``, media spans carry ``media_ref``,
   offsets non-null/non-negative/strictly increasing) as per-partition counts
   (``fused.FusedPass.add_span_integrity``) and, here, as violation *rows*
   (doc_id + offending span sequence + reason) for the report sink.

4. **Embedding conformance** — the media/vector side of the same invariant:
   ``array<float>`` columns must be present, the declared width, finite,
   non-degenerate and optionally inside a norm band before any cosine
   pipeline (dedup / ANN / decontamination) may trust them.
   :func:`embedding_conformance` (one map-side-combinable agg) and
   :func:`embedding_violations` (violation rows, one reason each).

Everything data-level is pure JVM higher-order functions (``exists`` /
``zip_with`` / ``slice``) — no Python in the row path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_validator.canonical import partition_id_expr, span_seq_expr

DEFAULT_SPAN_KINDS = ("text", "image", "audio", "video")


# ---------------------------------------------------------------------------
# 1. metadata-level schema diff


@dataclass
class ColumnSpec:
    """One expected column.

    ``dtype`` is Spark DDL (e.g. ``"array<struct<kind:string,offset:int>>"``).
    ``nullable=None`` means "don't care". ``match="contains"`` accepts any
    actual type that structurally contains the expected one: every expected
    struct field must exist with a conforming type, extra nested fields are
    allowed (the right mode for evolving media-metadata structs).
    """

    name: str
    dtype: str
    nullable: bool | None = None
    required: bool = True
    match: str = "exact"  # "exact" | "contains"

    def __post_init__(self):
        if self.match not in ("exact", "contains"):
            raise ValueError(f"match must be exact|contains, got {self.match!r}")


@dataclass
class SchemaSpec:
    columns: list[ColumnSpec]
    allow_extra: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "SchemaSpec":
        cols = [
            ColumnSpec(
                name=c["name"],
                dtype=c["dtype"],
                nullable=c.get("nullable"),
                required=c.get("required", True),
                match=c.get("match", "exact"),
            )
            for c in d["columns"]
        ]
        return cls(columns=cols, allow_extra=d.get("allow_extra", True))


def _parse_ddl(ddl: str) -> T.DataType:
    # fromDDL needs an active session (Spark parses the DDL); every engine
    # flow has one by the time a check runs
    return T.StructType.fromDDL(f"`__c` {ddl}").fields[0].dataType


def _type_contains(expected: T.DataType, actual: T.DataType) -> bool:
    """Structural subset: actual may have extra struct fields anywhere."""
    if isinstance(expected, T.StructType):
        if not isinstance(actual, T.StructType):
            return False
        actual_by_name = {f.name: f.dataType for f in actual.fields}
        return all(
            f.name in actual_by_name
            and _type_contains(f.dataType, actual_by_name[f.name])
            for f in expected.fields
        )
    if isinstance(expected, T.ArrayType):
        return isinstance(actual, T.ArrayType) and _type_contains(
            expected.elementType, actual.elementType
        )
    if isinstance(expected, T.MapType):
        return (
            isinstance(actual, T.MapType)
            and _type_contains(expected.keyType, actual.keyType)
            and _type_contains(expected.valueType, actual.valueType)
        )
    # scalar: nullability-insensitive (nullability is a ColumnSpec knob)
    return expected.simpleString() == actual.simpleString()


def schema_check(
    schema: T.StructType, spec: SchemaSpec
) -> list[dict[str, object]]:
    """Diff an actual StructType against the spec.

    Returns one finding per expected column plus one per unexpected actual
    column, each ``{"column", "status", "expected", "actual", "holds"}`` with
    status in ``ok | missing | type_mismatch | nullability | extra``.
    Metadata only — no job is run.
    """
    actual_fields = {f.name: f for f in schema.fields}
    findings: list[dict[str, object]] = []
    for c in spec.columns:
        f = actual_fields.get(c.name)
        if f is None:
            findings.append(
                {
                    "column": c.name,
                    "status": "missing" if c.required else "ok",
                    "expected": c.dtype,
                    "actual": "",
                    "holds": not c.required,
                }
            )
            continue
        expected_t = _parse_ddl(c.dtype)
        if c.match == "exact":
            type_ok = expected_t.simpleString() == f.dataType.simpleString()
        else:
            type_ok = _type_contains(expected_t, f.dataType)
        if not type_ok:
            status = "type_mismatch"
        elif c.nullable is not None and f.nullable != c.nullable:
            status = "nullability"
        else:
            status = "ok"
        findings.append(
            {
                "column": c.name,
                "status": status,
                "expected": c.dtype,
                "actual": f.dataType.simpleString(),
                "holds": status == "ok",
            }
        )
    expected_names = {c.name for c in spec.columns}
    for f in schema.fields:
        if f.name not in expected_names:
            findings.append(
                {
                    "column": f.name,
                    "status": "extra",
                    "expected": "",
                    "actual": f.dataType.simpleString(),
                    "holds": spec.allow_extra,
                }
            )
    return findings


_VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("column", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("expected", T.StringType(), False),
        T.StructField("actual", T.StringType(), False),
        T.StructField("holds", T.BooleanType(), False),
    ]
)


def schema_verdict(
    spark: SparkSession, df: DataFrame, spec: SchemaSpec
) -> DataFrame:
    """The findings as a (tiny, driver-built) verdict DataFrame — the same
    shape contract every other check's verdicts follow, so it slots into the
    suite runner / report sink unchanged."""
    rows = [
        (d["column"], d["status"], d["expected"], d["actual"], d["holds"])
        for d in schema_check(df.schema, spec)
    ]
    return spark.createDataFrame(rows, _VERDICT_SCHEMA)


# ---------------------------------------------------------------------------
# 3. span-sequence integrity (data level, pure JVM exprs)


def span_violation_flags(
    spans: str | Column = "spans", kinds: tuple[str, ...] = DEFAULT_SPAN_KINDS
) -> dict[str, Column]:
    """Per-document boolean violation flags over the span array.

    All higher-order JVM functions; each flag is null-safe (a NULL spans
    array counts as an order violation — the sequence contract can't hold
    without a sequence).
    """
    s = F.col(spans) if isinstance(spans, str) else spans

    def any_span(pred) -> Column:
        return F.coalesce(F.exists(s, lambda x: pred(x)), F.lit(False))

    bad_kind = any_span(
        lambda x: x["kind"].isNull() | ~x["kind"].isin(*kinds)
    )
    text_null = any_span(lambda x: (x["kind"] == "text") & x["text"].isNull())
    media_null = any_span(
        lambda x: x["kind"].isNotNull()
        & (x["kind"] != "text")
        & x["media_ref"].isNull()
    )
    bad_offset = any_span(lambda x: x["offset"].isNull() | (x["offset"] < 0))
    # strictly increasing offsets: pair each span with its successor;
    # zip_with pads the tail with NULL -> coalesce keeps it a non-violation
    succ = F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0)))
    disorder = F.coalesce(
        F.exists(
            F.zip_with(s, succ, lambda a, b: b["offset"] <= a["offset"]),
            lambda v: F.coalesce(v, F.lit(False)),
        ),
        F.lit(False),
    )
    order = s.isNull() | bad_offset | disorder
    return {
        "kind": bad_kind & s.isNotNull(),
        "text_null": text_null & s.isNotNull(),
        "media_null": media_null & s.isNotNull(),
        "order": order,
    }


def _any_violation(flags: dict[str, Column]) -> Column:
    any_bad = None
    for fcol in flags.values():
        any_bad = fcol if any_bad is None else (any_bad | fcol)
    return any_bad


def span_integrity_violations(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
    kinds: tuple[str, ...] = DEFAULT_SPAN_KINDS,
    max_rows_per_partition: int | None = None,
    num_partitions: int = 64,
) -> DataFrame:
    """Violation rows: (doc_id, reason, span_seq) — one row per violated rule
    per document, with the offending span sequence rendered in the canonical
    form used for the reference's span-sequence-equality invariant
    (``canonical.span_seq_expr``). Selectivity pushes down: the filter on the
    OR of the flags runs before the (expensive) sequence render.

    With ``max_rows_per_partition``, at most that many documents are reported
    per logical partition (deterministic: lowest doc_ids win) — the
    reference's capped-highlights posture, so a systemic corruption at 10^12
    docs yields a bounded, partition-balanced diagnostic table instead of a
    violation set the size of the input. The cap's window shuffles only the
    already-filtered violating rows."""
    flags = span_violation_flags(spans_col, kinds)
    reasons = F.array_compact(
        F.array(
            *[
                F.when(fcol, F.lit(name))
                for name, fcol in sorted(flags.items())
            ]
        )
    )
    bad = df.where(_any_violation(flags)).select(
        F.col(doc_id_col).alias("doc_id"),
        reasons.alias("reasons"),
        F.when(F.col(spans_col).isNotNull(), span_seq_expr(spans_col)).alias(
            "span_seq"
        ),
    )
    if max_rows_per_partition is not None:
        from pyspark.sql import Window

        pid = partition_id_expr("doc_id", num_partitions)
        w = Window.partitionBy(pid).orderBy("doc_id")
        bad = (
            bad.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_rows_per_partition)
            .drop("__rn")
        )
    return bad.select("doc_id", F.explode("reasons").alias("reason"), "span_seq")


def quarantine_by_integrity(
    df: DataFrame,
    spans_col: str = "spans",
    kinds: tuple[str, ...] = DEFAULT_SPAN_KINDS,
) -> tuple[DataFrame, DataFrame]:
    """Route documents by span integrity: ``(clean, quarantined)``.

    The training-data gate: write ``clean`` onward, persist ``quarantined``
    (full original rows, so nothing is lost for repair) next to the
    violation-row diagnostics. Each side is a pure filter over the scan —
    no shuffle, no Python; writing both sides costs two scans, or one when
    the caller persists the source."""
    flags = span_violation_flags(spans_col, kinds)
    any_bad = _any_violation(flags)
    return df.where(~any_bad), df.where(any_bad)


# ---------------------------------------------------------------------------
# 4. embedding (vector-column) conformance

#: reason priority: one reason per row, most structural first — a NULL vector
#: is not also "wrong dim"; a wrong-dim vector is not also scored for norm.
_EMB_REASONS = ("null_vector", "bad_dim", "nonfinite", "zero_vector", "norm_out")


def _embedding_flags(
    vec: Column,
    dim: int,
    norm_lo: float | None,
    norm_hi: float | None,
) -> dict[str, Column]:
    """Mutually exclusive conformance flags for an ``array<float>`` column,
    all JVM higher-order functions (exists/aggregate) — no Python in the row
    path. The media side of the interleaved-document north rule: embedding
    vectors must be present, the declared width, finite, non-degenerate and
    (optionally) inside a norm band before any cosine-based pipeline
    (dedup/ANN/decontamination) may trust them."""
    is_null = vec.isNull()
    bad_dim = ~is_null & (F.size(vec) != F.lit(dim))
    shaped = ~is_null & ~bad_dim
    x_bad = lambda x: F.isnan(x.cast("double")) | (  # noqa: E731
        F.abs(x.cast("double")) == F.lit(float("inf"))
    )
    nonfinite = shaped & F.exists(vec, x_bad)
    measurable = shaped & ~nonfinite
    norm = F.sqrt(
        F.aggregate(
            vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    zero = measurable & (norm == F.lit(0.0))
    if norm_lo is None and norm_hi is None:
        norm_out = F.lit(False)
    else:
        lo = F.lit(float(norm_lo)) if norm_lo is not None else F.lit(float("-inf"))
        hi = F.lit(float(norm_hi)) if norm_hi is not None else F.lit(float("inf"))
        norm_out = measurable & ~zero & ((norm < lo) | (norm > hi))
    return {
        "null_vector": is_null,
        "bad_dim": bad_dim,
        "nonfinite": nonfinite,
        "zero_vector": zero,
        "norm_out": norm_out,
        "__norm_ok": measurable,  # internal: rows whose norm is defined
        "__norm": norm,
    }


def embedding_conformance(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    norm_lo: float | None = None,
    norm_hi: float | None = None,
) -> DataFrame:
    """One-row conformance summary for an embedding column: counts per reason
    plus the norm range over measurable rows. ONE aggregation over one scan —
    every counter is a conditional sum, so it is map-side combinable and the
    shuffle is a single row per partition regardless of table size."""
    fl = _embedding_flags(F.col(vec_col), dim, norm_lo, norm_hi)
    cnt = lambda c: F.sum(c.cast("int")).cast("bigint")  # noqa: E731
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        cnt(fl["null_vector"]).alias("n_null_vec"),
        cnt(fl["bad_dim"]).alias("n_bad_dim"),
        cnt(fl["nonfinite"]).alias("n_nonfinite"),
        cnt(fl["zero_vector"]).alias("n_zero_vec"),
        cnt(fl["norm_out"]).alias("n_norm_out"),
        F.round(F.min(F.when(fl["__norm_ok"], fl["__norm"])), 6).alias("min_norm"),
        F.round(F.max(F.when(fl["__norm_ok"], fl["__norm"])), 6).alias("max_norm"),
    )


def embedding_violations(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    norm_lo: float | None = None,
    norm_hi: float | None = None,
) -> DataFrame:
    """Violation rows (id, reason) for the report sink — exactly one reason
    per row, the most structural one (see ``_EMB_REASONS``). A pure filter +
    CASE over the scan; selectivity pushes down, nothing shuffles."""
    fl = _embedding_flags(F.col(vec_col), dim, norm_lo, norm_hi)
    reason = F.lit(None).cast("string")
    for name in reversed(_EMB_REASONS):
        reason = F.when(fl[name], F.lit(name)).otherwise(reason)
    return (
        df.select(F.col(id_col), reason.alias("reason"))
        .where(F.col("reason").isNotNull())
    )
