"""Canonicalization of the interleaved-document table + key/null semantics.

Input shape (BASELINE.json input_hint):
    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

The reference's per-row equality invariant is *span-sequence equality over
(kind, text, media_ref) preserving order* -- offsets are positional metadata and
excluded, exactly as the reference's value equality ignores row ids. We canonicalize a
span sequence to:

  * ``span_seq``  -- a deterministic string rendering (order-preserving, null-safe,
    field-separated with separators escaped) usable as a grouping key in ANY engine
    (Spark and the DuckDB oracle produce identical strings);
  * ``span_key``  -- ``xxhash64(span_seq)``: the cheap 8-byte shuffle key used at scale.

Null semantics (reference: src/core/model/types/builtin.h:36-40 -- Null is the literal
"NULL", Empty is "" and the two are distinct; src/core/config/equal_nulls/ -- the
``is_null_equal_null`` knob):
  * Spark's groupBy treats SQL NULLs as equal => ``NullMode.EQUAL`` (reference default).
  * ``NullMode.UNEQUAL`` makes every NULL unique by pairing the value with a per-row
    tag, reproducing is_null_equal_null=false (each NULL forms its own cluster).

Everything here is a pure Column expression -- JVM-side, whole-stage-codegen friendly,
no Python UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Unit separator / record separator: control chars that cannot appear in real text
#: are still escaped defensively (see _esc) so the rendering is injective.
_FIELD_SEP = "\x1f"
_SPAN_SEP = "\x1e"
#: Distinct sentinels for NULL vs empty-string so the rendering stays injective
#: (reference distinguishes Null and Empty: builtin.h:36-40).
_NULL_TOKEN = "\x00N"


class NullMode(Enum):
    """is_null_equal_null analog (reference: src/core/config/equal_nulls/)."""

    EQUAL = "equal"  # NULL == NULL when grouping (Spark groupBy default)
    UNEQUAL = "unequal"  # every NULL is its own value (unique per row)


def _esc(col: Column) -> Column:
    """Escape separator chars so concat-rendering is injective."""
    return F.replace(
        F.replace(
            F.replace(col, F.lit("\\"), F.lit("\\\\")),
            F.lit(_FIELD_SEP),
            F.lit("\\f"),
        ),
        F.lit(_SPAN_SEP),
        F.lit("\\s"),
    )


def _render_field(col: Column) -> Column:
    return F.when(col.isNull(), F.lit(_NULL_TOKEN)).otherwise(_esc(col))


def span_seq_expr(spans: str | Column = "spans") -> Column:
    """Order-preserving canonical string for a span sequence.

    Equality of ``span_seq`` <=> span-sequence equality on (kind, text, media_ref,
    order) -- the per-row invariant from BASELINE.json. Pure built-in exprs
    (transform + concat_ws), no UDF.
    """
    spans_col = F.col(spans) if isinstance(spans, str) else spans
    rendered = F.transform(
        spans_col,
        lambda s: F.concat_ws(
            _FIELD_SEP,
            _render_field(s["kind"]),
            _render_field(s["text"]),
            _render_field(s["media_ref"]),
        ),
    )
    return F.array_join(rendered, _SPAN_SEP, _NULL_TOKEN)


def span_key_expr(spans: str | Column = "spans") -> Column:
    """8-byte shuffle key: xxhash64 of the canonical span string.

    At 10^12 rows the 8-byte key is what shuffles; the full ``span_seq`` string is
    only materialized for violation reporting (gated + capped).
    """
    return F.xxhash64(span_seq_expr(spans))


def partition_id_expr(key: str | Column = "doc_id", num_partitions: int = 64) -> Column:
    """Deterministic logical partition id: pmod(xxhash64(key), P).

    Stable across parallelism levels (local[8] vs local[32] vs 1000 executors), so
    per-partition verdicts are comparable between cluster sizes -- required by the
    N-vs-4N exactness claim in BASELINE.json.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(key_col), F.lit(num_partitions)).cast("int")


def null_safe_key(col: Column, mode: NullMode, row_uid: Column | None = None) -> Column:
    """Wrap a grouping-key column according to the null mode.

    EQUAL: identity (Spark groups NULLs together already).
    UNEQUAL: struct(value, null_tag) where null_tag is a unique per-row id when the
    value is NULL -- every NULL lands in its own group, reproducing
    is_null_equal_null=false. ``row_uid`` should be a stable row id column if verdict
    stability across runs matters; defaults to monotonically_increasing_id().
    """
    if mode is NullMode.EQUAL:
        return col
    uid = row_uid if row_uid is not None else F.monotonically_increasing_id()
    return F.struct(
        col.alias("v"),
        F.when(col.isNull(), uid).otherwise(F.lit(None).cast("long")).alias("nulltag"),
    )


def coerce_reference_nulls(df: DataFrame, columns: list[str]) -> DataFrame:
    """Map the reference's CSV conventions onto typed columns: the literal string
    "NULL" becomes SQL NULL; empty string stays '' (distinct from NULL).
    Reference: builtin.h:36-40 (Null == "NULL", Empty == "")."""
    for c in columns:
        df = df.withColumn(
            c, F.when(F.col(c) == "NULL", F.lit(None)).otherwise(F.col(c))
        )
    return df


@dataclass
class CanonicalDocs:
    """The cached canonical projection: load-once / execute-many substrate.

    Mirrors the reference's Algorithm::LoadData -> Execute split
    (algorithm.cpp:76-96): ``canonicalize`` is load (one pass deriving keys),
    each check is an execute re-runnable without re-deriving.
    """

    df: DataFrame
    num_partitions: int

    def unpersist(self) -> None:
        self.df.unpersist()


def canonicalize(
    docs: DataFrame,
    num_partitions: int = 64,
    cache: bool = True,
    spans_col: str = "spans",
    doc_id_col: str = "doc_id",
) -> CanonicalDocs:
    """Derive the canonical projection of an interleaved-doc table.

    Adds: partition_id, span_seq, span_key, n_spans, n_text_spans, n_media_spans,
    total_text_len, offsets_monotonic. Column-pruned: only doc_id + spans leave the
    scan; everything else is derived (Catalyst prunes unreferenced span fields when
    downstream checks don't touch span_seq).
    """
    if spans_col not in docs.columns:
        # flat table (no interleaved spans): pass through with partition_id only
        out = docs.select(
            F.col(doc_id_col).alias("doc_id"),
            *[F.col(c) for c in docs.columns if c != doc_id_col],
            partition_id_expr(doc_id_col, num_partitions).alias("partition_id"),
        )
        if cache:
            out = out.persist()
        return CanonicalDocs(df=out, num_partitions=num_partitions)
    spans = F.col(spans_col)
    out = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        spans.alias("spans"),
        partition_id_expr(doc_id_col, num_partitions).alias("partition_id"),
        span_seq_expr(spans_col).alias("span_seq"),
        span_key_expr(spans_col).alias("span_key"),
        F.size(spans).alias("n_spans"),
        F.size(F.filter(spans, lambda s: s["kind"] == "text")).alias("n_text_spans"),
        F.size(F.filter(spans, lambda s: s["kind"] != "text")).alias("n_media_spans"),
        F.aggregate(
            spans,
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
        ).alias("total_text_len"),
        # per-doc invariant: offsets strictly increasing (FIXTURES.md F1)
        F.aggregate(
            F.zip_with(
                spans,
                F.slice(spans, 2, F.greatest(F.size(spans) - 1, F.lit(0))),
                lambda a, b: (b["offset"] > a["offset"]).cast("int"),
            ),
            F.lit(1).cast("int"),
            lambda acc, ok: F.least(acc, F.coalesce(ok, F.lit(1))),
        ).cast("boolean").alias("offsets_monotonic"),
    )
    if cache:
        out = out.persist()
    return CanonicalDocs(df=out, num_partitions=num_partitions)
