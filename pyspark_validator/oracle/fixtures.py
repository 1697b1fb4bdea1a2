"""Deterministic test fixtures (FIXTURES.md).

Everything is a pure function of (seed, row index): any scale reproduces identically
and every planted defect's location/count is computable in closed form, mirroring the
reference's parameterized golden tests (src/tests/unit/test_fd_verifier.cpp:54-105).

F1 ``docs``      -- interleaved text+media document table (the input_hint shape).
F2 ``tfd``       -- the reference's TestFD.csv 12-row golden table, verbatim
                    (/root/reference/test_input_data/TestFD.csv) so its pinned UCC/FD
                    expectations transfer.
F3 ``ind_pair``  -- IndTestTypos.csv verbatim (ind_data/IndTestTypos.csv).
F5 ``nulls_edge``-- NULL / empty-string / "NULL"-literal edge table.

Two F1 generators:
  * ``docs_pandas(n_docs, seed)`` -- driver-side, used by pytest + the pandas oracle.
  * ``docs_spark(spark, n_docs, seed)`` -- the SAME rows built distributed from
    ``spark.range`` with pure column expressions (no Python), for bench-scale volume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ["text", "image", "audio", "video", "table"]
# cumulative kind thresholds over pmod(h,100): text 70%, image 15%, audio 8%, video 5%, table 2%
_KIND_CUM = [70, 85, 93, 98, 100]

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
]


def _mix(*parts: int) -> int:
    """Deterministic integer mixer (splitmix64-ish), identical everywhere."""
    h = 0x9E3779B97F4A7C15
    for p in parts:
        h ^= (p + 0x9E3779B97F4A7C15 + ((h << 6) & 0xFFFFFFFFFFFFFFFF) + (h >> 2)) & 0xFFFFFFFFFFFFFFFF
        h = (h * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 27
    return h


def _span_for(seed: int, i: int, j: int, variant: int) -> dict:
    """Span j of doc i (copy-variant ``variant``). Pure function."""
    h = _mix(seed, i, j, variant)
    kc = h % 100
    kind = next(k for k, c in zip(KINDS, _KIND_CUM) if kc < c)
    offset = j * 17 + (h % 7)  # strictly increasing: stride 17 > max jitter 6
    if kind == "text":
        hw = _mix(seed, i, j, variant, 1)
        mod = hw % 100
        if mod < 2:
            text = ""  # Empty (distinct from NULL): reference builtin.h:40
        elif mod < 3:
            text = "NULL"  # literal-"NULL" landmine: builtin.h:36-38
        else:
            nw = 1 + (hw % 8)
            text = " ".join(
                _WORDS[_mix(seed, i, j, variant, 2 + w) % len(_WORDS)]
                for w in range(nw)
            )
        return {"kind": kind, "text": text, "media_ref": None, "offset": offset}
    return {
        "kind": kind,
        "text": None,
        "media_ref": "media://%s/%010d" % (kind, _mix(seed, i, j, variant, 3) % 10_000_000_000),
        "offset": offset,
    }


def n_spans_of(seed: int, i: int) -> int:
    """Zipf-ish span count in 1..64, median ~6."""
    h = _mix(seed, i, 0xA)
    u = (h % 10_000) / 10_000.0
    return max(1, min(64, int(6.0 / (1.0 - 0.93 * u) - 2.0) + 1))


def dup_copies(i: int) -> int:
    """Planted UCC defects: doc i appears 1 + dup_copies(i) times.
    i % 10000 == 0 -> 2 extra copies (triple); else i % 1000 == 0 -> 1 extra (pair)."""
    if i % 10_000 == 0:
        return 2
    if i % 1_000 == 0:
        return 1
    return 0


def dup_spans_differ(i: int, copy: int) -> bool:
    """Planted FD defects: a duplicate copy gets DIFFERENT spans iff _mix(i,copy)
    is even -> FD doc_id -> span_seq broken exactly at those docs."""
    return _mix(0xFD, i, copy) % 2 == 0


def docs_rows(n_docs: int, seed: int = 42) -> list[tuple[str, list[dict]]]:
    rows: list[tuple[str, list[dict]]] = []
    for i in range(n_docs):
        ns = n_spans_of(seed, i)
        base = [_span_for(seed, i, j, 0) for j in range(ns)]
        rows.append(("doc_%012d" % i, base))
        for copy in range(1, dup_copies(i) + 1):
            variant = copy if dup_spans_differ(i, copy) else 0
            spans = (
                [_span_for(seed, i, j, variant) for j in range(ns)]
                if variant
                else base
            )
            rows.append(("doc_%012d" % i, spans))
    return rows


def docs_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    rows = docs_rows(n_docs, seed)
    return pd.DataFrame({"doc_id": [r[0] for r in rows], "spans": [r[1] for r in rows]})


def docs_spark_df(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """Same rows as docs_pandas, via createDataFrame (test scale)."""
    rows = [
        (
            doc_id,
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans],
        )
        for doc_id, spans in docs_rows(n_docs, seed)
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def docs_spark_distributed(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """Bench-scale generator: distributed, expression-only (no Python row loop).

    NOT row-identical to docs_pandas (different hash) but same shape, same skew, same
    planted-defect rates -- used only for throughput/scaling runs.
    """
    base = spark.range(n_docs).withColumnRenamed("id", "i")
    # replicate duplicates: explode a copies array sized by the same closed-form rule
    copies = F.when(F.col("i") % 10_000 == 0, 3).when(F.col("i") % 1_000 == 0, 2).otherwise(1)
    df = base.withColumn("copy", F.explode(F.sequence(F.lit(0), copies - 1)))
    h = F.xxhash64(F.col("i"), F.lit(seed))
    ns = (F.pmod(h, F.lit(12)) + 1).cast("int")
    span = lambda j: F.struct(  # noqa: E731
        F.element_at(
            F.array(*[F.lit(k) for k in KINDS]),
            F.when(F.pmod(F.xxhash64(F.col("i"), j), 100) < 70, 1)
            .when(F.pmod(F.xxhash64(F.col("i"), j), 100) < 85, 2)
            .when(F.pmod(F.xxhash64(F.col("i"), j), 100) < 93, 3)
            .when(F.pmod(F.xxhash64(F.col("i"), j), 100) < 98, 4)
            .otherwise(5)
            .cast("int"),
        ).alias("kind"),
        F.concat(F.lit("tok"), F.pmod(F.xxhash64(F.col("i"), j, F.col("copy")), 99991)).cast("string").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        (j * 17).cast("int").alias("offset"),
    )
    df = df.withColumn("spans", F.transform(F.sequence(F.lit(0), ns - 1), span))
    return df.select(
        F.format_string("doc_%012d", F.col("i")).alias("doc_id"), "spans"
    )


# ---------------------------------------------------------------------------
# F2: TestFD.csv verbatim (reference test_input_data/TestFD.csv). Row order = file
# order; 0-based row_id matters because reference clusters are row-index sets.
# Columns kept as strings where the reference infers mixed types.
TFD_ROWS = [
    # (col0, col1, col2, col3, col4, col5)
    (1, 1, "1", "1.233", "-", 1),
    (1, 1, "1", "0", "8", 2),
    (1, 1, "2.1", "0", "8", 3),
    (1, 2, "2", "hjkl", "444", 4),
    (1, 2, "2", "hjkl", "444", 4),
    (1, 2, "", "hjkl", "444", 5),
    (1, 3, "3", "0", "9", 6),
    (1, 3, "3", "0", "9", 6),
    (1, 3, "NULL", "999", "-", 7),
    (1, 4, "4", "hjkl", "555", 8),
    (1, 4, "4", "hjkl", "555", 8),
    (1, 4, "abc", "hjkl", "555", 9),
]

TFD_SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.IntegerType()),
        T.StructField("col0", T.IntegerType()),
        T.StructField("col1", T.IntegerType()),
        T.StructField("col2", T.StringType()),
        T.StructField("col3", T.StringType()),
        T.StructField("col4", T.StringType()),
        T.StructField("col5", T.IntegerType()),
    ]
)


def tfd_spark(spark: SparkSession) -> DataFrame:
    rows = [(i, *r) for i, r in enumerate(TFD_ROWS)]
    return spark.createDataFrame(rows, TFD_SCHEMA)


def tfd_pandas() -> pd.DataFrame:
    return pd.DataFrame(
        [(i, *r) for i, r in enumerate(TFD_ROWS)],
        columns=["row_id", "col0", "col1", "col2", "col3", "col4", "col5"],
    )


# F3: IndTestTypos.csv verbatim (reference test_input_data/ind_data/IndTestTypos.csv)
IND_TYPOS_ROWS = [
    ("0", "a", "0", "a", "a"),
    ("1", "b", "2", "c", "b"),
    ("1", "b", "3", "d", "0"),
    ("0", "a", "5", "f", "1"),
    ("2", "c", "6", "l", "4"),
    ("3", "d", "7", "g", "a"),
    ("4", "e", "8", "h", "a"),
    ("5", "f", "9", "k", "a"),
]
IND_TYPOS_COLS = ["typo_col", "typo_col2", "pk1", "pk2", "rand"]


def ind_typos_spark(spark: SparkSession) -> DataFrame:
    rows = [(i, *r) for i, r in enumerate(IND_TYPOS_ROWS)]
    return spark.createDataFrame(rows, ["row_id", *IND_TYPOS_COLS])


# F5: NULL / empty / literal-"NULL" edge table
NULLS_EDGE_ROWS = [
    # (a, b): mixes SQL NULL, empty string, literal "NULL", and values
    ("x", "1"),
    ("x", "1"),
    (None, "2"),
    (None, "2"),
    ("", "3"),
    ("", "3"),
    ("NULL", "4"),
    ("y", None),
    ("y", None),
]


def nulls_edge_spark(spark: SparkSession) -> DataFrame:
    rows = [(i, a, b) for i, (a, b) in enumerate(NULLS_EDGE_ROWS)]
    return spark.createDataFrame(rows, ["row_id", "a", "b"])
