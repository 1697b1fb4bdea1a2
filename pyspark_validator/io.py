"""Ingestion parity with the reference's CSV conventions.

The reference ingests EVERY table as strings (idataset_stream.h:9-22 -- Row =
vector<string>) and then (a) treats the literal "NULL" as null and "" as a
distinct Empty value (builtin.h:36-40), and (b) infers a per-column type over
{Int, BigInt, Double, Bool, Date, String} as the most specific type matching
all values (typed_column_data.h:181-251; BigInt = >19-digit integers kept as
strings, builtin.h:21-24).

Spark mapping: `read_reference_csv` reproduces (a); `infer_reference_types`
reproduces (b) with ONE wide aggregation computing per-column regex conformity
counts (a single scan regardless of column count -- the reference fans out one
thread per column, data_stats.cpp:1188-1191) and then casts winners. "Mixed"
columns stay string, like the reference's Mixed type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: typed_column_data.h:181-243 regexes (anchored)
_INT_RE = r"^[+-]?\d{1,19}$"
_BIGINT_RE = r"^[+-]?\d{20,}$"
_DOUBLE_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"
_BOOL_RE = r"^(true|false|True|False|TRUE|FALSE)$"
_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"


def read_reference_csv(
    spark: SparkSession, path: str, sep: str = ",", header: bool = True
) -> DataFrame:
    """Read a CSV the way the reference does: all columns as strings, the
    literal "NULL" mapped to SQL NULL, empty string kept as '' (distinct)."""
    # Spark's CSV parser yields null for EMPTY fields and the plain string
    # "NULL" for NULL literals -- the exact inverse of the reference's
    # convention (Empty = "", Null = "NULL" literal; builtin.h:36-40). Since
    # post-parse nulls can ONLY come from empty fields, the mapping is exact:
    # null -> "" first, then "NULL" -> null.
    df = spark.read.csv(path, sep=sep, header=header, inferSchema=False)
    for c in df.columns:
        restored = F.coalesce(F.col(c), F.lit(""))
        df = df.withColumn(
            c, F.when(restored == "NULL", F.lit(None)).otherwise(restored)
        )
    return df


def infer_reference_types(df: DataFrame) -> dict[str, str]:
    """Most specific type per column over all non-null, non-empty values.

    Returns {column: 'int'|'bigint_string'|'double'|'boolean'|'date'|'string'}.
    'bigint_string' marks >19-digit integer columns the reference keeps as
    string-typedef BigInt (builtin.h:21-24) -- we leave them as strings too.
    """
    aggs = []
    for c in df.columns:
        s = F.col(c)
        counted = s.isNotNull() & (s != "")
        aggs.append(
            F.struct(
                F.sum(counted.cast("long")).alias("n"),
                F.sum((counted & s.rlike(_INT_RE)).cast("long")).alias("i"),
                F.sum((counted & s.rlike(_BIGINT_RE)).cast("long")).alias("bi"),
                F.sum(
                    (counted & (s.rlike(_DOUBLE_RE) | s.rlike(_INT_RE))).cast("long")
                ).alias("d"),
                F.sum((counted & s.rlike(_BOOL_RE)).cast("long")).alias("b"),
                F.sum((counted & s.rlike(_DATE_RE)).cast("long")).alias("dt"),
            ).alias(c)
        )
    row = df.agg(*aggs).collect()[0]
    out: dict[str, str] = {}
    for c in df.columns:
        st = row[c]
        n = st["n"] or 0
        if n == 0:
            out[c] = "string"  # all null/empty: undefined -> string
        elif st["i"] == n:
            out[c] = "int"
        elif st["bi"] == n:
            out[c] = "bigint_string"
        elif st["d"] == n:
            out[c] = "double"
        elif st["b"] == n:
            out[c] = "boolean"
        elif st["dt"] == n:
            out[c] = "date"
        else:
            out[c] = "string"  # Mixed
    return out


def cast_inferred(df: DataFrame, types: dict[str, str] | None = None) -> DataFrame:
    """Cast columns to their inferred types (empty strings become NULL in
    non-string columns -- Spark casting; the reference keeps Empty distinct,
    so keep the string form when that distinction matters)."""
    types = types if types is not None else infer_reference_types(df)
    spark_type = {
        "int": "bigint",  # reference Int is int64 (builtin.h:18)
        "double": "double",
        "boolean": "boolean",
        "date": "date",
    }
    for c, t in types.items():
        if t in spark_type:
            # try_cast: the inferred type is the majority over NON-empty
            # values, so residual '' cells must become NULL instead of
            # throwing under Spark 4 ANSI
            df = df.withColumn(
                c, F.expr(f"try_cast(`{c}` AS {spark_type[t]})")
            )
    return df


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by the validation key.

    Bucketing pre-co-locates rows by hash(bucket_cols) AT WRITE TIME, so every
    later groupBy/join on that key reads the buckets as an existing
    HashPartitioning and skips the exchange entirely -- the right layout for a
    table that is re-validated every snapshot (UCC/FD on the same key each
    run). One write shuffle amortized over every future validation pass.
    Requires a session catalog (any warehouse dir works; no Hive needed)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table_name)


def read_bucketed(spark, table_name: str) -> DataFrame:
    """Read a table written by write_bucketed; scans report the bucket spec so
    Catalyst plans bucket-local aggregation (verify with .explain: no Exchange
    between the scan and the first groupBy on the bucket key)."""
    return spark.table(table_name)
