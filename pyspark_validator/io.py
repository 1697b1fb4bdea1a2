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


def parse_reference_line(line: str, sep: str = ",") -> list[str]:
    """Exact replica of the reference's CSV field parse (csv_parser.cpp
    ParseString, :121-166).

    The reference pre-escapes every ``\\`` and ``"`` so that
    boost::escaped_list_separator preserves them verbatim, which collapses to:
    a raw backslash is a LITERAL (no escape semantics on input), every ``"``
    is emitted AND toggles the in-quotes state, and ``sep`` splits only
    outside quotes.  A second pass then drops quote chars from each token,
    except a doubled ``""`` strictly inside a quote-enclosed token, which
    collapses to one ``"`` (csv_parser.cpp:146-160).  Goldens:
    test_csv_parser.cpp TestGetNextRow (incl. the kTestParse escape torture
    rows).  The caller right-trims the line first (CSVParser::GetNext)."""
    if line == "":
        return []
    tokens: list[str] = []
    cur: list[str] = []
    in_quotes = False
    for ch in line:
        if ch == sep and not in_quotes:
            tokens.append("".join(cur))
            cur = []
        elif ch == '"':
            cur.append(ch)
            in_quotes = not in_quotes
        else:
            cur.append(ch)
    tokens.append("".join(cur))

    out: list[str] = []
    for tok in tokens:
        n = len(tok)
        enclosed = n >= 2 and tok[0] == '"' and tok[-1] == '"'
        buf: list[str] = []
        i = 0
        while i < n:
            c = tok[i]
            if c == '"':
                if enclosed and 0 < i < n - 2 and tok[i + 1] == '"':
                    buf.append(c)
                    i += 1
            else:
                buf.append(c)
            i += 1
        out.append("".join(buf))
    return out


def read_reference_csv_exact(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    null_literal: bool = True,
    max_bytes: int = 1 << 26,
) -> DataFrame:
    """Byte-exact reference ingestion: parse with `parse_reference_line` and
    apply the NULL-literal convention.

    This is the parity path for the reference's own CSV fixtures (its parser
    has non-standard quote semantics Spark's univocity reader can't be
    configured into -- see parse_reference_line).  Fixtures are small by
    construction, so the parse is driver-side behind a `max_bytes` guard; the
    scale path for ordinary CSVs stays `read_reference_csv` (distributed
    spark.read.csv, identical output on standard quoting).  Line framing
    mirrors CSVParser: getline on '\\n', right-trim each line
    (csv_parser.cpp:14-17), a trailing final newline yields no extra row
    (GetNextIfHas :100-110), and a single-column empty parse is one empty
    field (GetNextRow :171-173)."""
    import os

    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"{path} is {size} bytes > max_bytes={max_bytes}; use "
            "read_reference_csv (distributed) for large files"
        )
    with open(path, "r", newline="") as f:
        text = f.read()
    lines = text.split("\n")
    if text.endswith("\n"):
        lines.pop()
    rows = [parse_reference_line(ln.rstrip(), sep) for ln in lines]
    if not rows:
        rows = [[]]
    if header:
        names = rows[0] if rows[0] else [""]
        data = rows[1:]
    else:
        names = [str(i) for i in range(len(rows[0]) or 1)]
        data = rows
    ncols = len(names)
    fixed: list[list[str | None]] = []
    for idx, r in enumerate(data):
        if ncols == 1 and not r:
            r = [""]
        if len(r) != ncols:
            raise ValueError(
                f"{path}: row {idx} has {len(r)} fields, expected {ncols}"
            )
        if null_literal:
            fixed.append([None if v == "NULL" else v for v in r])
        else:
            fixed.append(list(r))
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField(n, StringType(), True) for n in names])
    return spark.createDataFrame(fixed, schema=schema)


#: typed_column_data.h:183-213 value-type checkers, translated to Java regex
#: (boost (?i)...(?-i) spelled (?i:...)).  Checker order is Date, Int,
#: BigInt, Double, Bool (kTypeIdToChecker); first match types the value.
_REF_DATE_RE = (
    r"^(\d{4})([-./]?)(1[0-2]|0[1-9]|[1-9])\2(3[0-1]|0[1-9]|[1-9]|[1-2][0-9])$"
)
_REF_DOUBLE_RE = (
    r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
    r"|^[+-]?(?i:inf|nan)$"
    r"|^[+-]?0[xX]([0-9a-fA-F]+(\.[0-9a-fA-F]*)?|\.[0-9a-fA-F]+)([pP][+-]?\d+)?$"
)
_REF_BOOL_RE = r"^\s*(?i:true|false|0|1)\s*$"

#: typed_column_data.h:249-256 kTypeIdToBitset as ints, bit i =
#: kAllCandidateTypes[i] = [date, int, bigint, double, bool, string].
_BITS = {"date": 1, "int": 30, "bigint": 28, "double": 24, "bool": 16, "string": 32}
_BIT_ORDER = ["date", "int", "bigint", "double", "bool", "string"]


def deduce_column_types(df: DataFrame) -> dict[str, str]:
    """Exact TypedColumnData column-type deduction
    (typed_column_data.cpp:24-90) in ONE wide aggregation.

    Each non-null, non-empty value gets the bitset of column types it is
    compatible with (an undelimited date could also be an int,
    typed_column_data.cpp:58-60); the column's candidate set is the bit-AND
    over all values, the winner the first set bit in [date, int, bigint,
    double, bool, string]; an emptied set is Mixed, a valueless column
    Undefined.  Date validity mirrors boost::gregorian: real calendar day and
    year >= 1400 (greg_year min).  Goldens: test_typed_column_data.cpp's ten
    fixture layouts.  Returns {column: 'date'|'int'|'bigint'|'double'|'bool'|
    'string'|'mixed'|'undefined'}."""
    aggs = []
    for c in df.columns:
        s = F.col(c)
        counted = s.isNotNull() & (s != "")
        y = F.regexp_extract(s, _REF_DATE_RE, 1)
        delim = F.regexp_extract(s, _REF_DATE_RE, 2)
        mo = F.regexp_extract(s, _REF_DATE_RE, 3)
        dy = F.regexp_extract(s, _REF_DATE_RE, 4)
        date_ok = (
            (y != "")
            & (y.cast("int") >= 1400)
            & F.concat(
                y, F.lit("-"), F.lpad(mo, 2, "0"), F.lit("-"), F.lpad(dy, 2, "0")
            )
            .try_cast("date")
            .isNotNull()
        )
        bits = (
            F.when(date_ok & (delim == ""), F.lit(_BITS["date"] | _BITS["int"]))
            .when(date_ok, F.lit(_BITS["date"]))
            .when(s.rlike(_INT_RE), F.lit(_BITS["int"]))
            .when(s.rlike(_BIGINT_RE), F.lit(_BITS["bigint"]))
            .when(s.rlike(_REF_DOUBLE_RE), F.lit(_BITS["double"]))
            .when(s.rlike(_REF_BOOL_RE), F.lit(_BITS["bool"]))
            .otherwise(F.lit(_BITS["string"]))
        )
        aggs.append(
            F.struct(
                F.sum(counted.cast("long")).alias("n"),
                F.bit_and(F.when(counted, bits).otherwise(F.lit(63))).alias("b"),
            ).alias(c)
        )
    row = df.agg(*aggs).collect()[0]
    out: dict[str, str] = {}
    for c in df.columns:
        st = row[c]
        if not st["n"]:
            out[c] = "undefined"
            continue
        b = st["b"]
        for i, name in enumerate(_BIT_ORDER):
            if b & (1 << i):
                out[c] = name
                break
        else:
            out[c] = "mixed"
    return out


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
