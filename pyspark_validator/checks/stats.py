"""Per-column statistics profile -- the DataStats analog.

The reference computes ~40 per-column statistics, one thread-pool task per column
with compute-once memoization (statistics/data_stats.cpp:1118-1191, :63-218). Our
design collapses the whole numeric profile into ONE wide aggregation pass: every
statistic is an algebraic expression over power sums / conditional counts, so the
entire profile is a single whole-stage-codegen'd scan with map-side partial
aggregation -- no shuffle of row data at all, only the final tiny combine.

Moment formulas (population moments, matching data_stats.cpp's definitions computed
from central moments; corrected sample std uses the n-1 denominator):
    avg      = S1/n
    var_samp = (S2 - S1^2/n) / (n-1)
    m2       = S2/n - avg^2
    skewness = m3 / m2^1.5          (m3 = S3/n - 3 avg S2/n + 2 avg^3)
    kurtosis = m4 / m2^2            (m4 = S4/n - 4 avg S3/n + 6 avg^2 S2/n - 3 avg^4)

Quantiles use percentile_approx (KLL-style sketch) by default -- the scale path --
or exact percentile for small oracles (reference computes exact via per-column sort,
data_stats.cpp:254-271).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _numeric_struct(c: str, exact_quantiles: bool, approx_distinct: bool) -> Column:
    x = F.col(c).cast("double")
    n = F.count(x)
    s1 = F.sum(x)
    s2 = F.sum(x * x)
    s3 = F.sum(x * x * x)
    s4 = F.sum(x * x * x * x)
    avg = s1 / n
    m2 = s2 / n - avg * avg
    m3 = s3 / n - F.lit(3.0) * avg * s2 / n + F.lit(2.0) * avg * avg * avg
    m4 = (
        s4 / n
        - F.lit(4.0) * avg * s3 / n
        + F.lit(6.0) * avg * avg * s2 / n
        - F.lit(3.0) * avg * avg * avg * avg
    )
    if exact_quantiles:
        q = F.percentile(x, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    else:
        q = F.percentile_approx(x, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10000)
    distinct = (
        F.approx_count_distinct(x) if approx_distinct else F.countDistinct(x)
    )
    # try_divide: a constant column has m2 == 0 (skew/kurt are 0/0) and a
    # single-value column has n-1 == 0 (std) -- under Spark 4 ANSI a plain
    # `/` THROWS there; the undefined moments come back NULL instead
    # (the reference's C++ doubles yield NaN at the same sites).
    skew = F.try_divide(m3, F.pow(m2, F.lit(1.5)))
    kurt = F.try_divide(m4, m2 * m2)
    return F.struct(
        F.lit(c).alias("column"),
        n.alias("count"),
        F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
        distinct.alias("n_distinct"),
        F.min(x).alias("min"),
        F.max(x).alias("max"),
        s1.alias("sum"),
        avg.alias("avg"),
        F.sqrt(F.try_divide(s2 - s1 * s1 / n, n - F.lit(1))).alias("std"),
        skew.alias("skewness"),
        kurt.alias("kurtosis"),
        q[0].alias("q25"),
        q[1].alias("median"),
        q[2].alias("q75"),
        (q[2] - q[0]).alias("iqr"),
        s2.alias("sum_squares"),
        F.sum((x == 0).cast("long")).alias("n_zeros"),
        F.sum((x < 0).cast("long")).alias("n_negatives"),
        F.exp(F.avg(F.when(x > 0, F.log(x)))).alias("geometric_mean"),
        # Jarque-Bera normality statistic (data_stats.h:181): n/6*(S^2 + (K-3)^2/4)
        (
            n.cast("double")
            / F.lit(6.0)
            * (
                F.pow(skew, F.lit(2.0))
                + F.pow(kurt - F.lit(3.0), F.lit(2.0)) / F.lit(4.0)
            )
        ).alias("jarque_bera"),
    )


def numeric_profile(
    df: DataFrame,
    columns: list[str],
    exact_quantiles: bool = False,
    approx_distinct: bool = False,
) -> DataFrame:
    """One row per column with the numeric DataStats profile. Single scan."""
    structs = [
        _numeric_struct(c, exact_quantiles, approx_distinct).alias(f"__s{i}")
        for i, c in enumerate(columns)
    ]
    row = df.agg(*structs)
    return row.select(
        F.explode(F.array(*[F.col(f"__s{i}") for i in range(len(columns))])).alias("p")
    ).select("p.*")


#: the reference's special-character set (data_stats.cpp:1047 kSpecialChars)
_SPECIAL_CHARS_RE = "[@#$%^&!?*_+=~'\\-\"]"


def _string_struct(c: str, approx_distinct: bool) -> Column:
    s = F.col(c)
    ln = F.length(s)
    trimmed = F.trim(s)
    nonempty = s.isNotNull() & (ln > 0)
    word_arr = F.when(
        nonempty & (F.length(trimmed) > 0), F.split(trimmed, r"\s+")
    ).otherwise(F.array().cast("array<string>"))
    words = F.when(s.isNotNull(), F.size(word_arr))
    distinct = F.approx_count_distinct(s) if approx_distinct else F.countDistinct(s)
    nchars = F.sum(F.when(nonempty, ln).otherwise(0))

    def ccount(pattern: str) -> Column:
        return F.sum(
            F.when(nonempty, F.regexp_count(s, F.lit(pattern))).otherwise(0)
        )

    spaces = F.when(nonempty, ln - F.length(F.replace(s, F.lit(" "), F.lit(""))))
    upper_words = F.sum(
        F.size(F.filter(word_arr, lambda w: w == F.upper(w)))
    )
    lower_words = F.sum(
        F.size(F.filter(word_arr, lambda w: w == F.lower(w)))
    )
    return F.struct(
        F.lit(c).alias("column"),
        F.count(s).alias("count"),
        F.sum(s.isNull().cast("long")).alias("n_nulls"),
        F.sum((s == "").cast("long")).alias("n_empties"),
        F.sum((s == "NULL").cast("long")).alias("n_null_literals"),
        distinct.alias("n_distinct"),
        F.min(ln).alias("min_len"),
        F.max(ln).alias("max_len"),
        F.avg(ln).alias("avg_len"),
        F.sum(words).alias("total_words"),
        F.avg(words).alias("avg_words"),
        F.min(words).alias("min_words"),
        F.max(words).alias("max_words"),
        F.min(s).alias("min_value"),
        F.max(s).alias("max_value"),
        # skip-empty variants: the reference's GetMin/GetMax run after
        # DeleteNullAndEmpties (data_stats.cpp:239-252), so "" never wins
        F.min(F.when(nonempty, s)).alias("min_value_ne"),
        F.max(F.when(nonempty, s)).alias("max_value_ne"),
        F.sum((s != F.lower(s)).cast("long")).alias("n_with_uppercase"),
        F.sum(s.rlike(r"^\s|\s$").cast("long")).alias("n_untrimmed"),
        F.sum(s.rlike(r"[^\x00-\x7F]").cast("long")).alias("n_non_ascii"),
        # -- char-class totals over non-null, non-empty values
        #    (data_stats.h:163-165,141-151; CountIfInColumn skips null/empty)
        nchars.alias("n_chars"),
        ccount("[0-9]").alias("n_digit_chars"),
        ccount("[a-z]").alias("n_lowercase_chars"),
        ccount("[A-Z]").alias("n_uppercase_chars"),
        ccount("[^A-Za-z]").alias("n_nonletter_chars"),
        # -- row counts (data_stats.cpp:976-1072)
        F.sum((nonempty & (F.length(trimmed) == 0)).cast("long")).alias(
            "n_whitespace_only"
        ),
        F.sum(s.rlike(r"^\s").cast("long")).alias("n_leading_ws"),
        F.sum(s.rlike(r"\s$").cast("long")).alias("n_trailing_ws"),
        F.sum((nonempty & s.rlike(_SPECIAL_CHARS_RE)).cast("long")).alias(
            "n_special_rows"
        ),
        # -- per-row ' '-count extremes (GetMinWhiteSpaces/GetMaxWhiteSpaces)
        F.min(spaces).alias("min_whitespaces"),
        F.max(spaces).alias("max_whitespaces"),
        # -- words whose alphabetic chars are all upper/lower
        #    (IsEntirelyUppercase/IsEntirelyLowercase: non-alpha chars ignored,
        #    so w == upper(w) is the exact predicate)
        upper_words.alias("n_entirely_upper_words"),
        lower_words.alias("n_entirely_lower_words"),
    )


def string_profile(
    df: DataFrame, columns: list[str], approx_distinct: bool = False
) -> DataFrame:
    """One row per string column: counts, null/empty/'NULL'-literal split (the
    reference's Null-vs-Empty distinction, builtin.h:36-40), length & word stats,
    case/whitespace/ascii counts (data_stats.h:141-212). Single scan."""
    structs = [
        _string_struct(c, approx_distinct).alias(f"__s{i}") for i, c in enumerate(columns)
    ]
    row = df.agg(*structs)
    return row.select(
        F.explode(F.array(*[F.col(f"__s{i}") for i in range(len(columns))])).alias("p")
    ).select("p.*")


def char_stats(
    df: DataFrame, columns: list[str], k: int = 10, diacritics: bool = True
) -> DataFrame:
    """Char-level profile, one row per string column (data_stats.cpp:545-564
    GetVocab, :844-875 GetTopKChars, :1074-1116 GetCharFrequency, :807-842
    GetNumberOfDiacriticChars):

      * vocab          -- sorted distinct characters as one string
      * top_k_chars    -- k most frequent chars, count desc then char asc
        (the reference's tie order is hash-map iteration order; we pin the
        deterministic char-asc tiebreak)
      * first/last_char_freq -- "c:n" of the most frequent first/last char
        (ties resolved to the larger char, as in the reference's max_element)
      * n_diacritic_chars -- combining marks after NFD decomposition, via a
        vectorized pandas UDF over Python's unicodedata (the reference uses
        ICU); chars are Unicode codepoints here, bytes there -- identical on
        ASCII/UTF-8 text without multibyte chars.

    Null and empty values are skipped, as in the reference. Two shuffles
    (char counts + edge-char counts), all JVM exprs except the diacritic
    kernel."""
    s = F.col("s")
    stacked = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(c).cast("string").alias("s"),
                        )
                        for c in columns
                    ]
                )
            ).alias("p")
        )
        .select("p.*")
        .filter(s.isNotNull() & (F.length(s) > 0))
    )
    chars = stacked.select(
        "column", F.explode(F.split(s, "")).alias("ch")
    ).filter(F.length("ch") > 0)
    counts = chars.groupBy("column", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = counts.groupBy("column").agg(
        F.concat_ws("", F.array_sort(F.collect_list("ch"))).alias("vocab"),
        F.slice(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("cnt")).alias("neg"), "ch"))
                ),
                lambda x: x["ch"],
            ),
            1,
            k,
        ).alias("top_k_chars"),
    )

    def edge(expr: Column, name: str) -> DataFrame:
        return (
            stacked.select("column", expr.alias("ch"))
            .groupBy("column", "ch")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("column")
            .agg(F.max(F.struct("cnt", "ch")).alias("m"))
            .select(
                "column",
                F.concat_ws(":", F.col("m.ch"), F.col("m.cnt")).alias(name),
            )
        )

    out = (
        ranked.join(edge(F.substring(s, 1, 1), "first_char_freq"), "column")
        .join(edge(F.substring(s, -1, 1), "last_char_freq"), "column")
    )
    if diacritics:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _dia(col: pd.Series) -> pd.Series:
            import unicodedata

            return col.map(
                lambda x: 0
                if x is None
                else sum(
                    1
                    for ch in unicodedata.normalize("NFD", x)
                    if unicodedata.category(ch) == "Mn"
                )
            )

        dia = stacked.groupBy("column").agg(
            F.sum(_dia(s)).alias("n_diacritic_chars")
        )
        out = out.join(dia, "column")
    return out


def deviation_stats(
    df: DataFrame, columns: list[str], exact_median: bool = False
) -> DataFrame:
    """Mean / median absolute deviation (data_stats.h:125,175): inherently
    two-pass (the centers must be known first). Pass 1 computes avg + median for
    ALL columns in one wide agg; pass 2 aggregates |x - center| per column in a
    second wide agg. Two scans total regardless of column count."""
    centers_row = df.agg(
        *[
            F.struct(
                F.avg(F.col(c).cast("double")).alias("avg"),
                (
                    F.percentile(F.col(c).cast("double"), F.lit(0.5))
                    if exact_median
                    else F.percentile_approx(F.col(c).cast("double"), F.lit(0.5), 10000)
                ).alias("median"),
            ).alias(c)
            for c in columns
        ]
    ).collect()[0]
    structs = []
    for i, c in enumerate(columns):
        x = F.col(c).cast("double")
        avg_v, med_v = centers_row[c]["avg"], centers_row[c]["median"]
        if avg_v is None or med_v is None:
            # all-null column: centers undefined, deviations are null
            structs.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit(None).cast("double").alias("mean_ad"),
                    F.lit(None).cast("double").alias("median_ad"),
                ).alias(f"__s{i}")
            )
            continue
        avg_c = F.lit(float(avg_v))
        med_c = F.lit(float(med_v))
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.avg(F.abs(x - avg_c)).alias("mean_ad"),
                (
                    F.percentile(F.abs(x - med_c), F.lit(0.5))
                    if exact_median
                    else F.percentile_approx(F.abs(x - med_c), F.lit(0.5), 10000)
                ).alias("median_ad"),
            ).alias(f"__s{i}")
        )
    row = df.agg(*structs)
    return row.select(
        F.explode(F.array(*[F.col(f"__s{i}") for i in range(len(columns))])).alias("p")
    ).select("p.*")


def is_categorical(df: DataFrame, column: str, max_distinct: int = 50) -> DataFrame:
    """Categorical test (data_stats.cpp:236): distinct <= k, sketched."""
    return df.agg(
        F.approx_count_distinct(column).alias("approx_distinct")
    ).select(
        "approx_distinct",
        (F.col("approx_distinct") <= max_distinct).alias("is_categorical"),
    )


def topk_values(df: DataFrame, column: str, k: int = 10) -> DataFrame:
    """Top-k most frequent values (GetTopKChars/Words analog, data_stats.h:167-170):
    groupBy + count + limit; Spark runs this as partial-agg + TakeOrderedAndProject
    (a distributed heap), the exact scale path for heavy hitters."""
    return (
        df.groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc_nulls_first("value"))
        .limit(k)
    )


def topk_words(df: DataFrame, column: str, k: int = 10, pattern: str = r"\s+") -> DataFrame:
    """Top-k words across a text column: split + explode + count + limit."""
    words = df.select(
        F.explode(F.split(F.trim(F.col(column)), pattern)).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(k)
    )


def entropy_and_gini(df: DataFrame, column: str) -> DataFrame:
    """Shannon entropy (nats) and Gini impurity of the value distribution
    (position_list_index.cpp:43-69 computes these on PLI cluster sizes).
    Two chained aggs over value counts -- counts are tiny after the first."""
    counts = df.groupBy(F.col(column)).agg(F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.log(F.col("cnt"))).alias("sum_clogc"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sum_c2"),
    ).select(
        (F.log(F.col("n")) - F.col("sum_clogc") / F.col("n")).alias("entropy"),
        (F.lit(1.0) - F.col("sum_c2") / (F.col("n") * F.col("n"))).alias("gini"),
    )


def monotonicity(
    df: DataFrame, value_col: str, order_col: str, num_partitions: int = 64
) -> DataFrame:
    """Is value_col sorted asc/desc when ordered by order_col
    (data_stats.h:179-180)? Works for ANY orderable type (string, date,
    numeric) -- adjacent pairs are compared with </> instead of numeric
    deltas, so no double cast. Same distributed shape as SDCheck._gaps:
    range-partition on the order column, per-partition lag windows for inner
    pairs, and a P-row (first,last) rollup stitches partition boundaries --
    no single-reducer global window."""
    d = (
        df.select(
            F.col(order_col).alias("__o"), F.col(value_col).alias("__v")
        )
        .filter(F.col("__o").isNotNull() & F.col("__v").isNotNull())
        .repartitionByRange(num_partitions, F.col("__o"))
        .sortWithinPartitions("__o")
        .withColumn("__pid", F.spark_partition_id())
    )
    w = Window.partitionBy("__pid").orderBy("__o")
    inner = d.select(
        F.lag("__v").over(w).alias("l"), F.col("__v").alias("r")
    ).filter(F.col("l").isNotNull())
    edges = d.groupBy("__pid").agg(
        F.min_by("__v", "__o").alias("first_v"),
        F.max_by("__v", "__o").alias("last_v"),
    )
    # P rows total; pmod(__pid, 1) is a non-foldable constant-0 partition key
    # (lit(0) would be pruned, resurfacing the WindowExec warning)
    wp = Window.partitionBy(F.pmod(F.col("__pid"), F.lit(1))).orderBy("__pid")
    seq = edges.withColumn("__rank", F.row_number().over(wp))
    a, b = seq.alias("a"), seq.alias("b")
    boundary = a.join(
        b, F.col("b.__rank") == F.col("a.__rank") + 1, "inner"
    ).select(F.col("a.last_v").alias("l"), F.col("b.first_v").alias("r"))
    pairs = inner.unionByName(boundary)
    return pairs.agg(
        F.coalesce(F.bool_and(F.col("r") >= F.col("l")), F.lit(True)).alias(
            "monotonic_asc"
        ),
        F.coalesce(F.bool_and(F.col("r") <= F.col("l")), F.lit(True)).alias(
            "monotonic_desc"
        ),
    )


def column_profile(
    df: DataFrame,
    numeric_columns: list[str] | None = None,
    string_columns: list[str] | None = None,
    **kw,
) -> dict[str, DataFrame]:
    """Full profile: auto-detects column classes from the schema when not given.
    Returns {'numeric': df, 'string': df} (each lazily computed, one scan each)."""
    if numeric_columns is None or string_columns is None:
        num, strs = [], []
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t in ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal") or t.startswith("decimal"):
                num.append(f.name)
            elif t == "string":
                strs.append(f.name)
        numeric_columns = numeric_columns if numeric_columns is not None else num
        string_columns = string_columns if string_columns is not None else strs
    out: dict[str, DataFrame] = {}
    if numeric_columns:
        out["numeric"] = numeric_profile(df, numeric_columns, **kw)
    if string_columns:
        out["string"] = string_profile(df, string_columns)
    return out


def format_mask_expr(col: Column) -> Column:
    """Character-class format mask of a string: uppercase runs -> 'A',
    lowercase -> 'a', digits -> '9'; everything else kept verbatim. The
    classic data-cleaning format census (e.g. a phone column masks to
    '99-999-999-9999'); ASCII classes by design so the mask is deterministic
    across engines and locales."""
    m = F.regexp_replace(col, r"[A-Z]", "A")
    m = F.regexp_replace(m, r"[a-z]", "a")
    return F.regexp_replace(m, r"[0-9]", "9")


def format_profile(df: DataFrame, column: str, k: int = 10) -> DataFrame:
    """Top-k format masks of a string column: [mask, cnt, fraction], count
    desc then mask asc (deterministic). One map-side-combinable groupBy over
    masks -- mask cardinality is tiny for real columns (that is the point of
    masking), so the census shuffle is negligible at any row count. NULL
    values mask to NULL and are counted (a null-format row in the profile)."""
    cen = (
        df.select(format_mask_expr(F.col(column)).alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = cen.agg(F.sum("cnt").alias("n"))
    return (
        cen.crossJoin(F.broadcast(tot))
        .select("mask", "cnt", (F.col("cnt") / F.col("n")).alias("fraction"))
        .orderBy(F.col("cnt").desc(), F.col("mask"))
        .limit(k)
    )


def format_conformance(
    df: DataFrame, column: str, min_fraction: float = 0.99
) -> DataFrame:
    """Single-row verdict: does one format mask cover >= min_fraction of the
    column? [n, n_masks, top_mask, top_mask_cnt, top_mask_fraction, holds].
    The profiling gate for "this column has a (de facto) format"."""
    cen = (
        df.select(format_mask_expr(F.col(column)).alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = cen.orderBy(F.col("cnt").desc(), F.col("mask")).limit(1)
    tot = cen.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("n_masks")
    )
    return (
        tot.crossJoin(F.broadcast(top))
        .select(
            F.col("n").cast("bigint").alias("n"),
            "n_masks",
            F.col("mask").alias("top_mask"),
            F.col("cnt").alias("top_mask_cnt"),
            (F.col("cnt") / F.col("n")).alias("top_mask_fraction"),
            (F.col("cnt") >= F.lit(min_fraction) * F.col("n")).alias("holds"),
        )
    )


def null_pattern_census(df: DataFrame, columns: list[str]) -> DataFrame:
    """Missingness-structure census: each row maps to a 0/1 string over
    ``columns`` (1 = NULL), then one groupBy over at most 2^k patterns.
    Reveals CORRELATED missingness (e.g. '110' dominating says two sensors
    fail together) that per-column null rates cannot. Output: [pattern, cnt,
    fraction], count desc then pattern asc. Pure sums -> mergeable across
    deltas; at 10^12 rows the shuffle carries <= 2^k rows per task."""
    if not columns:
        raise ValueError("null_pattern_census requires at least one column")
    pat = F.concat(
        *[F.when(F.col(c).isNull(), F.lit("1")).otherwise(F.lit("0")) for c in columns]
    )
    cen = df.select(pat.alias("pattern")).groupBy("pattern").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = cen.agg(F.sum("cnt").alias("n"))
    return (
        cen.crossJoin(F.broadcast(tot))
        .select("pattern", "cnt", (F.col("cnt") / F.col("n")).alias("fraction"))
        .orderBy(F.col("cnt").desc(), F.col("pattern"))
    )
