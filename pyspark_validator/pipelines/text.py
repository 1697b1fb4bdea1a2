"""Text-analysis operators for large-scale training-data pipelines.

All pure built-in Column expressions (JVM-side, whole-stage codegen; zero Python)
so every operator composes with the validation checks in one scan:

  * token counting   -- whitespace tokens + a BPE-ish regex token count,
  * quality scoring  -- length / punctuation / stopword / uppercase ratios + a
                        composite [0,1] score,
  * language ID      -- stopword-marker n-gram heuristic over {en,de,fr,es,it},
  * fingerprinting   -- normalized-content hash + min-shingle rolling fingerprint.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "non", "sono", "una"],
}

#: BPE-ish token pattern: letter runs, digit runs, or single non-space symbols --
#: approximates subword pre-tokenization (GPT-2-style split) without a vocab.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t.isNull(), None).when(F.length(t) == 0, 0).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_token_count(text: Column) -> Column:
    return F.when(
        text.isNull(), None
    ).otherwise(F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.withColumn("n_ws_tokens", whitespace_token_count(t)).withColumn(
        "n_bpe_tokens", bpe_token_count(t)
    )


def _stopword_hits(text_lower: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(text_lower, F.lit(pat))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds lang (argmax of per-language stopword-marker count; 'und' when no
    marker fires) and lang_score (hits of winning language / token count).

    One letter-run tokenization (split on ``[^a-z]+``) + array filters per
    language: equivalent to counting ``\\b(marker)\\b`` regex matches but ~10x
    cheaper than five alternation-regex scans of the full text (java.regex
    backtracking); everything stays in whole-stage codegen."""
    langs = list(_STOPWORDS)
    toks = F.split(F.lower(F.col(text_col)), r"[^a-z]+")
    # argmax via array_max over (score, -priority, lang) structs: ONE expression
    # tree, no per-language when-chain (a when-chain re-inlines every score under
    # each branch and the generated code explodes combinatorially).
    entries = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS[lang]))).alias("score"),
            F.lit(-i).alias("nprio"),  # max(-i) => earliest language wins ties
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    # explode-of-one is a Generate barrier: CollapseProject cannot inline the
    # score computation into every downstream reference, so it runs once per row.
    out = df.withColumn("__best", F.explode(F.array(best)))
    tokc = whitespace_token_count(F.col(text_col))
    return (
        out.withColumn(
            "lang",
            F.when(F.col("__best.score") > 0, F.col("__best.lang")).otherwise("und"),
        )
        .withColumn(
            "lang_score",
            F.when(tokc > 0, F.col("__best.score").cast("double") / tokc).otherwise(
                F.lit(0.0)
            ),
        )
        .drop("__best")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-document quality features + composite quality in [0,1].

    Features (cheap, language-agnostic): n_chars, n_ws_tokens, mean_word_len,
    punct_ratio, upper_ratio, digit_ratio, stopword_ratio (en markers),
    repetition_ratio (1 - distinct/total words). Composite = product of soft
    gates, the usual web-corpus heuristic shape (Gopher/C4-style rules).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = whitespace_token_count(t)
    punct = F.regexp_count(t, F.lit(r"[!-/:-@\[-`{-~]"))
    upper = F.regexp_count(t, F.lit(r"[A-Z]"))
    digit = F.regexp_count(t, F.lit(r"[0-9]"))
    stop = _stopword_hits(F.lower(t), _STOPWORDS["en"])
    words = F.split(F.trim(t), r"\s+")
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(words)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    safe = lambda c: F.when(n_chars > 0, c.cast("double") / n_chars).otherwise(F.lit(0.0))  # noqa: E731
    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_ws_tokens", n_tok)
        .withColumn(
            "mean_word_len",
            F.when(n_tok > 0, (n_chars - (n_tok - 1)).cast("double") / n_tok).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn("punct_ratio", safe(punct))
        .withColumn("upper_ratio", safe(upper))
        .withColumn("digit_ratio", safe(digit))
        .withColumn(
            "stopword_ratio",
            F.when(n_tok > 0, stop.cast("double") / n_tok).otherwise(F.lit(0.0)),
        )
        .withColumn("repetition_ratio", F.lit(1.0) - distinct_ratio)
    )
    # soft gates: reasonable length, low punct/digit noise, some stopwords, low repetition
    gate = (
        F.least(F.col("n_ws_tokens").cast("double") / 5.0, F.lit(1.0))
        * F.least(F.lit(1.0), F.lit(3.0) * (F.lit(1.0) - F.col("punct_ratio")) - F.lit(2.0))
        * F.least(F.lit(1.0), F.lit(3.0) * (F.lit(1.0) - F.col("digit_ratio")) - F.lit(2.0))
        * F.least(F.lit(1.0), F.lit(0.5) + F.lit(2.0) * F.col("stopword_ratio"))
        * F.greatest(F.lit(0.0), F.lit(1.0) - F.col("repetition_ratio"))
    )
    return out.withColumn("quality", F.greatest(F.lit(0.0), F.least(F.lit(1.0), gate)))


def normalize_text(text: Column) -> Column:
    """Canonical content normalization for fingerprinting/dedup: lowercase,
    collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str = "text", shingle_k: int = 5) -> DataFrame:
    """Adds content_fp (xxhash64 of normalized text -- exact-dup key) and
    min_shingle_fp (min over word-k-shingle hashes -- a 1-permutation MinHash,
    the rolling-hash document fingerprint)."""
    norm = normalize_text(F.col(text_col))
    words = F.split(norm, " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - shingle_k, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, shingle_k), " ")
    )
    return df.withColumn("content_fp", F.xxhash64(norm)).withColumn(
        "min_shingle_fp",
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s))),
    )


def line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 4,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
) -> DataFrame:
    """C4-style line-level boilerplate filter + Gopher doc gates.

    Line rules (C4, Raffel et al. 2020 sec. 2.2): keep a line iff it ends in
    terminal punctuation ('.', '!', '?', '"'), has >= ``min_words``
    whitespace words, and does not mention javascript/cookie/privacy-policy
    boilerplate. Doc rules: drop docs containing "lorem ipsum" or "{" (C4),
    or with > ``max_bullet_ratio`` bullet-started lines or
    > ``max_ellipsis_ratio`` "..."-ended lines (Gopher, Rae et al. 2021
    repetition gates).

    Pure JVM array lambdas (split -> filter -> array_join): one scan, no
    shuffle, composes with every other per-document operator. Adds
    [n_lines, n_kept_lines, n_bullet_lines, n_ellipsis_lines, keep_doc,
    clean_text].
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def keep_line(l):
        trimmed = F.trim(l)
        words = F.size(F.split(trimmed, r"\s+"))
        low = F.lower(l)
        return (
            trimmed.rlike(r'[.!?"]$')
            & (words >= F.lit(min_words))
            & ~low.contains("javascript")
            & ~low.contains("cookie")
            & ~low.contains("privacy policy")
        )

    kept = F.filter(lines, keep_line)
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
    n_ellipsis = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$")))
    low_doc = F.lower(t)
    keep_doc = (
        ~low_doc.contains("lorem ipsum")
        & ~t.contains("{")
        & (n_bullet <= F.lit(max_bullet_ratio) * n_lines)
        & (n_ellipsis <= F.lit(max_ellipsis_ratio) * n_lines)
    )
    return (
        df.withColumn("n_lines", n_lines.cast("long"))
        .withColumn("n_kept_lines", F.size(kept).cast("long"))
        .withColumn("n_bullet_lines", n_bullet.cast("long"))
        .withColumn("n_ellipsis_lines", n_ellipsis.cast("long"))
        .withColumn("keep_doc", keep_doc)
        .withColumn("clean_text", F.array_join(kept, "\n"))
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", top_n: int = 2, dup_n: int = 5
) -> DataFrame:
    """Gopher-style repetition gates (Rae et al. 2021, Table A1), zero-shuffle.

    Adds per document:
      * dup_line_frac       -- 1 - distinct lines / lines,
      * dup_line_char_frac  -- chars on repeated lines / chars on all lines,
      * top_ngram_char_frac -- chars covered by the most frequent word
                               ``top_n``-gram (count * gram length / non-space
                               chars); ties break to the lexicographically
                               smallest gram,
      * dup_ngram_frac      -- 1 - distinct / total word ``dup_n``-grams
                               (count-level simplification of Gopher's
                               char-level duplicate n-gram mass).

    All pure JVM array lambdas: the mode-of-array is a run-length scan over
    the SORTED gram array via F.aggregate -- no explode, no shuffle, so the
    operator composes with every other per-document expression in one scan.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_dist_lines = F.size(F.array_distinct(lines))
    chars_of = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    total_line_chars = chars_of(lines)
    dist_line_chars = chars_of(F.array_distinct(lines))

    words = F.split(F.trim(F.regexp_replace(t, r"\s+", " ")), " ")
    n_words = F.size(words)

    def grams(n: int):
        # sequence(0, stop) runs BACKWARDS when stop < 0 -- guard short docs
        # with an explicit empty array instead
        return F.when(
            n_words >= n,
            F.transform(
                F.sequence(F.lit(0), n_words - n),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    sorted_top = F.array_sort(grams(top_n))
    # run-length scan: (prev, run, best_run, best_gram); strict > keeps the
    # first (= smallest) gram among ties
    scan = F.aggregate(
        sorted_top,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best_run"),
            F.lit("").alias("best_gram"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["best_run"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            )
            .otherwise(acc["best_run"])
            .alias("best_run"),
            F.when(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["best_run"],
                x,
            )
            .otherwise(acc["best_gram"])
            .alias("best_gram"),
        ),
    )
    # CollapseProject would re-inline the aggregate once per consumer; pin it
    # behind a Generate barrier (see language_id note)
    df = df.withColumn("__scan", F.explode(F.array(scan)))
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    gram_chars = F.length(F.regexp_replace(F.col("__scan.best_gram"), " ", ""))
    dup_grams = grams(dup_n)
    frac = lambda num, den: F.when(  # noqa: E731
        den > 0, num.cast("double") / den
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("n_lines", n_lines.cast("long"))
        .withColumn("dup_line_frac", frac((n_lines - n_dist_lines), n_lines))
        .withColumn(
            "dup_line_char_frac",
            frac(total_line_chars - dist_line_chars, total_line_chars),
        )
        .withColumn("top_ngram", F.col("__scan.best_gram"))
        .withColumn(
            "top_ngram_char_frac",
            frac(F.col("__scan.best_run") * gram_chars, nonspace),
        )
        .withColumn(
            "dup_ngram_frac",
            frac(
                F.size(dup_grams) - F.size(F.array_distinct(dup_grams)),
                F.size(dup_grams),
            ),
        )
        .drop("__scan")
    )


#: PII patterns, shared by detection and redaction. Deliberately restricted to
#: syntax valid in BOTH Java regex (Spark) and RE2-ish engines (DuckDB oracle):
#: no backrefs, no lookaround.
PII_PATTERNS = {
    "url": r"https?://[^\s]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d -]{7,}\d",
}
#: Redaction order: URLs first (may embed emails/digits), then emails, then
#: IPs, then the greedy phone heuristic.
_PII_ORDER = ["url", "email", "ipv4", "phone"]


def pii_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII counts (n_url / n_email / n_ipv4 / n_phone) -- pure
    regexp_count exprs, one scan. The phone pattern is a digit-run heuristic
    (>= 9 digits with optional spaces/hyphens), counted AFTER conceptually
    removing URLs/emails/IPs so an IP's octets don't double-count as a phone."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    stripped = t
    for kind in _PII_ORDER:
        pat = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(stripped, F.lit(pat)).cast("long")
        )
        stripped = F.regexp_replace(stripped, pat, " ")
    return out


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Replace each PII match with a typed token (<URL>/<EMAIL>/<IPV4>/<PHONE>)
    in redaction order. One scan, chained JVM regexp_replace."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    for kind in _PII_ORDER:
        t = F.regexp_replace(t, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return df.withColumn(out_col, t)


def _lm_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) rows: normalized words, empty tokens dropped (an empty or
    whitespace-only document contributes no rows)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
    )


def train_unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    alpha: float = 0.5,
) -> tuple[DataFrame, float]:
    """Train an additive-smoothed unigram LM over a reference corpus -- the
    deterministic stand-in for the CCNet/Gopher KenLM perplexity filter
    (Wenzek et al. 2020): documents far from the reference distribution score
    a high negative log-likelihood and get gated.

    Returns ``(lm, oov_logp)`` where ``lm`` is [token, cnt, logp] for the
    ``vocab_size`` most frequent tokens (ties broken by token asc, so any
    engine re-derives the same vocabulary) with
    ``logp = ln((cnt + alpha) / (total + alpha * (V + 1)))``
    over the FULL token total (suffix mass lands in OOV), and ``oov_logp``
    uses cnt = 0. ``V = min(vocab_size, distinct tokens)``.

    Scale: tokenize + one groupBy(token) with map-side combine; the top-V cap
    is ``orderBy().limit()`` = TakeOrderedAndProject (distributed heap, no
    single-partition window); total/V are one scalar agg. The returned lm is
    vocab_size rows -- broadcastable by construction.
    """
    counts = _lm_tokens(df, text_col, id_col).groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    counts = counts.persist()
    tot_row = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vdist")
    ).collect()[0]
    total = int(tot_row["total"] or 0)
    v = min(int(tot_row["vdist"]), vocab_size)
    denom = total + alpha * (v + 1)
    if total == 0:
        raise ValueError("train_unigram_lm: reference corpus has no tokens")
    import math

    lm = (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
        .withColumn(
            "logp", F.log((F.col("cnt") + F.lit(alpha)) / F.lit(denom))
        )
    )
    return lm, math.log(alpha / denom)


def unigram_nll(
    df: DataFrame,
    lm: DataFrame,
    oov_logp: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean negative log-likelihood under a unigram LM from
    :func:`train_unigram_lm` -- the quality signal of the perplexity filter
    (nll = ln(perplexity); gate on a band, e.g. Wikipedia-like 300..1000 ppl).

    Plan: tokenize -> broadcast join the (<= vocab_size)-row lm on the token
    key (map-side; the corpus scan never shuffles for scoring) -> one
    groupBy(id). Documents with zero tokens return n_tokens = 0, nll = NULL.

    Output: [id_col, n_tokens, nll].
    """
    tok = _lm_tokens(df, text_col, id_col)
    scored = tok.join(
        F.broadcast(lm.select("token", "logp")), on="token", how="left"
    ).withColumn("lp", F.coalesce(F.col("logp"), F.lit(float(oov_logp))))
    agg = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.avg(-F.col("lp")).alias("nll")
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(agg, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.col("nll"),
        )
    )


def lm_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    alpha: float = 0.5,
) -> DataFrame:
    """Self-trained perplexity scoring: train the unigram LM on ``df`` itself
    and score every document against it (outlier documents -- wrong language,
    binary junk, boilerplate floods -- sit in the nll tail even when the
    reference corpus IS the corpus being filtered)."""
    lm, oov = train_unigram_lm(df, text_col, id_col, vocab_size, alpha)
    return unigram_nll(df, lm, oov, text_col, id_col)


def compression_signals(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """Deflate-ratio quality signal (the Gopher/RefinedWeb compression
    heuristic: machine-generated or boilerplate-heavy text compresses far
    below natural prose, keyword-stuffed spam above it).

    Adds ``raw_bytes`` (utf-8 octet length, JVM-side), ``zlib_bytes`` and
    ``zlib_ratio`` = zlib_bytes / raw_bytes (null for empty docs).

    The compressor runs inside ONE Arrow-batched pandas UDF -- the per-element
    call dispatches straight into zlib's C deflate, the same shape as the
    other sanctioned non-vectorizable kernels (SURVEY §2.8); everything else
    stays in whole-stage codegen.  zlib output for a fixed level is stable in
    practice, but treat the ratio as a SIGNAL (thresholds tuned per corpus),
    not a cross-engine-reproducible key."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _clen(s: pd.Series) -> pd.Series:
        return s.fillna("").map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
        )

    raw = F.octet_length(F.col(text_col))
    return (
        df.withColumn("raw_bytes", raw.cast("long"))
        .withColumn("zlib_bytes", _clen(F.col(text_col)))
        .withColumn(
            "zlib_ratio",
            F.when(
                F.col("raw_bytes") > 0,
                F.col("zlib_bytes").cast("double") / F.col("raw_bytes"),
            ),
        )
    )


def token_census(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token census [token, cnt]: normalized words (normalize_text),
    one map-side-combinable groupBy. The reusable partial for Zipf/vocabulary
    analyses -- sum-mergeable across deltas like every census in this engine."""
    toks = df.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token")
    ).filter(F.col("token") != "")
    return toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))


def zipf_signals(
    df: DataFrame,
    text_col: str = "text",
    max_rank: int = 1000,
    min_count: int = 1,
    slope_band: tuple[float, float] | None = (-1.5, -0.7),
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS of ln(freq) on ln(rank)
    over the top ``max_rank`` types. Natural corpora fit slope ~ -1 (Zipf
    1949); a collapsed slope is a canonical corpus-quality alarm -- template
    farms / boilerplate floods flatten the head, dedup artifacts or synthetic
    text steepen it. The same census drives vocabulary drift between
    snapshots.

    Scale design: ONE shuffle builds the token census (groupBy(token), map-
    side combine absorbs stopword-class hot keys); the fit reads only the
    top-``max_rank`` rows via orderBy(cnt desc, token).limit(k) -- Spark's
    TakeOrderedAndProject, a distributed per-partition heap, NOT a global
    sort -- so the un-partitioned rank window that follows runs over <= k
    rows. The full census is never windowed.

    Output (single row): [n_tokens, n_types, n_ranks_fit, top1_share,
    zipf_slope, zipf_intercept, r2, holds]. ``holds`` gates the slope inside
    ``slope_band`` (None = informational, always true).
    """
    cen = token_census(df, text_col)
    if min_count > 1:
        cen = cen.filter(F.col("cnt") >= min_count)
    totals = cen.agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.max("cnt").alias("max_cnt"),
    )
    head = cen.orderBy(F.col("cnt").desc(), F.col("token")).limit(max_rank)
    w = Window.partitionBy(F.pmod(F.col("cnt"), F.lit(1))).orderBy(
        F.col("cnt").desc(), F.col("token")
    )  # <= max_rank rows; pmod keeps Catalyst from folding the partition key
    ranked = head.withColumn("rank", F.row_number().over(w))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    sums = ranked.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    m = F.col("m").cast("double")
    cov = m * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = m * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = m * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.try_divide(cov, varx)
    intercept = (F.col("sy") - slope * F.col("sx")) / m
    r2 = F.try_divide(cov * cov, varx * vary)
    out = totals.crossJoin(sums).select(
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.col("m").cast("bigint").alias("n_ranks_fit"),
        (F.col("max_cnt") / F.col("n_tokens")).alias("top1_share"),
        slope.alias("zipf_slope"),
        intercept.alias("zipf_intercept"),
        r2.alias("r2"),
    )
    holds = (
        F.lit(True)
        if slope_band is None
        else F.col("zipf_slope").between(slope_band[0], slope_band[1])
    )
    return out.withColumn("holds", holds)


def vocab_drift(
    baseline: DataFrame,
    current: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    jsd_threshold: float = 0.1,
    new_mass_threshold: float = 0.2,
) -> DataFrame:
    """Vocabulary drift between two corpus snapshots from their token
    censuses: type turnover (new / vanished / shared types), the token-mass
    share of NEW types in the current snapshot (OOV-vs-baseline rate -- the
    signal a frozen tokenizer cares about), and the Jensen-Shannon divergence
    (log2) between the two unigram distributions over the union vocabulary.

    Scale: two census shuffles (map-side combinable) + ONE full-outer join
    keyed by token, bounded by vocabulary size, never by corpus size;
    ``min_count`` prunes the hapax tail first, which is where web-scale
    vocabularies hide their bulk.

    Output (single row): [n_tokens_b, n_tokens_c, n_types_b, n_types_c,
    n_new_types, n_vanished_types, n_shared_types, new_type_mass,
    vanished_type_mass, jsd, drift_detected].
    """
    cb = token_census(baseline, text_col)
    cc = token_census(current, text_col)
    if min_count > 1:
        cb = cb.filter(F.col("cnt") >= min_count)
        cc = cc.filter(F.col("cnt") >= min_count)
    j = (
        cb.withColumnRenamed("cnt", "cnt_b")
        .join(cc.withColumnRenamed("cnt", "cnt_c"), "token", "full_outer")
        .fillna(0, subset=["cnt_b", "cnt_c"])
    )
    tot = j.agg(
        F.sum("cnt_b").alias("n_b"), F.sum("cnt_c").alias("n_c")
    )
    t = j.crossJoin(F.broadcast(tot))
    p = F.col("cnt_b") / F.col("n_b")
    q = F.col("cnt_c") / F.col("n_c")
    m = (p + q) / 2
    ln2 = F.lit(0.6931471805599453)
    term_p = F.when(F.col("cnt_b") > 0, p * F.log(p / m) / ln2).otherwise(F.lit(0.0))
    term_q = F.when(F.col("cnt_c") > 0, q * F.log(q / m) / ln2).otherwise(F.lit(0.0))
    new = (F.col("cnt_b") == 0) & (F.col("cnt_c") > 0)
    van = (F.col("cnt_b") > 0) & (F.col("cnt_c") == 0)
    out = t.agg(
        F.max("n_b").alias("n_tokens_b"),
        F.max("n_c").alias("n_tokens_c"),
        F.sum((F.col("cnt_b") > 0).cast("long")).alias("n_types_b"),
        F.sum((F.col("cnt_c") > 0).cast("long")).alias("n_types_c"),
        F.sum(new.cast("long")).alias("n_new_types"),
        F.sum(van.cast("long")).alias("n_vanished_types"),
        F.sum(((F.col("cnt_b") > 0) & (F.col("cnt_c") > 0)).cast("long")).alias(
            "n_shared_types"
        ),
        F.sum(F.when(new, q).otherwise(0.0)).alias("new_type_mass"),
        F.sum(F.when(van, p).otherwise(0.0)).alias("vanished_type_mass"),
        ((F.sum(term_p) + F.sum(term_q)) / 2).alias("jsd"),
    )
    return out.withColumn(
        "drift_detected",
        (F.col("jsd") > jsd_threshold)
        | (F.col("new_type_mass") > new_mass_threshold),
    )
