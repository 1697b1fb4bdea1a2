"""Training-data curation operators: deterministic splits, mixture sampling,
benchmark decontamination, and concat-and-chunk sequence packing.

These complete the SURVEY.md §2.8 training-data-pipeline tier next to
``pipelines/dedup.py`` (near-dup removal) and ``pipelines/text.py`` (quality
gates): after documents are validated, deduped and filtered, a pipeline still
has to (a) carve reproducible train/val/test splits, (b) hit per-source
mixture rates, (c) strip benchmark contamination, and (d) pack documents into
fixed-token training sequences.  The reference engine (Desbordante) has no
curation tier; this is net-new Spark-first surface mandated by the brief.

Scale design (the 100 TB contract for each operator):

* ``hash_split`` / ``mixture_sample`` -- zero shuffle: the split / keep
  decision is a pure per-row expression on an md5 prefix of the stable id, so
  both are narrow maps that ride whatever scan is already running.  md5 (not
  xxhash64) is deliberate: every engine agrees on it, so the SAME rows land in
  the same split when a DuckDB/Trino/pandas consumer re-derives the split.
* ``decontaminate`` -- the benchmark side is tiny by definition (eval suites
  are KBs-to-MBs); its distinct shingle set is broadcast, so the trillion-row
  training side is never shuffled -- one scan, one broadcast hash join, one
  partial-aggregated count per doc.
* ``pack_sequences`` -- exactly one shuffle, on a deterministic bin id; the
  running-token prefix sum is windowed PER BIN, so parallelism = ``num_bins``
  (size it to the cluster, e.g. 10k bins at 1000 executors) and no global
  single-task window ever exists.  Bins are independent streams of packed
  sequences, which is exactly how multi-worker training shards consume them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_split",
    "split_leakage",
    "leaked_ids",
    "mixture_sample",
    "word_ngrams",
    "decontaminate",
    "decontaminate_fuzzy",
    "semantic_contamination",
    "semantic_decontaminate",
    "pack_sequences",
    "pack_summary",
    "chunk_manifest",
    "cap_per_group",
    "hex_threshold",
    "duplicate_spans",
    "duplicate_span_stats",
    "gram_count_index",
    "merge_gram_count_index",
    "delta_duplicate_spans",
    "dsir_bucket_counts",
    "dsir_log_ratio",
    "dsir_weights",
    "dsir_select",
    "dsir_resample",
]

#: md5-prefix length used for threshold comparisons. 12 hex chars = 48 bits of
#: the hash -- fraction resolution of 2^-48, far below any real split ratio.
_PREFIX_LEN = 12


def hex_threshold(fraction: float, k: int = _PREFIX_LEN) -> str:
    """Hex string ``h`` such that ``P[md5_prefix(k) < h] == fraction`` for a
    uniform hash. ``fraction >= 1`` returns ``"g"`` which is lexicographically
    above every hex digit (always-true predicate); ``<= 0`` returns ``""``.

    Shared by the Spark operators and the SQL oracles so both sides draw the
    exact same cut points.
    """
    if fraction >= 1.0:
        return "g"
    if fraction <= 0.0:
        return ""
    return format(int(fraction * (16**k)), "0{}x".format(k))


def _md5_prefix(id_col: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit("|" + salt))), 1, _PREFIX_LEN
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic, stable train/val/test assignment by hashed id.

    ``fractions`` maps split name -> fraction in iteration order; the LAST
    split absorbs the remainder (so ``{"test": .05, "val": .05, "train": .9}``
    puts every row whose hash clears both small cuts into ``train``).  The
    assignment depends only on ``(id, salt)``: re-runs, repartitions, and
    engine changes cannot move a document across splits.
    """
    fractions = fractions or {"test": 0.05, "val": 0.05, "train": 0.90}
    names = list(fractions)
    prefix = _md5_prefix(F.col(id_col), salt)
    expr = F.lit(names[-1])
    cum = 0.0
    cuts: list[tuple[str, float]] = []
    for name in names[:-1]:
        cum += fractions[name]
        cuts.append((name, cum))
    for name, cum in reversed(cuts):
        expr = F.when(prefix < hex_threshold(cum), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-source downsampling to mixture rates.

    Keeps a row iff ``md5(id|salt) < threshold(rates[source])``; sources not in
    ``rates`` use ``default_rate``.  Upsampling (rate > 1) is out of scope --
    that is a generation step, not a filter.
    """
    prefix = _md5_prefix(F.col(id_col), salt)
    thr = F.lit(hex_threshold(default_rate))
    for src, rate in rates.items():
        thr = F.when(F.col(source_col) == src, F.lit(hex_threshold(rate))).otherwise(
            thr
        )
    return df.where(prefix < thr)


def split_leakage(
    pairs: DataFrame,
    splits: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Duplicate-leakage audit across train/val/test splits: join a
    candidate/duplicate PAIR table (any dedup tier's output) against the
    per-document split assignment and count pairs by the unordered split
    combination. A non-zero (train, val)/(train, test) row means eval
    examples have training-set duplicates -- the contamination mode a
    document-level split cannot prevent once near-dups exist.

    Returns [split_a, split_b, n_pairs] with ``split_a <= split_b``
    (pair orientation is an artifact of id order, the leak is not). Two hash
    joins on the id key: the split side is the full corpus (streamed through
    the join, never collected), the pair side is the already-bounded
    candidate output."""
    sa = splits.select(F.col(id_col).alias("__ida"), F.col(split_col).alias("__sa"))
    sb = splits.select(F.col(id_col).alias("__idb"), F.col(split_col).alias("__sb"))
    j = pairs.join(sa, F.col(id_a) == F.col("__ida"), "inner").join(
        sb, F.col(id_b) == F.col("__idb"), "inner"
    )
    return j.groupBy(
        F.least("__sa", "__sb").alias("split_a"),
        F.greatest("__sa", "__sb").alias("split_b"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


def leaked_ids(
    pairs: DataFrame,
    splits: DataFrame,
    protect: tuple[str, ...] = ("val", "test"),
    against: str = "train",
    id_col: str = "doc_id",
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The eviction list behind ``split_leakage``: distinct documents in a
    ``protect`` split that have a duplicate partner in the ``against`` split
    -- the rows to drop from eval before measuring. Returns
    [id_col, split_col]. Same two hash joins; the union of the two pair
    orientations is deduplicated by one distinct on (id, split)."""
    sa = splits.select(F.col(id_col).alias("__ida"), F.col(split_col).alias("__sa"))
    sb = splits.select(F.col(id_col).alias("__idb"), F.col(split_col).alias("__sb"))
    j = pairs.join(sa, F.col(id_a) == F.col("__ida"), "inner").join(
        sb, F.col(id_b) == F.col("__idb"), "inner"
    )
    left = j.filter(
        F.col("__sa").isin(*protect) & (F.col("__sb") == against)
    ).select(F.col("__ida").alias(id_col), F.col("__sa").alias(split_col))
    right = j.filter(
        F.col("__sb").isin(*protect) & (F.col("__sa") == against)
    ).select(F.col("__idb").alias(id_col), F.col("__sb").alias(split_col))
    return left.unionByName(right).distinct()


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined lowercase word ``n``-grams (whitespace tokens).

    Empty array when the text has fewer than ``n`` tokens; the explicit branch
    also guards ``F.sequence`` against a negative stop (which would count
    backwards, not return empty).
    """
    w = F.split(F.lower(F.trim(text)), r"\s+")
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))


def _exploded_grams(
    df: DataFrame, text_col: str, n: int, keep: list[str], with_pos: bool = False
) -> DataFrame:
    """One row per word n-gram (column ``_g``), carrying ``keep`` columns
    (plus the 1-based gram position as ``pos`` when ``with_pos``).

    Same gram strings as ``word_ngrams`` but ~20x faster: the words array is
    materialized once per row behind a Generate barrier (``explode(array(w))``)
    — without it CollapseProject re-inlines the regex split into the transform
    lambda and re-tokenizes the document once PER GRAM (measured 8.1s -> 0.4s
    on 236k grams).
    """
    w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    wdf = df.select(*keep, F.explode(F.array(w)).alias("_w"))
    idx = F.when(
        F.size("_w") >= n, F.sequence(F.lit(1), F.size("_w") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gdf = wdf.select(*keep, F.col("_w"), F.explode(idx).alias("_i"))
    pos = [F.col("_i").cast("bigint").alias("pos")] if with_pos else []
    return gdf.select(
        *keep, *pos, F.array_join(F.slice("_w", F.col("_i"), n), " ").alias("_g")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    hash_grams: bool = True,
) -> DataFrame:
    """Flag training docs sharing any word ``n``-gram with a benchmark corpus.

    Adds ``n_contaminated_grams`` (count of the doc's n-gram INSTANCES that
    appear anywhere in the benchmark) and ``contaminated``.  The benchmark's
    distinct gram set is broadcast -- the training table is scanned once and
    never shuffled.  ``hash_grams`` joins on ``xxhash64(gram)`` instead of the
    gram string (8 bytes broadcast per gram instead of ~8 words; collision
    odds at 64 bits are negligible for any real benchmark size).
    """
    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: c)
    bench = (
        _exploded_grams(benchmark, text_col, n, [])
        .select(key(F.col("_g")).alias("_gk"))
        .distinct()
    )
    grams = _exploded_grams(train, text_col, n, [id_col]).select(
        id_col, key(F.col("_g")).alias("_gk")
    )
    hits = (
        grams.join(F.broadcast(bench), "_gk")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        train.join(hits, id_col, "left")
        .withColumn(
            "n_contaminated_grams",
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0)).cast("bigint"),
        )
        .withColumn("contaminated", F.col("n_contaminated_grams") > 0)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Sliding-window document chunking (the per-document counterpart of
    :func:`pack_sequences`): split each document into windows of
    ``chunk_tokens`` whitespace tokens starting every ``chunk_tokens -
    overlap`` tokens, so consecutive chunks share ``overlap`` tokens of
    context -- the standard long-document preparation for a fixed-context
    trainer or embedding model.

    Chunk starts are ``1 + i*stride`` for ``i in 0..ceil(max(n - chunk_tokens,
    0) / stride)``: every token is covered, the tail is emitted exactly once,
    and a document shorter than one window yields a single chunk. Whitespace
    inside chunks is normalized to single spaces (tokens are re-joined).

    Zero-shuffle per-row plan: the token array is materialized once per row
    behind a Generate barrier (``explode(array(w))`` -- without it
    CollapseProject re-splits the document once per chunk), chunk indices come
    from one ``sequence``/``explode``, and every output column is a JVM slice
    of the shared array.

    Output: [id_col, chunk_id, start_token (1-based), n_tokens, text].
    """
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("chunk_documents: need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    wdf = df.select(id_col, F.explode(F.array(w)).alias("_w"))
    n = F.size("_w")
    last = F.ceil(
        F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(float(stride))
    ).cast("int")
    cdf = wdf.select(
        id_col, "_w", F.explode(F.sequence(F.lit(0), last)).alias("chunk_id")
    )
    start = F.col("chunk_id") * stride + 1
    return cdf.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("start_token"),
        F.least(F.lit(chunk_tokens), F.size("_w") - start + 1)
        .cast("bigint")
        .alias("n_tokens"),
        F.array_join(F.slice("_w", start, chunk_tokens), " ").alias("text"),
    )


def contamination_fraction(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_frac: float = 0.7,
    hash_grams: bool = True,
) -> DataFrame:
    """PaLM-style per-benchmark-item coverage contamination (Chowdhery et al.
    2022 flag a training doc when >= 70% of an eval item's 8-grams appear in
    it): unlike the any-overlap gate in :func:`decontaminate`, this attributes
    hits to a SPECIFIC eval item and tolerates incidental single-gram
    collisions -- the fraction, not the existence, of shared grams decides.

    Output: [id_col, bench_id, common_grams, n_bench_grams, frac] for pairs
    with ``frac >= min_frac``, where frac = |distinct grams of the benchmark
    item found in the train doc| / |distinct grams of the benchmark item|.
    Benchmark items with fewer than ``n`` words have no grams and never
    appear.

    Scale design: the benchmark's per-item distinct gram table (and its
    per-item size table) is benchmark-sized -> broadcast; the training scan
    explodes grams once and map-side joins the broadcast table, so the ONLY
    shuffle carries surviving (train doc, bench item) hit pairs. The distinct
    in "distinct shared grams" runs AFTER the join (count_distinct with
    map-side partials) -- never a full-corpus distinct.
    """
    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: c)
    bg = (
        _exploded_grams(benchmark, text_col, n, [id_col])
        .select(F.col(id_col).alias("bench_id"), key(F.col("_g")).alias("_gk"))
        .distinct()
        .persist()
    )
    sizes = bg.groupBy("bench_id").agg(F.count(F.lit(1)).alias("n_bench_grams"))
    tg = _exploded_grams(train, text_col, n, [id_col]).select(
        id_col, key(F.col("_g")).alias("_gk")
    )
    hits = (
        tg.join(F.broadcast(bg), "_gk")
        .groupBy(id_col, "bench_id")
        .agg(F.count_distinct("_gk").alias("common_grams"))
    )
    return (
        hits.join(F.broadcast(sizes), "bench_id")
        .withColumn("frac", F.col("common_grams") / F.col("n_bench_grams"))
        .filter(F.col("frac") >= min_frac)
        .select(id_col, "bench_id", "common_grams", "n_bench_grams", "frac")
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    hash_grams: bool = True,
) -> DataFrame:
    """Cross-document repeated passages — the SPAN-level exact-substring dedup
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), at word-n-gram granularity: every (doc, position) whose n-gram
    occurs in >= ``min_docs`` distinct documents. Document-level near-dup ops
    (MinHash/SimHash/Jaccard) cannot see this: two mostly-different pages
    sharing one boilerplate paragraph are far below any document threshold,
    yet the paragraph is memorization fuel.

    Returns (id, pos, n_docs): 1-based word position of each duplicated gram
    plus how many distinct documents carry it.

    Scale design: grams reduce to 8-byte xxhash64 keys (``hash_grams``); the
    distinct-doc count is ONE two-phase aggregation on the gram key (map-side
    partial over (gram, doc)); the join back re-shuffles only the gram frame
    — the aggregated counts side already carries the gram-key partitioning,
    which Catalyst reuses. No pair join exists anywhere: cost is linear in
    total grams, exactly the published algorithm's distributed shape.
    """
    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: c)
    grams = _exploded_grams(df, text_col, n, [id_col], with_pos=True).select(
        id_col, "pos", key(F.col("_g")).alias("_gk")
    )
    counts = (
        grams.groupBy("_gk")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    # grams feeds both the count agg and the join-back, so the text is
    # tokenized twice — deliberate: persisting the full-corpus gram frame
    # (~tokens x 24 B) costs far more than a second linear scan at 10^12-doc
    # scale. The bounded-delta variant (delta_duplicate_spans) persists.
    return grams.join(counts, "_gk").select(id_col, "pos", "n_docs")


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    hash_grams: bool = True,
) -> DataFrame:
    """Per-document duplicated-passage exposure, the gate metric over
    :func:`duplicate_spans`: how much of each document is covered by spans
    shared with other documents.

    Returns one row per input document:
      * ``n_tokens`` — whitespace tokens;
      * ``n_grams`` — word n-grams (``max(n_tokens - n + 1, 0)``);
      * ``n_dup_grams`` — grams occurring in >= min_docs docs;
      * ``dup_gram_frac`` — n_dup_grams / n_grams (0 when no grams);
      * ``covered_tokens`` — merged length of the duplicated [pos, pos+n)
        intervals (fixed-width intervals merge with one LAG: each gram adds
        ``min(n, pos - prev_pos)``, the first adds ``n``);
      * ``dup_token_frac`` — covered_tokens / n_tokens.

    The coverage window partitions by document, so skew = the single most
    duplicated document; everything else is the same linear gram pass as
    :func:`duplicate_spans`. Fractions are rounded to 9 dp (engine-portable).
    """
    spans = duplicate_spans(df, text_col, id_col, n, min_docs, hash_grams)
    w = Window.partitionBy(id_col).orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w)
    covered = F.when(gap.isNull(), F.lit(n)).otherwise(F.least(F.lit(n), gap))
    dup = spans.select(id_col, covered.alias("_cov")).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_grams"),
        F.sum("_cov").cast("bigint").alias("covered_tokens"),
    )
    toks = F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).cast("bigint")
    base = df.select(
        F.col(id_col),
        toks.alias("n_tokens"),
        F.greatest(toks - (n - 1), F.lit(0)).cast("bigint").alias("n_grams"),
    )
    out = base.join(dup, id_col, "left").select(
        id_col,
        "n_tokens",
        "n_grams",
        F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
        F.coalesce("covered_tokens", F.lit(0)).cast("bigint").alias("covered_tokens"),
    )
    frac = lambda num, den: F.round(  # noqa: E731
        F.when(F.col(den) > 0, F.col(num) / F.col(den)).otherwise(F.lit(0.0)), 9
    )
    return out.select(
        id_col,
        "n_tokens",
        "n_grams",
        "n_dup_grams",
        "covered_tokens",
        frac("n_dup_grams", "n_grams").alias("dup_gram_frac"),
        frac("covered_tokens", "n_tokens").alias("dup_token_frac"),
    )


def gram_count_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Standing state for delta span-dedup: (gram_key, n_docs) over a corpus,
    gram keys = xxhash64 of the word n-gram. Append-mergeable BY SUM as long
    as increments partition the corpus by document (every doc arrives whole
    in one batch — the crawl-increment invariant): distinct-doc counts of
    disjoint doc sets add. Store it bucketed on gram_key; each delta probe
    then co-locates for free."""
    grams = _exploded_grams(df, text_col, n, [id_col]).select(
        id_col, F.xxhash64(F.col("_g")).alias("_gk")
    )
    return grams.groupBy("_gk").agg(F.countDistinct(id_col).alias("n_docs"))


def merge_gram_count_index(index: DataFrame, delta_index: DataFrame) -> DataFrame:
    """Fold a delta's gram counts into the standing index (sum merge — valid
    under the docs-arrive-whole invariant documented on
    :func:`gram_count_index`)."""
    return (
        index.unionByName(delta_index)
        .groupBy("_gk")
        .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
    )


def delta_duplicate_spans(
    delta: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Duplicate spans of a crawl INCREMENT against a standing corpus without
    re-scanning the corpus: a delta gram is duplicated when (corpus docs
    carrying it) + (delta docs carrying it) >= ``min_docs``. Equals
    ``duplicate_spans(corpus UNION delta)`` restricted to delta docs (law
    pinned in tests), at cost linear in the DELTA's grams.

    Scale design: the delta's distinct gram-key set is broadcast to PRUNE the
    (huge) standing index down to hit grams before the join — the index is
    scanned once with a semi-join filter and never shuffled beyond the hits;
    delta-side counts are one agg over the delta's own grams.

    Returns (id, pos, n_docs) with n_docs = total distinct docs across
    corpus + delta."""
    # the delta is bounded (a crawl increment), so persist its gram frame:
    # it feeds the count agg, the broadcast prune AND the final join
    grams = (
        _exploded_grams(delta, text_col, n, [id_col], with_pos=True)
        .select(id_col, "pos", F.xxhash64(F.col("_g")).alias("_gk"))
        .persist()
    )
    delta_counts = grams.groupBy("_gk").agg(
        F.countDistinct(id_col).alias("_nd_delta")
    )
    hit_index = index.join(
        F.broadcast(delta_counts.select("_gk")), "_gk", "left_semi"
    )
    totals = (
        delta_counts.join(hit_index, "_gk", "left")
        .select(
            "_gk",
            (
                F.col("_nd_delta") + F.coalesce(F.col("n_docs"), F.lit(0))
            ).cast("bigint").alias("n_docs"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
    return grams.join(totals, "_gk").select(id_col, "pos", "n_docs")


def contamination_gram_hashes(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
):
    """Sorted int64 array of the benchmark's distinct word n-gram xxhash64
    values — the driver-side artifact behind the STATELESS streaming
    decontamination gate (streaming.py::streaming_decontaminate).  Collecting
    it is bounded by definition: eval suites are KBs-to-MBs (the same premise
    as :func:`decontaminate`'s broadcast), i.e. at most a few million 8-byte
    hashes.  Exactly the key set the batch join uses, so gate and batch check
    agree bit-for-bit."""
    import numpy as np

    rows = (
        _exploded_grams(benchmark, text_col, n, [])
        .select(F.xxhash64(F.col("_g")).alias("_gk"))
        .distinct()
        .collect()
    )
    return np.sort(np.array([r._gk for r in rows], dtype=np.int64))


def contamination_item_gram_index(
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
):
    """Per-ITEM gram index for the streaming coverage-fraction gate
    (streaming.py::streaming_contamination_fraction): the benchmark's distinct
    (gram xxhash64, item) pairs as three aligned numpy arrays --
    ``keys`` (int64, sorted; one row per distinct (gram, item) pair),
    ``items`` (int64 item INDEX aligned with keys), ``sizes`` (float64 distinct
    gram count per item index). Items with fewer than ``n`` words have no
    grams and never index. Bounded by the same eval-suites-are-small premise
    as :func:`contamination_gram_hashes`."""
    import numpy as np

    rows = (
        _exploded_grams(benchmark, text_col, n, [id_col])
        .select(F.col(id_col).alias("_bid"), F.xxhash64(F.col("_g")).alias("_gk"))
        .distinct()
        .collect()
    )
    if not rows:
        return (
            np.array([], dtype=np.int64),
            np.array([], dtype=np.int64),
            np.array([], dtype=np.float64),
        )
    ids = sorted({r._bid for r in rows})
    idx = {b: i for i, b in enumerate(ids)}
    keys = np.array([r._gk for r in rows], dtype=np.int64)
    items = np.array([idx[r._bid] for r in rows], dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    keys, items = keys[order], items[order]
    sizes = np.bincount(items, minlength=len(ids)).astype(np.float64)
    return keys, items, sizes


def decontaminate_fuzzy(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    candidate_budget: int | None = None,
    on_budget: str = "raise",
) -> DataFrame:
    """Near-duplicate decontamination: flag training docs whose shingle
    Jaccard against ANY benchmark doc is >= ``threshold``. Catches the
    contamination that :func:`decontaminate`'s exact n-gram membership misses
    — benchmark items that entered the corpus with small edits (whitespace,
    typo, paraphrase of a few words) share few exact 8-grams but keep a high
    set Jaccard.

    Built on :func:`pyspark_validator.pipelines.dedup.prefix_jaccard_join`
    (prefix-filtered exact similarity join), so the train side is never
    joined shingle-by-shingle against the benchmark — only rarest-prefix
    matches become candidates. Adds ``n_benchmark_matches``,
    ``max_benchmark_jaccard`` and ``contaminated``.
    """
    from pyspark_validator.pipelines.dedup import prefix_jaccard_join

    hits = (
        prefix_jaccard_join(
            train, benchmark, text_col=text_col, id_col=id_col, k=k,
            threshold=threshold,
            # predictable low-threshold degradation (see prefix_jaccard_join)
            candidate_budget=candidate_budget, on_budget=on_budget,
        )
        .groupBy(F.col("id_l").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_benchmark_matches"),
            F.max("jaccard").alias("max_benchmark_jaccard"),
        )
    )
    return (
        train.join(hits, id_col, "left")
        .withColumn(
            "n_benchmark_matches",
            F.coalesce(F.col("n_benchmark_matches"), F.lit(0)).cast("bigint"),
        )
        .withColumn("contaminated", F.col("n_benchmark_matches") > 0)
    )


def semantic_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_bits: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bench_id_col: str | None = None,
    broadcast_benchmark: bool = True,
    max_bucket: int = 10_000,
    probes: int = 0,
) -> DataFrame:
    """Embedding-level benchmark contamination: training rows whose embedding
    lies within ``threshold`` cosine of ANY benchmark embedding.  The semantic
    tier of the decontamination ladder -- catches paraphrase / translation /
    re-template contamination that exact 8-gram membership
    (:func:`decontaminate`) and token-set Jaccard (:func:`decontaminate_fuzzy`)
    both miss, because the rewrite shares no surface n-grams at all.

    Both corpora are bucketed by the SAME random-hyperplane LSH (identical
    ``seed`` => identical planes, so equal-direction vectors land in equal
    buckets deterministically); candidates are bucket-equality matches only and
    exact cosine verifies, so there are never false positives.  Recall is the
    usual sign-LSH trade-off governed by ``num_bits`` (a >=threshold pair is
    missed only if a hyperplane separates it); near-identical vectors --
    the contamination case -- collide with probability ~1.  ``probes`` >= 1
    multi-probes the BENCHMARK side (buckets at Hamming distance <= probes
    also match): a (1 + num_bits [+ C(num_bits,2)])x fan-out of the tiny
    broadcast side recovers one-hyperplane misses at ZERO extra cost on the
    training scan.

    Scale: with ``broadcast_benchmark=True`` (eval suites are KBs-to-MBs) the
    bucketed benchmark broadcasts and the trillion-row training side is scanned
    ONCE and never shuffled -- same contract as :func:`decontaminate`.  With a
    large benchmark, set it False: both sides shuffle on the bucket key and
    oversized benchmark buckets are dropped (``max_bucket`` skew guard, the
    :func:`~pyspark_validator.pipelines.similarity.cosine_pairs` policy).

    Returns one row per contaminated training id:
    ``(id_col, n_benchmark_matches, max_benchmark_cosine)``.
    """
    from pyspark_validator.pipelines.similarity import _explode_probes, add_lsh_bucket

    bid = bench_id_col or id_col
    tr = add_lsh_bucket(train, dim, num_bits, seed, vec_col).select(
        F.col(id_col).alias("__tid"), F.col(vec_col).alias("__tv"), "bucket"
    )
    bn = add_lsh_bucket(benchmark, dim, num_bits, seed, vec_col).select(
        F.col(bid).alias("__bid"), F.col(vec_col).alias("__bv"), "bucket"
    )
    if broadcast_benchmark:
        bn = F.broadcast(_explode_probes(bn, num_bits, probes))
    else:
        # persist: the bucketed benchmark feeds the size stats AND the join probe;
        # the skew guard sees the EXACT buckets, probing fans out after it
        bn = bn.persist()
        sizes = bn.groupBy("bucket").agg(F.count(F.lit(1)).alias("bs"))
        bn = bn.join(
            F.broadcast(sizes.filter(F.col("bs") > max_bucket)), "bucket", "left_anti"
        )
        bn = _explode_probes(bn, num_bits, probes)
    dot = F.aggregate(
        F.zip_with("__tv", "__bv", lambda a, c: a.cast("double") * c.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    nt = F.sqrt(
        F.aggregate("__tv", F.lit(0.0), lambda acc, t: acc + t.cast("double") * t.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate("__bv", F.lit(0.0), lambda acc, t: acc + t.cast("double") * t.cast("double"))
    )
    return (
        tr.join(bn, "bucket")
        .select("__tid", (dot / (nt * nb)).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .groupBy(F.col("__tid").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_benchmark_matches"),
            F.max("cosine").alias("max_benchmark_cosine"),
        )
    )


def semantic_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_bits: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bench_id_col: str | None = None,
    broadcast_benchmark: bool = True,
    max_bucket: int = 10_000,
    probes: int = 0,
) -> DataFrame:
    """Drop training rows flagged by :func:`semantic_contamination`.  The
    contaminated-id set is tiny relative to the corpus, so the final removal is
    a left-anti join AQE resolves to a broadcast."""
    hits = semantic_contamination(
        train,
        benchmark,
        dim,
        threshold=threshold,
        num_bits=num_bits,
        seed=seed,
        vec_col=vec_col,
        id_col=id_col,
        bench_id_col=bench_id_col,
        broadcast_benchmark=broadcast_benchmark,
        max_bucket=max_bucket,
        probes=probes,
    )
    return train.join(hits.select(id_col), id_col, "left_anti")


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    chunk_tokens: int = 2048,
    num_bins: int = 64,
    bin_col: Column | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: assign each doc the training chunk where its
    first token lands.

    Docs are streamed in ``id_col`` order within ``num_bins`` independent bins
    (``bin_col`` defaults to ``pmod(xxhash64(id), num_bins)``; pass e.g.
    ``F.col("doc_id") % num_bins`` when a cross-engine-reproducible bin is
    needed).  Within a bin, ``chunk_id = floor(tokens_before / chunk_tokens)``
    and ``chunk_offset = tokens_before % chunk_tokens`` -- i.e. the bin's docs
    are concatenated and sliced into ``chunk_tokens``-sized sequences; a doc
    longer than the remaining room straddles into the next chunk, which is the
    standard pretraining packing semantics (no padding, no doc drops).

    Token counts default to whitespace tokens of ``text_col``; pass
    ``token_col`` to use a precomputed count (e.g. BPE).  Adds ``pack_bin``,
    ``n_tokens``, ``chunk_id``, ``chunk_offset``.
    """
    if token_col is not None:
        tok = F.col(token_col).cast("bigint")
    else:
        t = F.trim(F.col(text_col))
        tok = (
            F.when(t.isNull() | (F.length(t) == 0), F.lit(0))
            .otherwise(F.size(F.split(t, r"\s+")))
            .cast("bigint")
        )
    if bin_col is None:
        bin_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_bins))
    out = df.withColumn("pack_bin", bin_col.cast("bigint")).withColumn(
        "n_tokens", tok
    )
    w = (
        Window.partitionBy("pack_bin")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return out.withColumn(
        "chunk_id", F.floor(before / chunk_tokens).cast("bigint")
    ).withColumn("chunk_offset", (before % chunk_tokens).cast("bigint"))


def chunk_manifest(
    packed: DataFrame,
    chunk_tokens: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Loader-ready manifest of a ``pack_sequences``/``pack_interleaved``
    result: ONE row per (chunk, document) overlap, mapping every training
    chunk back to the document token slices that fill it (a document
    straddling a chunk boundary appears once per chunk it touches -- the
    inverse view the data loader actually reads). Columns: ``pack_bin``,
    ``chunk_id``, ``id_col``, ``doc_tok_start``/``doc_tok_end`` (half-open
    slice into the doc's own token stream) and ``chunk_tok_start`` (where the
    slice lands inside the chunk). Zero-token docs occupy no chunk and emit
    no rows. Pure per-row Generate over a bounded sequence (a doc touches at
    most ceil(n_tokens/chunk_tokens)+1 chunks) -- zero additional shuffle
    after packing."""
    before = (
        F.col("chunk_id").cast("bigint") * chunk_tokens + F.col("chunk_offset")
    )
    last = F.floor((before + F.col("n_tokens") - 1) / chunk_tokens).cast("bigint")
    chunks = F.when(
        F.col("n_tokens") > 0, F.sequence(F.col("chunk_id").cast("bigint"), last)
    ).otherwise(F.array().cast("array<bigint>"))
    ex = packed.select(
        F.col(id_col),
        F.col("pack_bin"),
        F.col("n_tokens"),
        before.alias("__before"),
        F.explode(chunks).alias("__c"),
    )
    c = F.col("__c")
    b = F.col("__before")
    zero = F.lit(0).cast("bigint")
    return ex.select(
        id_col,
        "pack_bin",
        c.alias("chunk_id"),
        F.greatest(zero, c * chunk_tokens - b).cast("bigint").alias("doc_tok_start"),
        F.least(F.col("n_tokens").cast("bigint"), (c + 1) * chunk_tokens - b)
        .cast("bigint")
        .alias("doc_tok_end"),
        F.greatest(zero, b - c * chunk_tokens).cast("bigint").alias("chunk_tok_start"),
    )


def pack_summary(packed: DataFrame) -> DataFrame:
    """Per-(bin, chunk) doc and token totals of a ``pack_sequences`` result."""
    return packed.groupBy("pack_bin", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "cap",
    exact: bool = True,
) -> DataFrame:
    """Keep at most (``exact=True``) / approximately (``exact=False``) ``cap``
    documents per group -- the per-domain cap every web corpus applies so one
    hot domain cannot dominate the mixture. Selection is deterministic: rows
    win by md5(id) rank, so any engine re-derives the same survivors.

    Scale design: ``exact`` ranks by a WINDOW partitioned on the group -- one
    shuffle; a pathological group (10^10 docs on one domain) serializes its
    own partition's sort, so for trillion-row tables with mega-domains use
    ``exact=False``: per-group counts (one tiny agg, broadcast back) turn the
    cap into a per-row hash-fraction test ``md5_frac < cap / n_g`` -- zero
    windows, the big side is scanned once and never shuffled. The approximate
    mode keeps Binomial(n_g, cap/n_g) ~ cap docs (it can exceed cap by
    O(sqrt(cap)); it is a *target*, which is how production domain caps
    actually run at this scale).
    """
    if cap <= 0:
        raise ValueError("cap must be positive")
    if exact:
        w = Window.partitionBy(group_col).orderBy(
            _md5_prefix(F.col(id_col), salt), F.col(id_col)
        )
        return (
            df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= cap)
            .drop("__rk")
        )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    joined = df.join(F.broadcast(counts), on=group_col)
    # md5 prefix as a uniform fraction in [0, 1): compare against cap / n_g
    frac = (
        F.conv(_md5_prefix(F.col(id_col), salt), 16, 10).cast("double")
        / float(16**_PREFIX_LEN)
    )
    return joined.filter(
        (F.col("__n") <= cap) | (frac < cap / F.col("__n").cast("double"))
    ).drop("__n")


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"). Select raw-corpus documents
# whose hashed bag-of-ngrams distribution looks like a small target corpus:
# per-doc log importance weight = sum over the doc's (uni+bi)gram instances of
# ln p_target(bucket) - ln p_raw(bucket), buckets = hashed n-gram features,
# then Gumbel top-k sampling (without replacement, proportional to the
# softmax of the weights) with hash-derived deterministic noise.
#
# Scale design (100 TB contract): the feature space is B = 16**hex_chars
# buckets, so BOTH distributions are <= B-row frames -- the raw corpus is
# scanned once for its bucket counts (one groupBy(bucket) with map-side
# combine; the shuffle carries <= B rows per task) and once for scoring (the
# <= B-row log-ratio table is broadcast; the only shuffle is the per-doc sum,
# the same key as any per-doc aggregation). Bucket counts are sum-mergeable:
# keep them as a standing index and fold crawl increments in with
# ``merge_gram_count_index``-style unions instead of rescanning the corpus.
# Selection is orderBy().limit() = TakeOrderedAndProject (distributed heap,
# never a single-partition sort). Bucketing uses the LAST ``hex_chars`` chars
# of md5 (not xxhash64) so any engine re-derives identical features.
# ---------------------------------------------------------------------------


def _dsir_grams(
    df: DataFrame, text_col: str, id_col: str, bigrams: bool = True
) -> DataFrame:
    """One row per gram instance (``_id``, ``_g``): lowercase whitespace
    unigrams plus (optionally) space-joined bigrams. Empty documents
    contribute no rows. The words array sits behind a Generate barrier
    (``explode(array(w))``) for the same CollapseProject reason as
    ``_exploded_grams``."""
    w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    wdf = df.select(
        F.col(id_col).alias("_id"), F.explode(F.array(w)).alias("_w")
    )
    uni = F.filter(F.col("_w"), lambda t: t != "")
    grams = uni
    if bigrams:
        idx = F.when(
            F.size("_w") >= 2, F.sequence(F.lit(1), F.size("_w") - 1)
        ).otherwise(F.array().cast("array<int>"))
        bi = F.transform(idx, lambda i: F.array_join(F.slice("_w", i, 2), " "))
        grams = F.concat(uni, bi)
    return wdf.select("_id", F.explode(grams).alias("_g"))


def _dsir_bucket(gram: Column, hex_chars: int) -> Column:
    """Feature bucket id: the last ``hex_chars`` hex chars of md5(gram) --
    a uniform hash into 16**hex_chars buckets that every engine re-derives."""
    return F.substring(F.md5(gram), 32 - hex_chars + 1, hex_chars)


def dsir_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hex_chars: int = 3,
    bigrams: bool = True,
) -> DataFrame:
    """Hashed n-gram feature counts ``[bucket, cnt]`` of a corpus -- the
    sufficient statistic for both sides of DSIR. Sum-mergeable: union + one
    groupBy folds increments into a standing index."""
    g = _dsir_grams(df, text_col, id_col, bigrams)
    return g.groupBy(_dsir_bucket(F.col("_g"), hex_chars).alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def dsir_log_ratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    alpha: float = 0.5,
    hex_chars: int = 3,
) -> tuple[DataFrame, float]:
    """Per-bucket ``ln p_target(b) - ln p_raw(b)`` under additive-``alpha``
    smoothing over B = 16**hex_chars buckets. Returns ``(ratio, default)``
    where ``ratio`` is ``[bucket, log_ratio]`` over buckets seen in EITHER
    corpus (<= B rows, broadcastable by construction) and ``default`` is the
    ratio of a bucket seen in neither (a constant: the smoothing masses
    cancel to ``ln((Tr + alpha*B) / (Tt + alpha*B))``)."""
    import math

    b_total = float(16**hex_chars)
    tt = target_counts.agg(F.sum("cnt")).collect()[0][0]
    tr = raw_counts.agg(F.sum("cnt")).collect()[0][0]
    if not tt or not tr:
        raise ValueError("dsir_log_ratio: empty target or raw corpus")
    tden = float(tt) + alpha * b_total
    rden = float(tr) + alpha * b_total
    joined = target_counts.withColumnRenamed("cnt", "_ct").join(
        raw_counts.withColumnRenamed("cnt", "_cr"), "bucket", "full_outer"
    )
    ratio = joined.select(
        "bucket",
        (
            F.log((F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(alpha)) / F.lit(tden))
            - F.log((F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(alpha)) / F.lit(rden))
        ).alias("log_ratio"),
    )
    return ratio, math.log(alpha / tden) - math.log(alpha / rden)


def dsir_weights(
    raw: DataFrame,
    ratio: DataFrame,
    default_ratio: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    hex_chars: int = 3,
    bigrams: bool = True,
) -> DataFrame:
    """Per-document DSIR log importance weight: the corpus is scanned once,
    every gram instance map-side joins the broadcast <= B-row ratio table,
    and one groupBy(id) sums. Documents with no grams get ``n_grams = 0,
    logw = 0.0``. Output: ``[id_col, n_grams, logw]``."""
    g = _dsir_grams(raw, text_col, id_col, bigrams).select(
        "_id", _dsir_bucket(F.col("_g"), hex_chars).alias("bucket")
    )
    scored = g.join(F.broadcast(ratio), "bucket", "left").withColumn(
        "_lr", F.coalesce(F.col("log_ratio"), F.lit(float(default_ratio)))
    )
    agg = scored.groupBy("_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum("_lr").alias("logw"),
    )
    return (
        raw.select(F.col(id_col).alias("_id"))
        .join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"),
        )
    )


def dsir_select(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: str = "dsir",
    gumbel: bool = True,
) -> DataFrame:
    """Pick ``k`` documents from a ``dsir_weights`` frame. ``gumbel=True``
    (the paper's sampler) draws without replacement proportionally to
    ``exp(logw)`` via the Gumbel top-k trick with DETERMINISTIC noise --
    ``u = (md5_prefix(id|seed) + 0.5) / 16**12`` is a uniform in (0,1), so
    re-runs and other engines select the identical set. ``gumbel=False`` is
    the argmax variant (plain top-k by weight). Adds ``select_key``; the
    top-k is orderBy().limit() = TakeOrderedAndProject (distributed heap)."""
    if k <= 0:
        raise ValueError("k must be positive")
    key = F.col("logw")
    if gumbel:
        u = (
            F.conv(_md5_prefix(F.col(id_col), seed), 16, 10).cast("double")
            + F.lit(0.5)
        ) / float(16**_PREFIX_LEN)
        key = key + (-F.log(-F.log(u)))
    return (
        weights.withColumn("select_key", key)
        .orderBy(F.col("select_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    hex_chars: int = 3,
    alpha: float = 0.5,
    bigrams: bool = True,
    seed: str = "dsir",
    gumbel: bool = True,
) -> DataFrame:
    """End-to-end DSIR: hashed-ngram bucket counts of both corpora ->
    smoothed per-bucket log ratio -> per-doc weights -> Gumbel top-k.
    Two scans of the raw corpus total (counts + scoring); the target corpus
    (an eval suite / quality reference, KBs-to-MBs) is tiny by definition."""
    tc = dsir_bucket_counts(target, text_col, id_col, hex_chars, bigrams)
    rc = dsir_bucket_counts(raw, text_col, id_col, hex_chars, bigrams)
    ratio, default = dsir_log_ratio(tc, rc, alpha=alpha, hex_chars=hex_chars)
    w = dsir_weights(raw, ratio, default, text_col, id_col, hex_chars, bigrams)
    return dsir_select(w, k, id_col=id_col, seed=seed, gumbel=gumbel)


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 1024,
    seed: str = "",
    id_col: str = "doc_id",
    shard_col: str = "shard_id",
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global corpus shuffle + shard assignment (training-data
    export prep): training loaders want the corpus in a random-looking but
    REPRODUCIBLE order, split into a fixed number of shard files.

    Adds ``key_col`` = md5(id|seed) (the shuffle order: sorting by it is a
    seeded random permutation any engine re-derives -- same md5-everywhere
    rationale as hash_split) and ``shard_col`` = first-8-hex-digits(key) mod
    n_shards.  Pure per-row exprs, zero shuffle: the expensive part
    (physically clustering by shard and ordering within) belongs to the
    writer, which pays exactly ONE shuffle -- see :func:`write_training_shards`.
    Changing ``seed`` reshuffles every epoch deterministically.
    """
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + seed)))
    df = df.withColumn(key_col, key)
    shard = F.pmod(
        F.conv(F.substring(F.col(key_col), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_shards),
    )
    return df.withColumn(shard_col, shard)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 1024,
    seed: str = "",
    id_col: str = "doc_id",
) -> None:
    """Materialize the shuffled corpus as ``path/shard_id=*/`` parquet dirs,
    rows ordered by the shuffle key inside each shard: ONE shuffle
    (repartition on shard_id) + a sortWithinPartitions (no global sort task),
    parallelism = n_shards."""
    s = shuffle_shards(df, n_shards=n_shards, seed=seed, id_col=id_col)
    (
        s.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "shuffle_key")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(path)
    )


def temperature_rates(
    df: DataFrame,
    alpha: float = 0.3,
    target_total: int | None = None,
    source_col: str = "source",
) -> dict[str, float]:
    """Per-source keep rates for temperature-balanced mixture sampling (the
    mC4/multilingual-corpus alpha-temperature rule, Xue et al. 2021): sampling
    probability p_i ∝ n_i^alpha flattens the source distribution (alpha=1
    keeps natural proportions, alpha=0 uniform across sources).

    Realized as per-source Bernoulli keep rates with expected output size
    ``target_total`` (default: the size of the smallest source times the
    number of sources -- the largest uniform-able total):
    rate_i = min(1, target_total * p_i / n_i), ROUNDED TO 6 DP so any engine
    re-derives the identical cut points (pow/div last-ulp differences cannot
    flip a threshold). One groupBy bounded by the number of sources."""
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if target_total is None:
        target_total = min(counts.values()) * len(counts)
    z = sum(n**alpha for n in counts.values())
    return {
        s: round(min(1.0, target_total * (n**alpha / z) / n), 6)
        for s, n in counts.items()
    }


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.3,
    target_total: int | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-balanced deterministic downsampling: temperature_rates +
    mixture_sample (md5-prefix thresholds, zero shuffle on the kept scan)."""
    rates = temperature_rates(df, alpha=alpha, target_total=target_total, source_col=source_col)
    return mixture_sample(df, rates, source_col=source_col, id_col=id_col, salt=salt)


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "budget",
    approx: bool = False,
) -> DataFrame:
    """Per-source token-budget subsetting ("take <= B tokens of each source"):
    docs are ranked by md5(id|salt) (a deterministic priority any engine
    re-derives) and kept while the source's running token total INCLUDING the
    doc stays <= budget_tokens. Adds ``n_tokens``.

    Exact mode: one window shuffle, parallelism = number of sources (same
    trade as cap_per_group exact mode -- a mega-source serializes its own
    window task). ``approx=True`` is the mega-source path: keep iff the doc's
    md5 fraction < budget/source_total_tokens -- expected (not exact) budget,
    ZERO windows, the scan never shuffles (per-source totals broadcast as
    literals)."""
    toks = F.filter(F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "), lambda t: t != "")
    d = df.withColumn("n_tokens", F.size(toks).cast("long"))
    if approx:
        totals = {
            r["s"]: r["t"]
            for r in d.groupBy(F.col(source_col).alias("s"))
            .agg(F.sum("n_tokens").alias("t"))
            .collect()
        }
        thr = F.lit(hex_threshold(0.0))
        for s, t in totals.items():
            frac = round(min(1.0, budget_tokens / t), 6) if t else 1.0
            thr = F.when(F.col(source_col) == s, F.lit(hex_threshold(frac))).otherwise(thr)
        return d.where(_md5_prefix(F.col(id_col), salt) < thr)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(source_col)
        .orderBy(_md5_prefix(F.col(id_col), salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("__cum", F.sum("n_tokens").over(w))
        .where(F.col("__cum") <= budget_tokens)
        .drop("__cum")
    )
