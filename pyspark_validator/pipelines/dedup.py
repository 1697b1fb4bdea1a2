"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (10^12 docs):
  * exact: ONE groupBy on the normalized-content hash -- the cheapest possible
    shuffle (8-byte key), min(doc_id) as the canonical representative.
  * n-gram Jaccard: candidate pairs ONLY for docs sharing a shingle; shingles with
    document frequency > ``max_df`` are dropped first (stopword-shingle skew guard
    -- the classic hot-key salting alternative: drop, don't salt, because a shingle
    shared by millions of docs carries no dedup signal).
  * MinHash+LSH: k xxhash64 permutations -> signature; b bands of r rows; band
    hash join => candidates; exact Jaccard verification on candidates only.
  * SimHash: 64 weighted-bit majority over token hashes, banded for candidate
    generation, verified by Hamming distance (bit_count(xor)).
  * embedding cosine: delegated to pipelines.similarity LSH buckets.

Everything is DataFrame ops + built-in functions; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark_validator.pipelines.text import normalize_text


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate clusters by normalized content hash.
    Output: [content_fp, cluster_size, representative (min id), members (capped 20)].
    """
    fp = F.xxhash64(normalize_text(F.col(text_col))).alias("content_fp")
    return (
        df.select(fp, F.col(id_col).alias("id"))
        .groupBy("content_fp")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("id").alias("representative"),
            F.slice(F.sort_array(F.collect_list("id")), 1, 20).alias("members"),
        )
        .filter(F.col("cluster_size") > 1)
    )


def exact_duplicate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_cluster: int = 10_000,
) -> DataFrame:
    """All exact-duplicate pairs (``id_a < id_b``) by normalized content hash
    -- the pair-level view downstream audits (split leakage, provenance
    conflict) consume. Self-equi-join on the 8-byte fingerprint, never a
    cartesian: join fan-out is exactly the pair count. A degenerate cluster
    (the same boilerplate page crawled millions of times) would emit
    quadratic pairs, so clusters above ``max_cluster`` members are dropped
    from the PAIR view (the drop-not-salt guard every candidate generator
    here uses; the cluster itself still surfaces via ``exact_duplicates``)."""
    keyed = df.select(
        F.xxhash64(normalize_text(F.col(text_col))).alias("__fp"),
        F.col(id_col).alias("__id"),
    )
    sizes = keyed.groupBy("__fp").agg(F.count(F.lit(1)).alias("__n"))
    ok = sizes.filter((F.col("__n") > 1) & (F.col("__n") <= max_cluster)).select("__fp")
    # no forced broadcast: the duplicate-fingerprint set scales with the dup
    # rate, not a constant -- AQE picks broadcast when it actually fits
    keyed = keyed.join(ok, on="__fp", how="inner")
    a = keyed.select(F.col("__fp"), F.col("__id").alias("id_a"))
    b = keyed.select(F.col("__fp").alias("__fp2"), F.col("__id").alias("id_b"))
    return a.join(
        b, (F.col("__fp") == F.col("__fp2")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per normalized content: window rank over the hash --
    a single shuffle, no join."""
    w = Window.partitionBy(F.xxhash64(normalize_text(F.col(text_col)))).orderBy(
        F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _shingles(text: Column, k: int) -> Column:
    """Word k-shingles of normalized text (distinct, order-free set semantics)."""
    words = F.split(normalize_text(text), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    )


def _inverted_common(
    df: DataFrame, text_col: str, id_col: str, k: int, max_df: int
) -> DataFrame:
    """Shared inverted-index pair generator: [id_a, id_b, common, n_a, n_b]
    for every co-shingled pair (id_a < id_b), where common counts shared
    distinct word-k-shingles and n_* are the full shingle-set sizes.

    Plan: explode distinct shingles -> drop shingles with doc-frequency >
    max_df (skew guard; dropping can only LOWER common, so threshold filters
    downstream stay sound one-sidedly) -> self-join on the 8-byte shingle
    hash -> per-pair count. Only co-shingled pairs are ever materialized.
    """
    # the doc table often arrives as ONE small parquet file -> spread the
    # (expensive) shingling across the cluster before exploding; persist the
    # shingle table because three downstream passes (sizes, doc-freq, join)
    # would otherwise re-shingle from scratch.
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.repartition(par)
        .select(
            F.col(id_col).alias("id"),
            F.explode(_shingles(F.col(text_col), k)).alias("shingle"),
        )
        .withColumn("sh", F.xxhash64("shingle"))
        .drop("shingle")
        .persist()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    df_freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_cnt"))
    pruned = sh.join(
        F.broadcast(df_freq.filter(F.col("df_cnt") > max_df)), on="sh", how="left_anti"
    )
    a = pruned.alias("a")
    b = pruned.alias("b")
    common = (
        a.join(b, on=(F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return common.join(
        sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"),
        on="id_a",
    ).join(
        sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"),
        on="id_b",
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.7,
    max_df: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard >= threshold).

    Plan: :func:`_inverted_common` candidate pairs -> jaccard via
    |A|+|B|-common. Candidate generation touches only co-shingled pairs.
    """
    return (
        _inverted_common(df, text_col, id_col, k, max_df)
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_df: int = 1000,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle-set CONTAINMENT (the overlap
    coefficient |A∩B| / min(|A|,|B|)): catches a short document quoted
    verbatim inside a much longer one -- a pair symmetric Jaccard provably
    misses (J <= |A|/|B| no matter how complete the quotation), yet exactly
    the shape of boilerplate inclusion and article-in-aggregator duplication
    in web corpora.

    Same candidate generator as :func:`ngram_jaccard_pairs` (inverted shingle
    index, max_df hot-shingle drop); prefix filtering cannot prune this
    predicate (containment gives no lower bound on the larger side's overlap
    fraction), so max_df is the scale lever.

    Output: [id_a, id_b, containment, jaccard] with id_a < id_b,
    containment >= threshold (jaccard carried for triage).
    """
    return (
        _inverted_common(df, text_col, id_col, k, max_df)
        .withColumn(
            "containment", F.col("common") / F.least(F.col("n_a"), F.col("n_b"))
        )
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signature per doc: num_hashes permutations via seeded xxhash64 over
    the shingle set. One explode + one groupBy with num_hashes min() aggs (all
    map-side combinable). Output: [id, sig: array<long>]."""
    par = df.sparkSession.sparkContext.defaultParallelism
    # signature = per-doc elementwise min over the shingle-hash set, computed
    # entirely within the row: NO explode, NO groupBy, ZERO shuffle. The shingle
    # string is hashed ONCE (xxhash64 of a long re-hash per permutation is a few
    # multiplies); explode-of-one is a Generate barrier so the shingle-hash array
    # is materialized once instead of being re-inlined into all num_hashes
    # array_min branches by CollapseProject.
    hs = F.transform(_shingles(F.col(text_col), k), lambda s: F.xxhash64(s))
    base = df.repartition(par).select(
        F.col(id_col).alias("id"), F.explode(F.array(hs)).alias("__hs")
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(F.col("__hs"), lambda h: F.xxhash64(h, i))
        ),
    )
    return base.select("id", sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    verify: bool = True,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH banding.

    bands=16 x rows=4 over 64 hashes => s-curve threshold ~ (1/16)^(1/4) ~ 0.5.
    Candidates = pairs sharing any band bucket (buckets larger than ``max_bucket``
    are dropped -- degenerate content floods a bucket and would square).
    verify=True recomputes exact shingle Jaccard on candidates and filters by
    ``threshold``; verify=False returns candidates with estimated similarity
    (signature agreement fraction).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # persist: the signature frame feeds the banded explode AND the two
    # candidate sig joins below -- without it the signatures compute 3x.
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes).persist()
    # Banded rows carry ONLY (id, band, bucket): the self-join input is the
    # corpus x bands frame, and riding the num_hashes-long signature array
    # through that shuffle multiplies it by ~25x (measured: ~70 GB per join
    # side at 8M docs x 16 bands -- it filled the soak host's disk). The
    # signatures rejoin AFTER candidate generation, at candidate-pair scale.
    banded = _band_explode(sig, bands, r, keep_sig=False)
    # skew guard: drop degenerate buckets
    bucket_sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("bs"))
    banded = banded.join(
        F.broadcast(bucket_sizes.filter(F.col("bs") > max_bucket)),
        on=["band", "bucket"],
        how="left_anti",
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=(F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        cand.join(
            sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
            on="id_a",
        ).join(
            sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            on="id_b",
        )
    )
    est = cand.withColumn(
        "est_jaccard",
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / F.lit(num_hashes),
    ).select("id_a", "id_b", "est_jaccard")
    if not verify:
        return est
    est = est.persist()  # feeds the candidate-id scan and the verify join
    # exact verification proportional to CANDIDATES, not the corpus: join each
    # candidate pair to the two docs' shingle-hash sets and intersect them --
    # the whole point of LSH is that the expensive exact pass never touches
    # non-candidate pairs.
    cand_ids = (
        est.select(F.explode(F.array("id_a", "id_b")).alias("id")).distinct()
    )
    shsets = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .join(cand_ids, on="id", how="left_semi")  # shingle ONLY candidate docs
        .select(
            "id",
            F.array_distinct(
                F.transform(_shingles(F.col("__t"), k), lambda s: F.xxhash64(s))
            ).alias("shset"),
        )
    )
    sa = shsets.select(F.col("id").alias("id_a"), F.col("shset").alias("sa"))
    sb = shsets.select(F.col("id").alias("id_b"), F.col("shset").alias("sb"))
    joined = est.join(sa, on="id_a").join(sb, on="id_b")
    common = F.size(F.array_intersect("sa", "sb"))
    jac = common / (F.size("sa") + F.size("sb") - common)
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard", "est_jaccard")
    )


def _band_explode(sig: DataFrame, bands: int, r: int, keep_sig: bool = True) -> DataFrame:
    """Explode a [id, sig] frame to one row per (id, band, bucket): bucket =
    xxhash64 of the band's r signature slots. Shared by the self-join pair
    generator and the standing delta-dedup index."""
    cols = ["id", "sig"] if keep_sig else ["id"]
    return sig.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.col("sig")[b * r + j] for j in range(r)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(*cols, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Standing LSH index of a corpus: one row per (id, band, bucket) -- the
    precomputable, append-only state that makes delta dedup cheap. Build it
    ONCE over the 10^12-doc corpus, store it bucketed on (band, bucket)
    (:func:`pyspark_validator.io.write_bucketed`), append each ingested delta's
    rows, and every future :func:`delta_minhash_pairs` probe joins it
    shuffle-free. Signature arrays are dropped (storage = 3 longs/row);
    exact verification re-shingles only candidate docs."""
    assert num_hashes % bands == 0
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes)
    return _band_explode(sig, bands, num_hashes // bands, keep_sig=False)


def delta_minhash_pairs(
    corpus: DataFrame,
    delta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int = 10_000,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus near-duplicate pairs (delta doc, corpus doc): dedup a crawl
    increment against a standing corpus WITHOUT re-pairing the corpus. The
    corpus side is touched only through its band index -- pass a precomputed
    ``corpus_index`` (:func:`minhash_band_index`, stored bucketed) and the
    probe cost scales with |delta| + hit buckets, never |corpus|: the delta's
    distinct (band, bucket) set is tiny, so the index prune is a broadcast
    semi-join, and exact Jaccard verification re-shingles ONLY candidate docs
    from either side. Output: [id_delta, id_corpus, jaccard >= threshold]."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig_d = minhash_signatures(delta, text_col, id_col, k, num_hashes)
    banded_d = _band_explode(sig_d, bands, r, keep_sig=False).persist()
    banded_c = (
        corpus_index
        if corpus_index is not None
        else minhash_band_index(corpus, text_col, id_col, k, num_hashes, bands)
    )
    # prune the standing index to buckets the delta actually hits (broadcast:
    # |delta| * bands keys), then cap what a degenerate bucket can contribute
    hit = banded_d.select("band", "bucket").distinct()
    banded_c = banded_c.join(F.broadcast(hit), on=["band", "bucket"], how="left_semi")
    sizes = banded_c.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("bs"))
    banded_c = banded_c.join(
        F.broadcast(sizes.filter(F.col("bs") > max_bucket)),
        on=["band", "bucket"],
        how="left_anti",
    )
    cand = (
        banded_d.alias("d")
        .join(
            banded_c.alias("c"),
            on=(F.col("d.band") == F.col("c.band"))
            & (F.col("d.bucket") == F.col("c.bucket")),
        )
        .select(F.col("d.id").alias("id_delta"), F.col("c.id").alias("id_corpus"))
        .dropDuplicates(["id_delta", "id_corpus"])
        .persist()
    )

    def _shsets(df: DataFrame, ids: DataFrame, out_id: str) -> DataFrame:
        return (
            df.select(F.col(id_col).alias(out_id), F.col(text_col).alias("__t"))
            .join(ids, on=out_id, how="left_semi")
            .select(
                out_id,
                F.array_distinct(
                    F.transform(_shingles(F.col("__t"), k), lambda s: F.xxhash64(s))
                ).alias(f"__sh_{out_id}"),
            )
        )

    sd = _shsets(delta, cand.select("id_delta").distinct(), "id_delta")
    sc = _shsets(corpus, cand.select("id_corpus").distinct(), "id_corpus")
    joined = cand.join(sd, on="id_delta").join(sc, on="id_corpus")
    common = F.size(F.array_intersect("__sh_id_delta", "__sh_id_corpus"))
    jac = common / (
        F.size("__sh_id_delta") + F.size("__sh_id_corpus") - common
    )
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_delta", "id_corpus", "jaccard")
    )


def delta_dedup_minhash(
    corpus: DataFrame,
    delta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int = 10_000,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Delta rows that near-duplicate NOTHING in the standing corpus
    (:func:`delta_minhash_pairs` hits anti-joined away). Within-delta dups are
    the ordinary self-join problem -- compose :func:`minhash_lsh_pairs` +
    keep-one over the (small) delta before or after this call."""
    hits = delta_minhash_pairs(
        corpus,
        delta,
        text_col=text_col,
        id_col=id_col,
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        max_bucket=max_bucket,
        corpus_index=corpus_index,
    )
    losers = hits.select(F.col("id_delta").alias(id_col)).distinct()
    return delta.join(losers, on=id_col, how="left_anti")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 48
) -> DataFrame:
    """SimHash fingerprint (bits <= 62): majority vote per bit over token hashes.

    explode tokens -> ONE groupBy(id) with ``bits`` signed sums (hash-agg with
    map-side combine; measured faster than per-row array-filter formulations,
    whose ``bits`` lambda passes defeat codegen) -> assemble the fingerprint.
    Output: [id, simhash: long].
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = df.repartition(par).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"__b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("id").agg(*sums)
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"__b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return agg.select("id", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 48,
    max_hamming: int = 3,
    num_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the fingerprint into num_bands chunks
    (pigeonhole: hamming <= num_bands-1 guarantees a shared chunk; for
    max_hamming >= num_bands this is a high-recall heuristic), join on chunk,
    verify bit_count(xor) <= max_hamming."""
    s = simhash(df, text_col, id_col, bits).persist()  # both join sides reuse it
    chunk = bits // num_bands
    mask = (1 << chunk) - 1
    banded = s.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * chunk)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.chunk")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            on=(F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# pair list -> dedup clusters (distributed connected components)


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node's strictly-larger neighbors re-point at the
    minimum of its closed neighborhood. Two shuffles (groupBy min + hash join);
    neighborhoods are never materialized (no collect_list), so hub nodes cost
    nothing beyond their edge count."""
    bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        bidir.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select("u", F.least(F.col("u"), F.col("__mv")).alias("m"))
    )
    return (
        bidir.join(mins, on="u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges high->low; every node and its smaller
    neighbors re-point at the neighborhood minimum."""
    canon = e.select(
        F.greatest("u", "v").alias("cu"), F.least("u", "v").alias("cv")
    ).select(F.col("cu").alias("u"), F.col("cv").alias("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    out = canon.join(mins, on="u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    out = out.union(mins.select(F.col("u"), F.col("m").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a candidate-pair edge list; the step that turns
    near-duplicate PAIRS (minhash_lsh_pairs / simhash_pairs / ngram_jaccard_pairs
    output) into dedup GROUPS.

    Alternating large-star / small-star (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14 -- the standard shuffle-bounded CC for
    this shape): converges in O(log^2 n) rounds on adversarial graphs and 2-3
    rounds on real dedup graphs (near-dup clusters are dense, diameter ~1-2).
    Each round is a constant number of hash shuffles keyed on node id; there is
    NO collect_list / neighborhood materialization anywhere, so a hub node with
    millions of candidate edges costs its edge count, not its degree squared.
    Convergence is detected by an (edge count, xxhash64 checksum) pair -- one
    tiny agg per round -- rather than a full self-join diff.

    Returns [id: long, component: long] for every node that appears in
    ``pairs``, where component = the minimum node id reachable from ``id``
    (singleton nodes never appear in a pair list; callers map them to
    themselves, see ``dedup_clusters``).
    """
    # localCheckpoint per round is load-bearing, not an optimization: each round
    # references the previous frontier 4x (bidirectional union + join), so
    # without lineage truncation the logical plan grows ~4^k and the *driver*
    # OOMs in analysis before any data moves. persist() alone does not truncate
    # the plan. On a real cluster swap for checkpoint() on a reliable dir.
    e = (
        pairs.select(
            F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iter):
        nxt = _small_star(_large_star(e)).localCheckpoint()
        # bit_xor, not sum: an order-independent checksum that cannot hit the
        # ANSI-mode long-overflow that sum(xxhash64) does
        row = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        e = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # converged: every edge is (node -> its component root)
    roots = e.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    comp = e.select(F.col("u").alias("id"), F.col("v").alias("component")).union(roots)
    return comp.distinct()


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Assign every document a dedup ``cluster_id`` from a candidate-pair list:
    connected components over the pairs, singletons (docs in no pair) mapped to
    themselves. One broadcast-or-hash join against the (small) component map;
    keep-one-per-cluster is then a groupBy/window on cluster_id."""
    comp = connected_components(pairs, a_col=a_col, b_col=b_col).withColumnRenamed(
        "id", "__cc_id"
    )
    return (
        df.join(comp, on=df[id_col].cast("long") == comp["__cc_id"], how="left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("component"), F.col(id_col).cast("long"))
        )
        .drop("__cc_id", "component")
    )


def cluster_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    score: Column,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Quality-aware near-duplicate removal: close the candidate pairs into
    clusters (:func:`dedup_clusters`) and keep exactly ONE row per cluster --
    the row with the HIGHEST ``score`` (ties broken by smallest id), instead of
    keep-one's smallest-id winner.  This is the keep-policy a curation pipeline
    actually wants: within a near-dup group, retain the longest / best-quality /
    canonical-source copy rather than an arbitrary one.

    ``score`` is any deterministic Column over ``df``'s rows (token count,
    quality score, source priority...).  The window partitions by cluster_id,
    so the only skew is the largest duplicate group -- same bound as keep-one.
    Returns the surviving rows with the input schema.
    """
    clustered = dedup_clusters(df, pairs, id_col=id_col, a_col=a_col, b_col=b_col)
    w = Window.partitionBy("cluster_id").orderBy(
        score.desc(), F.col(id_col).asc()
    )
    return (
        clustered.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "cluster_id")
    )


def _global_ranks(df: DataFrame, key: Column, id_col: str, partitions: int) -> DataFrame:
    """Dense global position for every row under ``ORDER BY key, id`` without
    a single-partition window: range-partition on the sort key, rank locally
    (per-partition window, bounded memory), then add per-partition offsets
    computed from a P-row count frame via a driver prefix sum. Two narrow
    passes; the classic distributed zipWithIndex in DataFrame form.

    Output: [id, __key, __rank] with __rank in [0, n)."""
    keyed = df.select(
        F.col(id_col).alias("id"), key.alias("__key")
    ).repartitionByRange(partitions, F.col("__key"), F.col("id"))
    keyed = keyed.withColumn("__pid", F.spark_partition_id())
    local = F.row_number().over(
        Window.partitionBy("__pid").orderBy(F.col("__key"), F.col("id"))
    )
    ranked = keyed.withColumn("__lr", local)
    counts = sorted(
        ranked.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect(),
        key=lambda r: r["__pid"],
    )  # <= `partitions` rows on the driver
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["c"]
    spark = df.sparkSession
    off = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], ["__pid", "__off"]
    )
    return (
        ranked.join(F.broadcast(off), on="__pid")
        .select("id", "__key", (F.col("__lr") - 1 + F.col("__off")).alias("__rank"))
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key: Column | str,
    window: int = 4,
    id_col: str = "doc_id",
    partitions: int = 64,
) -> DataFrame:
    """Sorted-neighborhood-method candidate pairs (the reference's expert
    dedupe scenario, examples/expert/dedupe.py:20-120: sort by the chosen
    key, compare each row only to its ``window - 1`` successors).

    Spark design for 10^12 rows: global ranks via :func:`_global_ranks`
    (range partition + per-partition window + broadcast offsets -- no
    single-partition sort), then the band-join trick: bucket = rank / window,
    a row meets all rank-distance < window partners by joining buckets b and
    b+1 only -- 2 join keys per row instead of window-1 exploded copies, one
    shuffle join on a dense integer key, no skew (buckets have exactly
    ``window`` rows).

    Output: [id_a, id_b, rank_a, rank_b] with rank_a < rank_b,
    rank_b - rank_a < window."""
    if window < 2:
        raise ValueError("window must be >= 2")
    key = F.col(key) if isinstance(key, str) else key
    # checkpoint the n-row rank frame (id + 2 ints): the rank assignment
    # already burned a driver prefix-sum collect, and pinning it here keeps
    # the lazy pair join from ever re-running the ranking lineage (whose
    # partition ids must stay consistent with the collected offsets)
    ranked = _global_ranks(df, key, id_col, partitions).select(
        "id", "__rank", F.floor(F.col("__rank") / window).alias("__b")
    ).localCheckpoint(eager=True)
    left = ranked.select(
        F.col("id").alias("id_a"), F.col("__rank").alias("rank_a"), "__b"
    )
    right = ranked.select(
        F.col("id").alias("id_b"),
        F.col("__rank").alias("rank_b"),
        F.explode(F.array(F.col("__b"), F.col("__b") - 1)).alias("__b"),
    )
    return (
        left.join(right, on="__b")
        .filter(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") - F.col("rank_a") < window)
        )
        .select("id_a", "id_b", "rank_a", "rank_b")
    )


def snm_dedup_candidates(
    df: DataFrame,
    lhs_cols: list[str],
    window: int = 4,
    id_col: str = "doc_id",
    partitions: int = 64,
) -> DataFrame:
    """The expert dedupe scenario's blocking step: the sort key is the
    concatenation of the chosen (mined-AFD LHS) attributes, and candidates
    are all pairs within the sliding window. Downstream exact comparison /
    merge is the caller's policy, as in the reference's interactive loop."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in lhs_cols])
    return sorted_neighborhood_pairs(
        df, key, window=window, id_col=id_col, partitions=partitions
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.7,
    candidate_budget: int | None = None,
    on_budget: str = "raise",
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 10_000,
    return_report: bool = False,
):
    """EXACT Jaccard similarity join with prefix filtering (SSJoin/PPJoin
    family, Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08): same output as
    :func:`ngram_jaccard_pairs` with no ``max_df`` pruning, but the candidate
    generator indexes only each document's *prefix* -- its
    ``|d| - ceil(t*|d|) + 1`` globally-rarest shingles -- instead of all of
    them. Two sets with jaccard >= t must share at least one prefix token
    under any global token order, so no pair is missed; ordering rarest-first
    makes the indexed lists short AND cold (the hot-shingle skew that
    ngram_jaccard_pairs has to drop via ``max_df`` never enters the index,
    because a high-df shingle sorts to the suffix).

    Scale design (10^12 docs): at t=0.9 the prefix is ~10% of each document's
    shingles, so the self-join input shrinks 10x and the candidate-pair volume
    ~100x versus the full inverted index; the length filter
    ``t*|a| <= |b| <= |a|/t`` prunes join output before the verify stage; the
    exact verification join touches candidate pairs only. All JVM exprs, three
    shuffles (df-rank join, prefix self-join, verify join).

    Low-threshold boundary (measured in the round-3 8M-doc soak): at t=0.7 on
    a boilerplate-heavy corpus the prefix covers ~30% of each doc and shared
    boilerplate shingles enter it, so the self-join's candidate volume grows
    ~quadratically in the hottest prefix-shingle's doc count and the transient
    shuffle spill can exceed per-node disk. ``candidate_budget`` bounds this
    PREDICTABLY: a bounded census of per-prefix-shingle doc counts (one row
    per distinct count value) estimates the exact-join candidate volume
    up front, and when it exceeds the budget the op either

    * ``on_budget="raise"``: raises ``ValueError`` with the estimate, the
      budget, and the hot-shingle cap that would fit -- BEFORE any join runs
      (fail fast beats filling the cluster's shuffle disks), or
    * ``on_budget="prescreen"``: splits prefix shingles at the largest doc
      count ``cap`` whose cumulative pair estimate fits the budget. Cold
      (<= cap) shingles keep the exact prefix join; docs whose prefix touches
      a hot shingle are pre-screened with MinHash LSH banding (the operator
      built for this regime) and its candidates merge into the same exact
      verify. A qualifying pair is then missed only if ALL its common prefix
      tokens are hot AND the LSH bands miss it -- probability
      ``1 - lsh_collision_prob(jaccard, bands, num_hashes//bands)``, reported
      in the returned report as ``prescreen_recall_at_t``. Caveat: that
      figure covers the banding probability only; band buckets larger than
      ``max_bucket`` are additionally dropped from the prescreen (the same
      guard ``minhash_lsh_pairs`` applies), so a hot pair whose EVERY
      surviving band collides in a ``> max_bucket`` bucket is missed with
      probability not captured by ``prescreen_recall_at_t``. The report's
      ``prescreen_dropped_buckets`` / ``prescreen_dropped_bucket_rows``
      quantify how much of the prescreen volume that guard removed (0 means
      the recall figure is exact).

    ``return_report=True`` returns ``(pairs_df, report_dict)`` with the
    budget accounting (estimated candidates, cap, hot shingle/doc counts).

    Output: [id_a, id_b, jaccard] with id_a < id_b, jaccard >= threshold.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    if on_budget not in ("raise", "prescreen"):
        raise ValueError("on_budget must be 'raise' or 'prescreen'")
    if candidate_budget is not None and num_hashes % bands != 0:
        # the prescreen path assumes rows = num_hashes // bands exactly;
        # a non-divisible combination would silently ignore trailing
        # signature slots while prescreen_recall_at_t still assumed them
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}) "
            f"when candidate_budget is set (the MinHash prescreen uses "
            f"rows = num_hashes // bands)"
        )
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.repartition(par)
        .select(
            F.col(id_col).alias("id"),
            F.explode(_shingles(F.col(text_col), k)).alias("shingle"),
        )
        .withColumn("sh", F.xxhash64("shingle"))
        .drop("shingle")
        .persist()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    df_freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_cnt"))
    # canonical order: rarest first, hash as the tie-break (any total order
    # works; df asc keeps indexed lists short). One shuffle join on sh.
    ranked = sh.join(df_freq, on="sh").join(sizes, on="id")
    # prefix length p = n - ceil(t*n) + 1
    p = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    rn = F.row_number().over(
        Window.partitionBy("id").orderBy(F.col("df_cnt"), F.col("sh"))
    )
    # persist: BOTH sides of the self-join read this frame -- without it the
    # df-rank join + per-doc window re-runs twice (visible as two Window
    # subtrees in the physical plan)
    prefix = (
        ranked.withColumn("__rn", rn)
        .filter(F.col("__rn") <= p)
        .select("id", "sh", "n")
        .persist()
    )
    report: dict = {"candidate_budget": candidate_budget, "hot_df_cap": None}
    exact_prefix = prefix
    prescreen_cand = None
    if candidate_budget is not None:
        # Bounded census: per-prefix-shingle doc count c -> number of shingles
        # with that count. Row count = number of DISTINCT c values (Zipfian
        # counts collapse to at most a few thousand rows at any corpus size),
        # so the collect is bounded by construction. Estimated exact-join
        # candidates = sum over shingles of c*(c-1)/2 (upper bound: the
        # length filter only removes pairs).
        # per-shingle prefix counts feed the census AND (on breach) the
        # hot/cold split -- one aggregation, persisted, not three
        counts = (
            prefix.groupBy("sh").agg(F.count(F.lit(1)).alias("c")).persist()
        )
        census = (
            counts.groupBy("c").agg(F.count(F.lit(1)).alias("n_sh")).collect()
        )
        census = sorted((r["c"], r["n_sh"]) for r in census)
        est_total = sum(c * (c - 1) // 2 * n for c, n in census)
        report["estimated_exact_candidates"] = est_total
        if est_total <= candidate_budget:
            counts.unpersist()
        if est_total > candidate_budget:
            # largest cap whose cumulative pair estimate fits the budget
            cap, cum = 1, 0
            for c, n in census:
                cum += c * (c - 1) // 2 * n
                if cum > candidate_budget:
                    break
                cap = c
            if on_budget == "raise":
                sh.unpersist()
                prefix.unpersist()
                counts.unpersist()
                raise ValueError(
                    f"prefix_jaccard_pairs: estimated candidate volume "
                    f"{est_total:,} exceeds candidate_budget "
                    f"{candidate_budget:,} at threshold={threshold}. "
                    f"Options: on_budget='prescreen' (hot shingles with "
                    f"prefix doc count > {cap} fall back to MinHash LSH "
                    f"banding, cold shingles stay exact), raise the budget, "
                    f"or use minhash_lsh_pairs directly at this threshold."
                )
            report["hot_df_cap"] = cap
            # hot set read twice (anti + semi): persist, do not re-aggregate
            hot_sh = counts.filter(F.col("c") > cap).select("sh").persist()
            exact_prefix = prefix.join(hot_sh, on="sh", how="left_anti")
            hot_ids = (
                prefix.join(hot_sh, on="sh", how="left_semi")
                .select("id")
                .distinct()
            )
            report["n_hot_shingles"] = sum(n for c, n in census if c > cap)
            report["prescreen_recall_at_t"] = lsh_collision_prob(
                threshold, bands, num_hashes // bands
            )
            # MinHash prescreen over hot docs only (bare (id, band, bucket)
            # rows shuffle; signatures never ride the self-join)
            hot_docs = df.select(
                F.col(id_col).alias("id"), F.col(text_col).alias("__t")
            ).join(hot_ids, on="id", how="left_semi")
            n_hot = hot_docs.count()
            report["n_hot_docs"] = n_hot
            if n_hot:
                sig = minhash_signatures(hot_docs, "__t", "id", k, num_hashes)
                banded = _band_explode(sig, bands, num_hashes // bands, keep_sig=False)
                bs = banded.groupBy("band", "bucket").agg(
                    F.count(F.lit(1)).alias("bs")
                )
                dropped = bs.filter(F.col("bs") > max_bucket).persist()
                # quantify the max_bucket guard's recall impact (see
                # docstring caveat): groups dropped + (doc, band) rows in
                # them -- one 1-row agg over the small bucket-size frame
                drop_row = dropped.agg(
                    F.count(F.lit(1)).alias("nb"),
                    F.coalesce(F.sum("bs"), F.lit(0)).alias("nr"),
                ).collect()[0]
                report["prescreen_dropped_buckets"] = int(drop_row["nb"])
                report["prescreen_dropped_bucket_rows"] = int(drop_row["nr"])
                banded = banded.join(
                    F.broadcast(dropped),
                    on=["band", "bucket"],
                    how="left_anti",
                )
                ba, bb = banded.alias("a"), banded.alias("b")
                prescreen_cand = (
                    ba.join(
                        bb,
                        on=(F.col("a.band") == F.col("b.band"))
                        & (F.col("a.bucket") == F.col("b.bucket"))
                        & (F.col("a.id") < F.col("b.id")),
                    )
                    .select(
                        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
                    )
                    .dropDuplicates(["id_a", "id_b"])
                    # rejoin sizes + length filter at candidate scale
                    .join(
                        sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")),
                        on="id_a",
                    )
                    .join(
                        sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")),
                        on="id_b",
                    )
                    .filter(
                        (F.col("n_b") * F.lit(threshold) <= F.col("n_a"))
                        & (F.col("n_a") * F.lit(threshold) <= F.col("n_b"))
                    )
                    .select("id_a", "id_b", "n_a", "n_b")
                )
    a = exact_prefix.alias("a")
    b = exact_prefix.alias("b")
    cand = (
        a.join(
            b,
            on=(F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: jaccard >= t forces t*|a| <= |b| <= |a|/t
            & (F.col("b.n") * F.lit(threshold) <= F.col("a.n"))
            & (F.col("a.n") * F.lit(threshold) <= F.col("b.n")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .distinct()
    )
    if prescreen_cand is not None:
        cand = cand.unionByName(prescreen_cand).dropDuplicates(["id_a", "id_b"])
    # exact verify on candidates only: count common shingles per pair
    ta = sh.select(F.col("id").alias("id_a"), "sh")
    tb = sh.select(F.col("id").alias("id_b"), "sh")
    common = (
        cand.join(ta, on="id_a")
        .join(tb, on=["id_b", "sh"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    pairs = (
        common.withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if return_report:
        return pairs, report
    return pairs


def prefix_jaccard_join(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.7,
    candidate_budget: int | None = None,
    on_budget: str = "raise",
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 10_000,
    return_report: bool = False,
):
    """Cross-corpus EXACT Jaccard similarity join (R x S form of
    :func:`prefix_jaccard_pairs`): every (left, right) doc pair with shingle
    Jaccard >= threshold. The prefix theorem is per-side — J >= t forces
    ``|A ∩ B| >= t·|A|`` and ``>= t·|B|``, so the ``|d| - ceil(t·|d|) + 1``
    rarest-first prefixes under one SHARED global token order (document
    frequency over the union) must intersect for any qualifying pair.

    Scale design: the union df ranking is one groupBy; candidate generation
    joins the two ~(1-t)-sized prefix tables on an 8-byte key; exact verify
    touches candidates only. No broadcast assumption on either side — both
    corpora may be huge (the fuzzy-decontamination case is a 100 TB train
    side vs a small benchmark side, where the shuffle join degenerates to a
    broadcast automatically under AQE).

    ``candidate_budget``: same predictable-degradation contract as
    :func:`prefix_jaccard_pairs`, with the cross form's candidate volume per
    shared prefix shingle being ``cnt_l * cnt_r``. The census buckets
    products by log2 (<= 64 rows however large both corpora are) to pick the
    hot cap; ``on_budget='prescreen'`` routes docs touching a hot shingle
    through a MinHash band join ACROSS the two corpora while cold shingles
    stay exact, and ``return_report=True`` returns the accounting.

    Output: [id_l, id_r, jaccard], jaccard >= threshold.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    if on_budget not in ("raise", "prescreen"):
        raise ValueError("on_budget must be 'raise' or 'prescreen'")
    if candidate_budget is not None and num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}) "
            f"when candidate_budget is set (the MinHash prescreen uses "
            f"rows = num_hashes // bands)"
        )
    par = left.sparkSession.sparkContext.defaultParallelism

    def _sh(df: DataFrame) -> DataFrame:
        return (
            df.repartition(par)
            .select(
                F.col(id_col).alias("id"),
                F.explode(_shingles(F.col(text_col), k)).alias("shingle"),
            )
            .withColumn("sh", F.xxhash64("shingle"))
            .drop("shingle")
        )

    shl, shr = _sh(left).persist(), _sh(right).persist()
    # persist: both _prefix calls join against this ranking -- one union-agg
    # pass instead of two
    df_freq = (
        shl.select("sh").unionAll(shr.select("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df_cnt"))
        .persist()
    )

    def _prefix(sh: DataFrame) -> DataFrame:
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
        ranked = sh.join(df_freq, on="sh").join(sizes, on="id")
        p = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
        rn = F.row_number().over(
            Window.partitionBy("id").orderBy(F.col("df_cnt"), F.col("sh"))
        )
        return ranked.withColumn("__rn", rn).filter(F.col("__rn") <= p).select(
            "id", "sh", "n"
        )

    pfl = _prefix(shl).persist()
    pfr = _prefix(shr).persist()
    report: dict = {"candidate_budget": candidate_budget, "hot_product_cap": None}
    prescreen_cand = None
    if candidate_budget is not None:
        # per-shared-shingle candidate volume = cnt_l * cnt_r; bucket the
        # products by log2 so the census stays <= 64 rows at any scale
        cl = pfl.groupBy("sh").agg(F.count(F.lit(1)).alias("cl"))
        cr = pfr.groupBy("sh").agg(F.count(F.lit(1)).alias("cr"))
        # cl*cr in DOUBLE: at the 10^12-doc design point per-side prefix
        # counts of ~1e9 each would overflow an int64 product and either
        # NULL the log2 bucket or silently wrap est_total negative -- the
        # budget guard must never be the thing that overflows
        prod = (cl.join(cr, on="sh")
                .persist()  # census + hot_sh both read it
                )
        pairs_d = F.col("cl").cast("double") * F.col("cr").cast("double")
        census = sorted(
            (int(r["b"]), float(r["pairs"]))
            for r in prod.groupBy(
                F.floor(F.log2(pairs_d)).cast("int").alias("b")
            ).agg(F.sum(pairs_d).alias("pairs")).collect()
        )
        est_total = int(sum(pairs for _, pairs in census))
        report["estimated_exact_candidates"] = est_total
        if est_total <= candidate_budget:
            prod.unpersist()
        if est_total > candidate_budget:
            cap, cum = 1, 0.0
            for b, pairs in census:
                cum += pairs
                if cum > candidate_budget:
                    break
                cap = 2 ** (b + 1) - 1  # every product in bucket b fits
            if on_budget == "raise":
                for f in (shl, shr, df_freq, pfl, pfr, prod):
                    f.unpersist()
                raise ValueError(
                    f"prefix_jaccard_join: estimated candidate volume "
                    f"{est_total:,} exceeds candidate_budget "
                    f"{candidate_budget:,} at threshold={threshold}. "
                    f"Options: on_budget='prescreen' (shingles with "
                    f"cnt_l*cnt_r > {cap} fall back to a MinHash band "
                    f"join, cold shingles stay exact) or raise the budget."
                )
            report["hot_product_cap"] = cap
            # hot set read by four consumers (two semi, two anti joins):
            # materialize it once instead of re-running the census join
            hot_sh = prod.filter(pairs_d > cap).select("sh").persist()
            hot_l = pfl.join(hot_sh, on="sh", how="left_semi").select("id").distinct()
            hot_r = pfr.join(hot_sh, on="sh", how="left_semi").select("id").distinct()
            pfl_cold = pfl.join(hot_sh, on="sh", how="left_anti")
            pfr_cold = pfr.join(hot_sh, on="sh", how="left_anti")
            n_hot_l = hot_l.count()
            n_hot_r = hot_r.count()
            report["n_hot_docs_left"] = n_hot_l
            report["n_hot_docs_right"] = n_hot_r
            report["prescreen_recall_at_t"] = lsh_collision_prob(
                threshold, bands, num_hashes // bands
            )
            if n_hot_l and n_hot_r:
                def _banded(df, ids):
                    docs = df.select(
                        F.col(id_col).alias("id"), F.col(text_col).alias("__t")
                    ).join(ids, on="id", how="left_semi")
                    sig = minhash_signatures(docs, "__t", "id", k, num_hashes)
                    banded = _band_explode(sig, bands, num_hashes // bands, keep_sig=False)
                    return banded

                bl = _banded(left, hot_l)
                br = _banded(right, hot_r)
                # hot-bucket guard on the UNION census (either side can flood)
                bs = (
                    bl.unionByName(br).groupBy("band", "bucket")
                    .agg(F.count(F.lit(1)).alias("bs"))
                )
                dropped = bs.filter(F.col("bs") > max_bucket).persist()
                # same max_bucket recall caveat as prefix_jaccard_pairs:
                # report how much prescreen volume the guard removed
                drop_row = dropped.agg(
                    F.count(F.lit(1)).alias("nb"),
                    F.coalesce(F.sum("bs"), F.lit(0)).alias("nr"),
                ).collect()[0]
                report["prescreen_dropped_buckets"] = int(drop_row["nb"])
                report["prescreen_dropped_bucket_rows"] = int(drop_row["nr"])
                hot_buckets = F.broadcast(dropped)
                bl = bl.join(hot_buckets, on=["band", "bucket"], how="left_anti")
                br = br.join(hot_buckets, on=["band", "bucket"], how="left_anti")
                sl_sizes = shl.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
                sr_sizes = shr.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
                prescreen_cand = (
                    bl.alias("l")
                    .join(
                        br.alias("r"),
                        on=(F.col("l.band") == F.col("r.band"))
                        & (F.col("l.bucket") == F.col("r.bucket")),
                    )
                    .select(
                        F.col("l.id").alias("id_l"), F.col("r.id").alias("id_r")
                    )
                    .dropDuplicates(["id_l", "id_r"])
                    .join(
                        sl_sizes.select(F.col("id").alias("id_l"), F.col("n").alias("n_l")),
                        on="id_l",
                    )
                    .join(
                        sr_sizes.select(F.col("id").alias("id_r"), F.col("n").alias("n_r")),
                        on="id_r",
                    )
                    .filter(
                        (F.col("n_r") * F.lit(threshold) <= F.col("n_l"))
                        & (F.col("n_l") * F.lit(threshold) <= F.col("n_r"))
                    )
                    .select("id_l", "id_r", "n_l", "n_r")
                )
            pfl, pfr = pfl_cold, pfr_cold
    pl = pfl.alias("l")
    pr = pfr.alias("r")
    cand = (
        pl.join(
            pr,
            on=(F.col("l.sh") == F.col("r.sh"))
            & (F.col("r.n") * F.lit(threshold) <= F.col("l.n"))
            & (F.col("l.n") * F.lit(threshold) <= F.col("r.n")),
        )
        .select(
            F.col("l.id").alias("id_l"),
            F.col("r.id").alias("id_r"),
            F.col("l.n").alias("n_l"),
            F.col("r.n").alias("n_r"),
        )
        .distinct()
    )
    if prescreen_cand is not None:
        cand = cand.unionByName(prescreen_cand).dropDuplicates(["id_l", "id_r"])
    common = (
        cand.join(shl.select(F.col("id").alias("id_l"), "sh"), on="id_l")
        .join(shr.select(F.col("id").alias("id_r"), "sh"), on=["id_r", "sh"])
        .groupBy("id_l", "id_r", "n_l", "n_r")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    pairs = (
        common.withColumn(
            "jaccard",
            F.col("common") / (F.col("n_l") + F.col("n_r") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )
    if return_report:
        return pairs, report
    return pairs


# ---------------------------------------------------------------------------
# Corpus-wide duplicate-line removal (the MassiveText / RefinedWeb line-dedup
# tier, Rae et al. 2021 / Penedo et al. 2023): a line appearing verbatim in
# >= min_docs DISTINCT documents is boilerplate (nav bars, cookie banners,
# signatures) and is stripped from every document, preserving the order of
# the surviving lines. Complements line_filter (per-doc heuristics -- no
# corpus evidence) and duplicate_spans (n-gram tier -- no line alignment).
# ---------------------------------------------------------------------------


def duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Lines that occur in >= ``min_docs`` distinct documents:
    ``[line, n_docs]``. Whitespace-only lines are structure, not boilerplate,
    and are never reported.

    Scale: explode is per-row; the per-doc distinct runs on the 8-byte
    xxhash64 line key FIRST (groupBy(key, id) -- map-side combinable, so a
    line repeated inside one giant doc collapses before the wire), then one
    groupBy(key). A line shared by millions of docs is exactly the hot key
    the map-side combine absorbs; nothing here is quadratic in its
    frequency. The line STRING rides along as ``first(line)`` per key --
    only one copy per distinct line ever shuffles.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), sep)).alias("line"),
    ).filter(F.trim(F.col("line")) != "")
    per_doc = lines.groupBy(
        F.xxhash64("line").alias("_lk"), F.col("_id")
    ).agg(F.first("line").alias("line"))
    return (
        per_doc.groupBy("_lk")
        .agg(
            F.first("line").alias("line"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select("line", "n_docs")
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
    broadcast_banned: bool = False,
) -> DataFrame:
    """Strip corpus-wide duplicate lines from every document. Adds
    ``clean_text`` (surviving lines re-joined on ``sep`` in original order),
    ``n_lines`` and ``n_removed_lines``. Whitespace-only lines always
    survive (they are document structure).

    Scale: two scans of the corpus (banned-line census + rewrite). The
    rewrite explodes with position, left-joins the banned table on the
    8-byte line key, and reassembles per doc via one groupBy with
    ``array_sort(collect_list(struct(pos, line)))`` -- a doc's lines fit in
    memory by definition, so the collect_list is bounded by doc size, never
    by corpus size. The banned table holds only lines ABOVE the threshold
    (boilerplate, not the full distinct-line census); pass
    ``broadcast_banned=True`` when it is known-small, otherwise the shuffle
    join's build side is one row per banned key and AQE's skew split handles
    the hot probe keys.
    """
    banned = duplicate_lines(df, text_col, id_col, min_docs, sep).select(
        F.xxhash64("line").alias("_lk"), F.lit(True).alias("_banned")
    )
    if broadcast_banned:
        banned = F.broadcast(banned)
    pos_lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    keyed = pos_lines.withColumn(
        "_lk",
        F.when(F.trim(F.col("line")) != "", F.xxhash64("line")),
    )
    judged = keyed.join(banned, "_lk", "left")
    rebuilt = judged.groupBy("_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("_banned"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed_lines"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.coalesce(F.col("_banned"), F.lit(False)),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s.line,
            ),
            sep,
        ).alias("clean_text"),
    )
    return df.join(
        rebuilt.withColumnRenamed("_id", id_col), id_col, "left"
    )


def lsh_collision_prob(jaccard: float, bands: int, rows: int) -> float:
    """P[>= 1 band collision] = 1 - (1 - s^r)^b -- the MinHash-LSH S-curve."""
    return 1.0 - (1.0 - jaccard**rows) ** bands


def minhash_plan(
    threshold: float,
    num_hashes: int = 64,
    false_negative_weight: float = 1.0,
) -> dict:
    """Pick (bands, rows) for minhash_lsh_pairs / minhash_band_index from the
    target Jaccard threshold -- the closed-form S-curve planner (the same
    trade datasketch/Spark ML make by integral scan; exact enumeration here
    since num_hashes is small).

    Minimizes  fn_weight * integral_[t,1] (1 - P(s)) ds + integral_[0,t] P(s) ds
    over every (b, r) with b*r == num_hashes (trapezoid over 1000 points).
    Raise ``false_negative_weight`` to bias toward recall (dedup prefers
    false positives -- the exact verify kills them -- over missed dups).
    Returns {"bands", "rows", "s50"} where s50 = (1/b)^(1/r) is the curve's
    midpoint similarity."""
    best = None
    grid = [i / 1000.0 for i in range(1001)]
    for rows in range(1, num_hashes + 1):
        if num_hashes % rows:
            continue
        bands = num_hashes // rows
        fp = fn = 0.0
        for s in grid:
            p = lsh_collision_prob(s, bands, rows)
            w = 0.0005 if s in (0.0, 1.0) else 0.001  # trapezoid ends
            if s >= threshold:
                fn += (1.0 - p) * w
            else:
                fp += p * w
        cost = false_negative_weight * fn + fp
        if best is None or cost < best[0]:
            best = (cost, bands, rows)
    _, bands, rows = best
    return {
        "bands": bands,
        "rows": rows,
        "s50": (1.0 / bands) ** (1.0 / rows),
        "cost": best[0],
    }
