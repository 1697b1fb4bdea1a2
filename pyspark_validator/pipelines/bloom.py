"""Bloom-filter gated delta-vs-corpus EXACT dedup (crawl-increment fast path).

The standing corpus-side state is two artifacts, both cheap and both mergeable
as new increments land:

  * content_hash_index(corpus): one 8-byte row per distinct normalized-content
    fingerprint (the exact-dedup key used everywhere else in this package,
    ``xxhash64(normalize_text(text))``).  Append-only; store it bucketed on the
    fingerprint so the verify join below never shuffles the index.
  * bloom_words(index): an m-bit Bloom filter materialized as <= m/64 rows of
    (word_idx, word) -- built with ONE groupBy whose key space is bounded by
    the filter size, not the corpus size, and OR-mergeable
    (merge_bloom_words), so each crawl increment folds its own words in
    without touching the standing corpus.

Query path for a delta of new documents (delta_new_rows):

  1. fingerprint every delta row (pure JVM exprs, zero shuffle);
  2. Bloom GATE: an Arrow-batched kernel tests the k bit positions against the
     broadcast m/64-word numpy array -- still zero shuffle.  Rows the filter
     rejects are DEFINITELY new (the gate's bit positions are computed by the
     exact same JVM expressions that built the filter, so there are no false
     negatives) and never touch the corpus at all;
  3. only the "maybe seen" survivors (true duplicates + the ~fpp false
     positives) reach the exact left-anti verify join against the hash index.

At 10^12 docs the gate turns "anti-join the whole delta against the corpus
index" into "anti-join fpp*|delta| rows + the true duplicates" -- the
shuffle carries a few percent of the delta instead of all of it, and the
standing filter is a fixed-size array every executor holds once.  Exactness is
unconditional: false positives are removed by the verify join, false negatives
cannot occur, so the result is row-identical to the plain anti-join (law
pinned in tests/test_bloom.py).

Reference parity note: the reference's exact dedup tier is hash-set membership
(desbordante uses per-column hash indexes for its PLI build); the Bloom gate is
the distributed-scale equivalent of its "check the hash set before the
expensive probe" pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .text import normalize_text

__all__ = [
    "content_hash_index",
    "bloom_positions",
    "bloom_words",
    "merge_bloom_words",
    "bloom_array",
    "bloom_gate",
    "delta_new_rows",
]


def content_fp(text_col) -> F.Column:
    """The package-wide exact-dedup key: xxhash64 of normalized text."""
    return F.xxhash64(normalize_text(text_col))


def content_hash_index(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Standing exact-dedup state: one row per distinct content fingerprint
    (column ``content_fp`` bigint).  Append-only under corpus growth; write it
    bucketed on content_fp and the verify join in :func:`delta_new_rows`
    probes it shuffle-free."""
    return df.select(content_fp(F.col(text_col)).alias("content_fp")).distinct()


def bloom_positions(key_col, num_bits: int, num_hashes: int) -> F.Column:
    """The k bit positions of a key, as an array<int> -- pure JVM exprs.

    Position i = pmod(xxhash64(key, i), m).  Builder and gate share this
    function, which is what makes false negatives impossible."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(num_bits)).cast("int")
            for i in range(num_hashes)
        ]
    )


def bloom_words(
    index: DataFrame,
    key_col: str = "content_fp",
    num_bits: int = 1 << 23,
    num_hashes: int = 7,
) -> DataFrame:
    """Materialize the Bloom filter as (word_idx int, word bigint) rows.

    One explode + ONE groupBy whose key space is <= m/64 (map-side bit_or
    partials absorb the volume), independent of corpus size.  OR-mergeable:
    see :func:`merge_bloom_words`."""
    pos = F.explode(
        bloom_positions(F.col(key_col), num_bits, num_hashes)
    ).alias("pos")
    return (
        index.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), pmod(pos, 64))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def merge_bloom_words(*word_frames: DataFrame) -> DataFrame:
    """OR-merge Bloom word tables built with the same (num_bits, num_hashes):
    the standing-sketch update path for crawl increments."""
    out = word_frames[0]
    for w in word_frames[1:]:
        out = out.unionByName(w)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_array(words: DataFrame, num_bits: int) -> np.ndarray:
    """Collect the word table into the dense int64 bitmap the gate broadcasts.
    Driver/executor footprint = num_bits/8 bytes (1 MiB at m = 2^23) --
    bounded by the filter size, never the data."""
    arr = np.zeros(num_bits >> 6, dtype=np.int64)
    for row in words.collect():
        arr[row["word_idx"]] = row["word"]
    return arr


def bloom_gate(
    df: DataFrame,
    arr: np.ndarray,
    num_bits: int,
    num_hashes: int = 7,
    key_col: str = "content_fp",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Adds ``out_col`` (boolean): True iff all k filter bits for the key are
    set.  Zero shuffle: positions are JVM exprs, the membership test is one
    Arrow-batched numpy gather per batch against the captured bitmap."""

    @pandas_udf("boolean")
    def _test(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        m = np.stack(pos.to_numpy()).astype(np.int64)  # (n, k)
        words = arr[m >> 6]
        bits = (words >> (m & 63)) & 1
        return pd.Series(bits.all(axis=1))

    return df.withColumn(
        out_col, _test(bloom_positions(F.col(key_col), num_bits, num_hashes))
    )


def delta_new_rows(
    delta: DataFrame,
    corpus_index: DataFrame,
    bloom: np.ndarray | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 7,
    text_col: str = "text",
) -> DataFrame:
    """Delta rows whose normalized content does NOT already exist in the
    standing corpus (exact dedup of a crawl increment).

    With ``bloom`` (built over ``corpus_index`` via bloom_words+bloom_array,
    same num_bits/num_hashes): rows the filter rejects bypass the join
    entirely; only maybe-seen rows are verified against the index.  Without
    it: the plain left-anti join.  Both paths return identical rows (no false
    negatives; false positives die in the verify join)."""
    d = delta.withColumn("__fp", content_fp(F.col(text_col)))
    if bloom is None:
        out = d.join(
            corpus_index.withColumnRenamed("content_fp", "__fp"),
            on="__fp",
            how="left_anti",
        )
    else:
        gated = bloom_gate(
            d, bloom, num_bits, num_hashes, key_col="__fp", out_col="__maybe"
        )
        definitely_new = gated.filter(~F.col("__maybe")).drop("__maybe")
        suspects = gated.filter(F.col("__maybe")).drop("__maybe")
        new_suspects = suspects.join(
            corpus_index.withColumnRenamed("content_fp", "__fp"),
            on="__fp",
            how="left_anti",
        )
        out = definitely_new.unionByName(new_suspects)
    return out.drop("__fp")
