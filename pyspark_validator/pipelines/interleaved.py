"""Analytics over the interleaved text+media document shape
(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>) --
the north rule's input table.

Three operators a multimodal training pipeline runs constantly:

  * span_kind_transitions: the corpus-level Markov census of span-kind
    adjacency (text->image, image->text, ...; BOS/EOS edges included) --
    the structural fingerprint of an interleaved corpus. Drift in this
    table between snapshots flags upstream extraction changes (e.g. a
    crawler that suddenly drops alt-text splits text->text runs). Pure JVM:
    per-row zip_with of the kind array against its own tail, one explode +
    one groupBy (bounded by kinds^2 + 2*kinds keys, with map-side combine).
  * media_ref_census / media_reuse_summary: per-media-object reuse counts
    (how many docs and slots reference each media_ref) -- the media-side
    exact-dedup census (hot objects = dedup/caching candidates; a media_ref
    appearing in thousands of docs is boilerplate, the image-side analog of
    duplicate lines). One explode restricted to media spans + one groupBy on
    the ref.
  * spans_to_text: flatten a doc's text spans (offset order) into one plain
    string -- the bridge from the interleaved shape to every text-tier
    operator (dedup/quality/LM/contamination run on the flattened view).
    Zero shuffle, pure per-row exprs.

Span order note: the input-hint invariant says offsets are strictly
increasing (validated by span_integrity); these operators still sort by
offset defensively so they are well-defined on pre-validation data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "span_kind_transitions",
    "media_ref_census",
    "media_reuse_summary",
    "spans_to_text",
    "merge_span_kind_transitions",
    "merge_media_ref_census",
    "span_structure_drift",
    "layout_fingerprint",
    "layout_clusters",
    "layout_census",
    "merge_layout_census",
    "layout_diversity",
    "layout_drift",
    "media_census_drift",
    "media_context",
    "media_context_summary",
    "media_context_census",
    "merge_media_context_census",
    "media_context_rollup",
    "caption_pairs",
    "normalize_interleaved",
    "interleaved_quality_signals",
    "interleaved_quality_gate",
    "span_token_costs",
    "media_cost_column",
    "pack_interleaved",
    "chunk_interleaved",
    "token_cost_columns",
]


def _ordered_spans(spans_col: str = "spans") -> F.Column:
    # array_sort on struct<offset, ...> sorts by offset first; repack so the
    # sort key leads, then strip it back off via transform downstream.
    return F.array_sort(
        F.transform(
            F.col(spans_col),
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )


def span_kind_transitions(
    df: DataFrame, spans_col: str = "spans", include_bounds: bool = True
) -> DataFrame:
    """Corpus-wide (src, dst, n_transitions) counts over offset-ordered span
    kinds; with ``include_bounds``, BOS -> first-kind and last-kind -> EOS
    edges are counted too (so row sums reconstruct doc counts). Output is at
    most (kinds+1)^2 rows however large the corpus."""
    kinds = F.transform(_ordered_spans(spans_col), lambda s: s["kind"])
    if include_bounds:
        kinds = F.concat(F.array(F.lit("BOS")), kinds, F.array(F.lit("EOS")))
    n = F.size(kinds)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(kinds, 1, n - 1),
            F.slice(kinds, 2, n - 1),
            lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
        ),
    ).otherwise(
        F.array().cast("array<struct<src:string,dst:string>>")
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def media_ref_census(df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id") -> DataFrame:
    """Per-media-object reuse: [media_ref, n_docs, n_slots] (distinct docs vs
    total span slots referencing it). One explode of media spans only (text
    spans are filtered BEFORE the Generate, so the exploded volume is the
    media span count, not the span count) + one groupBy(media_ref)."""
    refs = F.filter(
        F.transform(F.col(spans_col), lambda s: s["media_ref"]),
        lambda r: r.isNotNull(),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(refs).alias("media_ref"))
        .groupBy("media_ref")
        .agg(
            F.count_distinct("id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_slots"),
        )
    )


def media_reuse_summary(df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id", hot_docs: int = 2) -> DataFrame:
    """One-row rollup of the census: total media slots, distinct objects,
    objects referenced by >= hot_docs distinct docs, and the max reuse."""
    c = media_ref_census(df, spans_col, id_col)
    return c.agg(
        F.sum("n_slots").cast("long").alias("n_media_slots"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_refs"),
        F.sum((F.col("n_docs") >= hot_docs).cast("long")).alias("n_hot_refs"),
        F.max("n_docs").cast("long").alias("max_doc_reuse"),
    )


def _media_context_items(spans_col: str = "spans") -> F.Column:
    """Per-media-span caption-adjacency structs over the offset-ordered span
    array: (offset, media_ref, prev_is_text, next_is_text). A span is "media"
    iff media_ref is non-null (the same definition token accounting uses);
    a neighbor is "text" iff its media_ref is null. ``F.get`` is NULL-safe on
    out-of-range indices but a NULL struct's field access is NULL too, so the
    boundary guards are explicit ``i > 0`` / ``i < n-1`` whens."""
    sp = F.col("_mc_sp")
    n = F.size(sp)
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                F.get(sp, i)["offset"].alias("offset"),
                F.get(sp, i)["media_ref"].alias("media_ref"),
                F.when(i > 0, F.get(sp, i - 1)["media_ref"].isNull())
                .otherwise(F.lit(False))
                .alias("prev_is_text"),
                F.when(i < n - 1, F.get(sp, i + 1)["media_ref"].isNull())
                .otherwise(F.lit(False))
                .alias("next_is_text"),
            ),
        ),
        lambda s: s["media_ref"].isNotNull(),
    )


def _with_ordered_barrier(df: DataFrame, spans_col: str) -> DataFrame:
    # explode(array(e)) barrier: _ordered_spans is referenced many times per
    # element downstream; without the Generate, CollapseProject re-inlines the
    # array_sort PER REFERENCE (the measured 20x family -- see curation.py).
    return df.withColumn("_mc_sp", F.explode(F.array(_ordered_spans(spans_col))))


def media_context(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Caption/alt-text adjacency audit for multimodal curation (the
    OBELICS-style image-text pairing signal): one row per MEDIA span --
    [id, offset, media_ref, prev_is_text, next_is_text, captioned] where
    ``captioned`` means at least one offset-adjacent span is text. Isolated
    media (no adjacent text anywhere) is the classic symptom of an extractor
    that drops surrounding prose; such spans carry no alignment signal for
    image-text training. Text spans are filtered BEFORE the Generate, so the
    exploded volume is the media span count; zero shuffle."""
    items = _media_context_items(spans_col)
    return (
        _with_ordered_barrier(df, spans_col)
        .select(F.col(id_col).alias(id_col), F.explode(items).alias("m"))
        .select(
            id_col,
            F.col("m.offset").alias("offset"),
            F.col("m.media_ref").alias("media_ref"),
            F.col("m.prev_is_text").alias("prev_is_text"),
            F.col("m.next_is_text").alias("next_is_text"),
            (F.col("m.prev_is_text") | F.col("m.next_is_text")).alias("captioned"),
        )
    )


def media_context_summary(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """One-row corpus rollup of the caption-adjacency audit: total media
    spans, captioned / isolated counts and the caption ratio. Computed from
    per-row array sizes (no explode at all): one single-row agg with map-side
    partials -- the shuffle carries one row per task."""
    items = _media_context_items(spans_col)
    per_doc = _with_ordered_barrier(df, spans_col).select(
        F.size(items).cast("long").alias("_n_media"),
        F.size(
            F.filter(items, lambda s: s["prev_is_text"] | s["next_is_text"])
        )
        .cast("long")
        .alias("_n_captioned"),
    )
    return per_doc.agg(
        F.sum("_n_media").alias("n_media"),
        F.sum("_n_captioned").alias("n_captioned"),
        (F.sum("_n_media") - F.sum("_n_captioned")).alias("n_isolated"),
        F.try_divide(F.sum("_n_captioned"), F.sum("_n_media")).alias(
            "caption_ratio"
        ),
    )


def media_context_count_cols(spans_col: str = "spans") -> tuple[F.Column, F.Column]:
    """(per-row media-span count, per-row captioned count) as pure exprs with
    a CONSTANT number of ordered-array evaluations per row -- safe inside agg
    expressions and streaming plans where the explode(array()) barrier isn't
    available (a per-index F.get formulation would re-inline the array_sort
    per element under CollapseProject). Adjacency comes from zip_with of the
    is-text array against its two shifts."""
    sp = _ordered_spans(spans_col)
    cnt = F.size(sp)
    is_text = F.transform(sp, lambda s: s["media_ref"].isNull())
    is_media = F.transform(sp, lambda s: s["media_ref"].isNotNull())
    shift = F.greatest(cnt - 1, F.lit(0))
    prev_text = F.concat(F.array(F.lit(False)), F.slice(is_text, 1, shift))
    next_text = F.concat(
        F.when(cnt >= 2, F.slice(is_text, 2, shift)).otherwise(
            F.array().cast("array<boolean>")
        ),
        F.array(F.lit(False)),
    )
    adj = F.zip_with(prev_text, next_text, lambda a, b: a | b)
    n_media_doc = F.size(F.filter(is_media, lambda m: m)).cast("long")
    n_cap_doc = F.when(
        cnt > 0,
        F.aggregate(
            F.zip_with(is_media, adj, lambda m, t: (m & t).cast("long")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    return n_media_doc, n_cap_doc


def media_context_census(
    df: DataFrame,
    group_cols: list[str],
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group caption-adjacency census -- the standing-index form of
    ``media_context_summary`` for source-level curation dashboards:
    [group..., n_docs, n_media, n_captioned], one groupBy over per-row array
    sizes (no explode; the shuffle carries the group key + three longs).
    Sum-mergeable under docs-arrive-whole: fold each crawl increment's census
    into the standing one with ``merge_media_context_census`` instead of
    re-scanning the corpus."""
    items = _media_context_items(spans_col)
    return (
        _with_ordered_barrier(df, spans_col)
        .select(
            *group_cols,
            F.size(items).cast("long").alias("_n_media"),
            F.size(F.filter(items, lambda s: s["prev_is_text"] | s["next_is_text"]))
            .cast("long")
            .alias("_n_captioned"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n_media").alias("n_media"),
            F.sum("_n_captioned").alias("n_captioned"),
        )
    )


def merge_media_context_census(*censuses: DataFrame) -> DataFrame:
    """Sum-merge caption-adjacency censuses (docs-arrive-whole invariant --
    the same contract as the other interleaved censuses)."""
    u = censuses[0]
    for c in censuses[1:]:
        u = u.unionByName(c)
    keys = [c for c in u.columns if c not in ("n_docs", "n_media", "n_captioned")]
    return u.groupBy(*keys).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_media").alias("n_media"),
        F.sum("n_captioned").alias("n_captioned"),
    )


def media_context_rollup(census: DataFrame) -> DataFrame:
    """Dashboard rollup over a caption-adjacency census: adds n_isolated,
    caption_ratio (null for zero-media groups) and media_per_doc. Driver-cost
    on the bounded census."""
    media, cap = F.col("n_media"), F.col("n_captioned")
    return (
        census.withColumn("n_isolated", media - cap)
        .withColumn("caption_ratio", F.try_divide(cap, media))
        .withColumn("media_per_doc", F.try_divide(media, F.col("n_docs")))
    )


def caption_pairs(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    prefer: str = "after",
) -> DataFrame:
    """Image-text pair extraction -- the interleaved -> CLIP-style-pairs
    bridge: for every media span with at least one offset-adjacent text span,
    emit [id, offset, media_ref, caption, caption_side] where the caption is
    the adjacent text span's content. ``prefer`` breaks the both-neighbors
    tie: 'after' (the common figure-then-caption web layout) or 'before'.
    Isolated media (no adjacent text -- see ``media_context``) emits nothing.
    Same zero-shuffle shape as media_context: candidates are built as array
    structs and filtered before the single Generate."""
    if prefer not in ("after", "before"):
        raise ValueError(f"prefer must be 'after' or 'before', got {prefer!r}")
    sp = F.col("_mc_sp")
    n = F.size(sp)
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )

    def neighbor_text(i, delta):
        lo = i + delta >= 0 if delta < 0 else F.lit(True)
        hi = i + delta < n if delta > 0 else F.lit(True)
        t = F.get(sp, i + delta)["text"]
        ref = F.get(sp, i + delta)["media_ref"]
        return F.when(lo & hi & ref.isNull(), t).otherwise(F.lit(None))

    first, second = (1, -1) if prefer == "after" else (-1, 1)
    items = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                F.get(sp, i)["offset"].alias("offset"),
                F.get(sp, i)["media_ref"].alias("media_ref"),
                F.coalesce(
                    neighbor_text(i, first), neighbor_text(i, second)
                ).alias("caption"),
                F.when(
                    neighbor_text(i, first).isNotNull(),
                    F.lit("after" if prefer == "after" else "before"),
                )
                .otherwise(F.lit("before" if prefer == "after" else "after"))
                .alias("caption_side"),
            ),
        ),
        lambda s: s["media_ref"].isNotNull() & s["caption"].isNotNull(),
    )
    return (
        _with_ordered_barrier(df, spans_col)
        .select(F.col(id_col).alias(id_col), F.explode(items).alias("m"))
        .select(
            id_col,
            F.col("m.offset").alias("offset"),
            F.col("m.media_ref").alias("media_ref"),
            F.col("m.caption").alias("caption"),
            F.col("m.caption_side").alias("caption_side"),
        )
    )


def interleaved_quality_signals(
    df: DataFrame,
    spans_col: str = "spans",
    media_token_cost: int = 256,
) -> DataFrame:
    """Per-doc multimodal quality signals (the MMC4/OBELICS document-level
    gate inputs): span/media/text-token counts, the media fraction, and
    ``max_media_run`` -- the longest run of consecutive media spans (an
    image-wall/gallery-spam detector: a doc whose spans are mostly
    back-to-back images carries no interleaved alignment signal). All pure
    per-row exprs behind one Generate barrier; the run length is a single
    array fold, zero shuffle."""
    text_toks, n_media = token_cost_columns(spans_col)
    sp = F.col("_mc_sp")
    run = F.aggregate(
        F.transform(sp, lambda s: s["media_ref"].isNotNull()),
        F.struct(F.lit(0).alias("cur"), F.lit(0).alias("best")),
        lambda acc, m: F.struct(
            F.when(m, acc["cur"] + 1).otherwise(F.lit(0)).alias("cur"),
            F.greatest(
                acc["best"], F.when(m, acc["cur"] + 1).otherwise(F.lit(0))
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return (
        _with_ordered_barrier(df, spans_col)
        .withColumn("n_spans", F.size(sp).cast("long"))
        .withColumn("n_media_spans", n_media)
        .withColumn("n_text_tokens", text_toks)
        .withColumn(
            "n_tokens",
            (
                F.col("n_text_tokens")
                + F.col("n_media_spans") * F.lit(media_token_cost)
            ).cast("bigint"),
        )
        .withColumn(
            "media_fraction", F.try_divide(F.col("n_media_spans"), F.col("n_spans"))
        )
        .withColumn("max_media_run", run.cast("long"))
        .drop("_mc_sp")
    )


def interleaved_quality_gate(
    df: DataFrame,
    spans_col: str = "spans",
    max_media: int = 32,
    max_media_run: int = 3,
    min_text_tokens: int = 8,
    media_token_cost: int = 256,
) -> DataFrame:
    """Document-level multimodal quality gate over the signals: flags docs
    whose media count exceeds ``max_media`` (gallery pages), whose longest
    consecutive media run exceeds ``max_media_run`` (image walls), or whose
    text mass is under ``min_text_tokens`` (no alignment signal). Adds the
    three flag columns and ``keep`` (no flag fired); filter on ``keep`` to
    apply. Per-row exprs only -- composes with any scan without a shuffle."""
    out = interleaved_quality_signals(df, spans_col, media_token_cost)
    return (
        out.withColumn("flag_media_budget", F.col("n_media_spans") > max_media)
        .withColumn("flag_media_run", F.col("max_media_run") > max_media_run)
        .withColumn("flag_low_text", F.col("n_text_tokens") < min_text_tokens)
        .withColumn(
            "keep",
            ~(
                F.col("flag_media_budget")
                | F.col("flag_media_run")
                | F.col("flag_low_text")
            ),
        )
    )


def spans_to_text(
    df: DataFrame,
    spans_col: str = "spans",
    out_col: str = "text",
    sep: str = " ",
    media_sentinel: str | dict[str, str] | None = None,
) -> DataFrame:
    """Adds ``out_col`` = the doc's text spans (offset order, nulls dropped)
    joined with ``sep`` -- the flattened view every text-tier operator
    consumes. With ``media_sentinel``, media spans contribute a placeholder
    token at their interleaved position instead of vanishing -- the standard
    tokenizer bridge for multimodal training (LLaVA/OBELICS-style
    ``<image>`` markers); pass a string for one sentinel or a
    {kind: sentinel} map (kinds absent from the map still vanish). Pure
    per-row exprs, zero shuffle."""
    if media_sentinel is None:
        rendered = F.transform(_ordered_spans(spans_col), lambda s: s["text"])
    elif isinstance(media_sentinel, str):
        rendered = F.transform(
            _ordered_spans(spans_col),
            lambda s: F.when(
                s["media_ref"].isNotNull(), F.lit(media_sentinel)
            ).otherwise(s["text"]),
        )
    else:
        kind_map = F.create_map(
            *[F.lit(x) for kv in media_sentinel.items() for x in kv]
        )
        rendered = F.transform(
            _ordered_spans(spans_col),
            lambda s: F.when(
                s["media_ref"].isNotNull(), kind_map[s["kind"]]
            ).otherwise(s["text"]),
        )
    texts = F.filter(rendered, lambda t: t.isNotNull())
    return df.withColumn(out_col, F.array_join(texts, sep))


def merge_span_kind_transitions(*censuses: DataFrame) -> DataFrame:
    """Sum-merge transition censuses (standing-index update path: documents
    arrive whole, so census(A ∪ B) == merge(census(A), census(B)) exactly --
    fold each crawl increment's census into the standing one instead of
    re-scanning the corpus)."""
    u = censuses[0]
    for c in censuses[1:]:
        u = u.unionByName(c)
    return u.groupBy("src", "dst").agg(
        F.sum("n_transitions").alias("n_transitions")
    )


def merge_media_ref_census(*censuses: DataFrame) -> DataFrame:
    """Sum-merge media-reuse censuses. Exact under the docs-arrive-whole
    invariant AND disjoint doc_id sets between increments (n_docs is a
    distinct count per ref; a doc split across increments would double-count
    -- the same contract as the gram-count index)."""
    u = censuses[0]
    for c in censuses[1:]:
        u = u.unionByName(c)
    return u.groupBy("media_ref").agg(
        F.sum("n_docs").alias("n_docs"), F.sum("n_slots").alias("n_slots")
    )


def span_structure_drift(
    baseline: DataFrame,
    current: DataFrame,
    spans_col: str = "spans",
    alpha: float = 0.5,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Structural drift between two interleaved snapshots: PSI + chi-square
    over the span-kind TRANSITION distribution (each doc contributes its
    BOS/EOS-bounded kind edges as categorical observations). A crawler or
    extractor change that reshapes documents -- dropped alt-text, merged text
    runs, vanished images -- moves this distribution before any content-level
    check fires. The two bounded censuses feed the standard PSI/chi2 rollup
    DIRECTLY as weighted counts (never re-expanded to observation rows --
    a trillion-transition corpus still contributes <= (kinds+1)^2 rows)."""
    from ..checks.drift import _psi_chi2_rollup

    def census(df: DataFrame, cnt: str) -> DataFrame:
        return span_kind_transitions(df, spans_col=spans_col).select(
            F.concat_ws("->", "src", "dst").alias("bucket"),
            F.col("n_transitions").alias(cnt),
        )

    counts = (
        census(baseline, "cnt_b")
        .join(census(current, "cnt_c"), on="bucket", how="full_outer")
        .select(
            "bucket",
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
            F.coalesce("cnt_c", F.lit(0)).alias("cnt_c"),
        )
    )
    return _psi_chi2_rollup(counts, [], alpha, psi_threshold)


def layout_drift(
    baseline: DataFrame,
    current: DataFrame,
    spans_col: str = "spans",
    len_bucket: int = 16,
    alpha: float = 0.5,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Template-distribution drift between two interleaved snapshots: PSI +
    chi-square over the per-LAYOUT document counts -- finer-grained than
    ``span_structure_drift`` (which pools all docs into one kind-transition
    distribution): a template family gaining or losing share trips this even
    when the aggregate transition mix is unchanged (e.g. a new boilerplate
    page shape with the same text/image alternation). Each side folds to its
    bounded layout census (distinct templates, not corpus size) and the two
    censuses feed the standard PSI/chi2 rollup as weighted counts."""
    from ..checks.drift import _psi_chi2_rollup

    def census(df: DataFrame, cnt: str) -> DataFrame:
        return (
            layout_fingerprint(df, spans_col, len_bucket)
            .groupBy("layout_key")
            .agg(F.count(F.lit(1)).alias(cnt))
            .select(F.col("layout_key").cast("string").alias("bucket"), cnt)
        )

    counts = (
        census(baseline, "cnt_b")
        .join(census(current, "cnt_c"), on="bucket", how="full_outer")
        .select(
            "bucket",
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
            F.coalesce("cnt_c", F.lit(0)).alias("cnt_c"),
        )
    )
    return _psi_chi2_rollup(counts, [], alpha, psi_threshold)


_SPAN_STRUCT_DDL = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def normalize_interleaved(
    df: DataFrame,
    spans_col: str = "spans",
    sep: str = " ",
    drop_empty: bool = True,
    merge_adjacent_text: bool = True,
) -> DataFrame:
    """Repair/normalization transform for pre-validation interleaved docs:
    spans sorted by offset, degenerate spans dropped (a text span with a
    null/empty text, a media span with a null media_ref -- with
    ``drop_empty``), and runs of ADJACENT text spans merged into one span
    (texts joined with ``sep``, keeping the run's first kind and offset) --
    the standard cleanup after span-level dedup or HTML re-extraction leaves
    fragmented text. Replaces ``spans_col`` and adds ``n_dropped_spans`` /
    ``n_merged_spans`` provenance counts. The merge is a single array fold
    (append-or-extend-last); everything is per-row exprs, zero shuffle."""
    ordered = _ordered_spans(spans_col)
    is_media = lambda s: s["media_ref"].isNotNull()  # noqa: E731
    if drop_empty:
        kept = F.filter(
            ordered,
            lambda s: is_media(s)
            | (s["text"].isNotNull() & (F.length(s["text"]) > 0)),
        )
    else:
        kept = ordered

    def repack(s) -> F.Column:
        return F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        )

    ka = F.col("_ni_kept")
    if merge_adjacent_text:
        spans_out = F.aggregate(
            ka,
            F.array().cast(_SPAN_STRUCT_DDL),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & F.element_at(acc, -1)["media_ref"].isNull()
                & s["media_ref"].isNull(),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)["kind"].alias("kind"),
                            F.concat_ws(
                                sep, F.element_at(acc, -1)["text"], s["text"]
                            ).alias("text"),
                            F.lit(None).cast("string").alias("media_ref"),
                            F.element_at(acc, -1)["offset"].alias("offset"),
                        )
                    ),
                ),
            ).otherwise(F.concat(acc, F.array(repack(s)))),
        )
    else:
        spans_out = F.transform(ka, repack)
    return (
        # explode(array(e)) barrier: the fold, both counts and the dropped
        # diff all read the kept array; without the Generate CollapseProject
        # would re-inline the sort+filter per reference
        df.withColumn("_ni_kept", F.explode(F.array(kept)))
        .withColumn(
            "n_dropped_spans",
            (F.size(F.col(spans_col)) - F.size(ka)).cast("long"),
        )
        .withColumn(spans_col, spans_out.cast(_SPAN_STRUCT_DDL))
        .withColumn(
            "n_merged_spans", (F.size(ka) - F.size(F.col(spans_col))).cast("long")
        )
        .drop("_ni_kept")
    )


def media_census_drift(
    baseline: DataFrame,
    current: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Media-side drift between two interleaved snapshots -- the fourth leg
    of the drift family (structure = kind transitions, layout = templates,
    embedding = centroids, media = refs): PSI + chi-square over the per-
    media_ref SLOT-count distribution plus new / vanished / shared ref
    counts (a CDN migration or asset re-hash shows up as mass vanish+new with
    an unchanged structural mix). Each side folds to its bounded reuse census
    first, so the compare costs distinct refs, not corpus size; the two
    one-row aggregates cross-join at driver cost."""
    from ..checks.drift import _psi_chi2_rollup

    def census(df: DataFrame, cnt: str) -> DataFrame:
        return media_ref_census(df, spans_col, id_col).select(
            F.col("media_ref").alias("bucket"), F.col("n_slots").alias(cnt)
        )

    counts = (
        census(baseline, "cnt_b")
        .join(census(current, "cnt_c"), on="bucket", how="full_outer")
        .select(
            "bucket",
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
            F.coalesce("cnt_c", F.lit(0)).alias("cnt_c"),
        )
        .persist()
    )
    roll = _psi_chi2_rollup(counts, [], alpha, psi_threshold)
    b, c = F.col("cnt_b"), F.col("cnt_c")
    extra = counts.agg(
        F.sum(((b > 0) & (c == 0)).cast("long")).alias("n_vanished_refs"),
        F.sum(((b == 0) & (c > 0)).cast("long")).alias("n_new_refs"),
        F.sum(((b > 0) & (c > 0)).cast("long")).alias("n_shared_refs"),
    )
    return roll.crossJoin(extra)


def span_text_census(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-document duplicate TEXT-SPAN census on the interleaved shape:
    [span_key (xxhash64 of exact span text), n_docs] -- the span-granularity
    analog of the line-dedup census (nav chunks, footers, cookie banners that
    the extractor emitted as whole spans). Map-side (key, doc) collapse first
    (a span shared by millions of docs is exactly the hot key the combine
    absorbs), then ONE groupBy(key). Sum-mergeable across increments under
    docs-arrive-whole + disjoint doc ids."""
    texts = F.filter(
        F.transform(F.col(spans_col), lambda s: s["text"]), lambda t: t.isNotNull()
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(texts).alias("__t"))
        .select("id", F.xxhash64("__t").alias("span_key"))
        .dropDuplicates(["id", "span_key"])
        .groupBy("span_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def dedup_boilerplate_spans(
    df: DataFrame,
    min_docs: int = 3,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    census: DataFrame | None = None,
) -> DataFrame:
    """Strip text spans appearing verbatim in >= min_docs DISTINCT documents
    from every document's span array (the interleaved-native boilerplate
    tier; media spans and sub-threshold text always survive, offsets keep
    their source values -- they index the ORIGINAL byte stream).

    Same plan shape as the line-dedup rewrite: posexplode + left join on the
    8-byte key against the ABOVE-THRESHOLD banned table only, ordered per-doc
    rebuild via array_sort(collect_list(struct(pos, span))) bounded by doc
    size. Returns [id_col, spans (cleaned), n_spans, n_removed_spans].
    Pass a precomputed ``census`` (standing state) to skip the census scan."""
    c = census if census is not None else span_text_census(df, spans_col, id_col)
    banned = c.filter(F.col("n_docs") >= min_docs).select("span_key")
    # posexplode_OUTER: a document with an empty span array must survive
    # (with an empty cleaned array), not vanish from the output
    ex = df.select(
        F.col(id_col).alias("id"), F.posexplode_outer(F.col(spans_col)).alias("pos", "s")
    ).withColumn(
        "span_key",
        F.when(F.col("s.text").isNotNull(), F.xxhash64(F.col("s.text"))),
    )
    judged = ex.join(
        banned.withColumnRenamed("span_key", "__bk"),
        on=F.col("span_key") == F.col("__bk"),
        how="left",
    ).withColumn("__banned", F.col("__bk").isNotNull())
    rebuilt = judged.groupBy("id").agg(
        F.sum(F.col("s").isNotNull().cast("long")).alias("n_spans"),
        F.sum(F.col("__banned").cast("long")).alias("n_removed_spans"),
        F.transform(
            F.array_sort(
                F.collect_list(  # nulls (banned or outer-padding) are skipped
                    F.when(
                        F.col("s").isNotNull() & ~F.col("__banned"),
                        F.struct(F.col("pos").alias("pos"), F.col("s").alias("s")),
                    )
                )
            ),
            lambda x: x["s"],
        ).alias(spans_col),
    )
    return rebuilt.select(
        F.col("id").alias(id_col), spans_col, "n_spans", "n_removed_spans"
    )


def layout_fingerprint(
    df: DataFrame,
    spans_col: str = "spans",
    len_bucket: int = 16,
    out_col: str = "layout",
    key_col: str = "layout_key",
) -> DataFrame:
    """Per-document STRUCTURAL fingerprint of the interleaved shape: the
    offset-ordered sequence of ``kind#length-bucket`` tokens (text spans
    bucket their text length by ``len_bucket``; payload-less media spans get
    ``kind#-``). Content-blind and media-identity-blind by construction, so
    two templated pages with different wording/images but the same skeleton
    collide -- the dedup signal exact/MinHash content tiers cannot see.
    Adds ``out_col`` (the canonical layout string) and ``key_col`` (its
    8-byte xxhash64). Pure per-row exprs, zero shuffle."""
    toks = F.transform(
        _ordered_spans(spans_col),
        lambda s: F.concat_ws(
            "#",
            s["kind"],
            F.when(s["text"].isNull(), F.lit("-")).otherwise(
                F.floor(F.length(s["text"]) / F.lit(len_bucket)).cast("string")
            ),
        ),
    )
    return df.withColumn(out_col, F.array_join(toks, "|")).withColumn(
        key_col, F.xxhash64(F.col(out_col))
    )


def layout_clusters(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    len_bucket: int = 16,
    min_cluster: int = 2,
) -> DataFrame:
    """Layout-duplicate census: clusters of documents sharing a structural
    fingerprint (the template-dedup tier). ONE groupBy on the 8-byte
    fingerprint -- the shuffle carries the hash, never the layout string, so
    a 500-span document costs the same 8 bytes as a 2-span one. Output
    mirrors ``exact_duplicates``: [layout_key, representative (min id),
    cluster_size, n_spans], clusters below ``min_cluster`` dropped. Same
    collision contract as the content-hash dedup tiers (xxhash64 keys)."""
    lf = layout_fingerprint(df, spans_col, len_bucket)
    return (
        lf.select(
            "layout_key",
            F.col(id_col).alias("id"),
            F.size(F.col(spans_col)).cast("long").alias("__n"),
        )
        .groupBy("layout_key")
        .agg(
            F.min("id").alias("representative"),
            F.count(F.lit(1)).alias("cluster_size"),
            F.max("__n").alias("n_spans"),  # equal within a layout cluster
        )
        .filter(F.col("cluster_size") >= min_cluster)
    )


def layout_census(
    df: DataFrame,
    group_col: str = "source",
    spans_col: str = "spans",
    len_bucket: int = 16,
) -> DataFrame:
    """Per-group structural-template census: [group, layout_key, n_docs] --
    how many documents of each group share each layout fingerprint. ONE
    groupBy on (group, 8-byte key) with map-side combine (a template stamped
    over millions of docs is exactly the hot key the combine absorbs).
    Sum-mergeable across increments under docs-arrive-whole: fold a crawl
    increment's census into the standing one instead of re-scanning."""
    lf = layout_fingerprint(df, spans_col, len_bucket)
    return (
        lf.select(F.col(group_col).alias("group"), "layout_key")
        .groupBy("group", "layout_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def merge_layout_census(*censuses: DataFrame) -> DataFrame:
    """Sum-merge layout censuses (standing-index update path; exact because
    every document contributes its one fingerprint exactly once)."""
    u = censuses[0]
    for c in censuses[1:]:
        u = u.unionByName(c)
    return u.groupBy("group", "layout_key").agg(F.sum("n_docs").alias("n_docs"))


def layout_diversity(census: DataFrame) -> DataFrame:
    """Template-diversity rollup of a ``layout_census``: per group the doc
    count, distinct-layout count, ``template_ratio`` = 1 - layouts/docs
    (0 = every doc its own structure, -> 1 = one template stamped everywhere)
    and ``top_layout_share`` = the hottest template's share of the group --
    the template-farm detector for source-level curation. Input is the
    already-bounded census, so this costs one tiny groupBy however large the
    corpus was."""
    return census.groupBy("group").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_layouts"),
        (1.0 - F.count(F.lit(1)) / F.sum("n_docs")).alias("template_ratio"),
        (F.max("n_docs") / F.sum("n_docs")).alias("top_layout_share"),
    )


def token_cost_columns(spans_col: str = "spans") -> tuple[F.Column, F.Column]:
    """The two per-row accounting exprs behind ``span_token_costs`` --
    (BPE-ish text-token count, media-span count) -- exposed so the fused
    incremental engine can sum them as pure partials."""
    from .text import bpe_token_count

    spans = F.col(spans_col)
    text_toks = F.aggregate(
        F.transform(spans, lambda s: F.coalesce(bpe_token_count(s["text"]), F.lit(0))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_media = F.size(F.filter(spans, lambda s: s["media_ref"].isNotNull())).cast("long")
    return text_toks, n_media


def media_cost_column(
    spans_col: str = "spans",
    media_token_cost: int = 256,
    media_token_costs: dict[str, int] | None = None,
) -> F.Column:
    """Total media token cost for a row: flat ``media_token_cost`` per media
    span, or -- with ``media_token_costs`` -- a per-KIND cost map (real
    multimodal trainers cost video frames >> a single image; audio sits in
    between), kinds absent from the map falling back to the flat cost."""
    spans = F.col(spans_col)
    media = F.filter(spans, lambda s: s["media_ref"].isNotNull())
    if not media_token_costs:
        return (F.size(media).cast("long") * F.lit(media_token_cost)).cast(
            "bigint"
        )
    kind_map = F.create_map(
        *[F.lit(x) for kv in media_token_costs.items() for x in kv]
    )
    return F.aggregate(
        F.transform(
            media,
            lambda s: F.coalesce(
                kind_map[s["kind"]].cast("bigint"), F.lit(media_token_cost)
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def span_token_costs(
    df: DataFrame,
    spans_col: str = "spans",
    media_token_cost: int = 256,
    out_col: str = "n_tokens",
    media_token_costs: dict[str, int] | None = None,
) -> DataFrame:
    """Per-document training-token accounting on the interleaved shape: text
    spans cost their BPE-ish token count, media spans a flat
    ``media_token_cost`` (the vision-token slots an image occupies in a
    multimodal context window) or a per-kind cost via ``media_token_costs``
    (see ``media_cost_column``). Adds ``n_text_tokens``, ``n_media_spans``
    and ``out_col`` = text + media cost. Pure per-row exprs, zero shuffle --
    the budget input for ``pack_interleaved`` and token-budget curation."""
    text_toks, n_media = token_cost_columns(spans_col)
    return (
        df.withColumn("n_text_tokens", text_toks)
        .withColumn("n_media_spans", n_media)
        .withColumn(
            out_col,
            (
                F.col("n_text_tokens")
                + media_cost_column(spans_col, media_token_cost, media_token_costs)
            ).cast("bigint"),
        )
    )


def chunk_interleaved(
    df: DataFrame,
    chunk_tokens: int = 8192,
    media_token_cost: int = 256,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    media_token_costs: dict[str, int] | None = None,
) -> DataFrame:
    """Split each interleaved document into SPAN-ALIGNED context windows:
    consecutive offset-ordered spans are packed greedily until the multimodal
    token budget (text BPE-ish count + flat ``media_token_cost`` per media
    span) would overflow, then a new chunk starts. Spans are never split --
    a single span costlier than the whole budget gets its own chunk -- so a
    media span always lands whole in exactly one window. The WITHIN-doc
    counterpart of ``pack_interleaved`` (which packs docs into chunks): run
    this first when single documents exceed the context window.

    One output row per (doc, chunk): [id_col, chunk_id, spans, n_spans,
    n_tokens]. Documents with empty span arrays emit no chunks. The greedy
    fold, the chunk partition and the per-chunk stats are all per-row array
    exprs behind explode barriers + ONE Generate -- zero shuffle."""
    from .text import bpe_token_count

    if media_token_costs:
        kind_map = F.create_map(
            *[F.lit(x) for kv in media_token_costs.items() for x in kv]
        )
        media_cost = lambda s: F.coalesce(  # noqa: E731
            kind_map[s["kind"]].cast("bigint"),
            F.lit(media_token_cost).cast("bigint"),
        )
    else:
        media_cost = lambda s: F.lit(media_token_cost).cast("bigint")  # noqa: E731
    costed_expr = F.transform(
        _ordered_spans(spans_col),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
            F.when(
                s["media_ref"].isNotNull(),
                media_cost(s),
            )
            .otherwise(F.coalesce(bpe_token_count(s["text"]), F.lit(0)).cast("bigint"))
            .alias("cost"),
        ),
    )
    # barrier 1: the costed array is referenced many times downstream --
    # explode(array(.)) stops CollapseProject re-inlining it per use
    d1 = df.select(
        F.col(id_col), F.explode(F.array(costed_expr)).alias("__costed")
    )
    acc0 = F.struct(
        F.lit(0).cast("bigint").alias("cur"),
        F.lit(0).cast("bigint").alias("chunk"),
        F.array().cast("array<bigint>").alias("ids"),
    )

    def fold(acc, s):
        overflow = (acc["cur"] > 0) & (acc["cur"] + s["cost"] > chunk_tokens)
        nxt_chunk = F.when(overflow, acc["chunk"] + 1).otherwise(acc["chunk"])
        return F.struct(
            F.when(overflow, s["cost"]).otherwise(acc["cur"] + s["cost"]).alias("cur"),
            nxt_chunk.alias("chunk"),
            F.concat(acc["ids"], F.array(nxt_chunk)).alias("ids"),
        )

    # barrier 2: the fold result feeds both the zip and the chunk count
    d2 = d1.select(
        id_col,
        "__costed",
        F.explode(F.array(F.aggregate(F.col("__costed"), acc0, fold))).alias("__acc"),
    )
    zipped = F.zip_with(
        F.col("__costed"),
        F.col("__acc.ids"),
        lambda s, i: F.struct(i.alias("cid"), s.alias("s")),
    )
    chunks = F.when(
        F.size("__costed") > 0,
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), F.col("__acc.chunk")),
            lambda c: F.filter(zipped, lambda z: z["cid"] == c),
        ),
    ).otherwise(F.array().cast(
        "array<array<struct<cid:bigint,s:struct<kind:string,text:string,"
        "media_ref:string,offset:int,cost:bigint>>>>"
    ))
    d3 = d2.select(id_col, F.posexplode(chunks).alias("chunk_id", "__chunk"))
    spans_out = F.transform(
        F.col("__chunk"),
        lambda z: F.struct(
            z["s"]["kind"].alias("kind"),
            z["s"]["text"].alias("text"),
            z["s"]["media_ref"].alias("media_ref"),
            z["s"]["offset"].alias("offset"),
        ),
    )
    n_tokens = F.aggregate(
        F.col("__chunk"),
        F.lit(0).cast("bigint"),
        lambda acc, z: acc + z["s"]["cost"],
    )
    return d3.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        spans_out.alias(spans_col),
        F.size("__chunk").cast("bigint").alias("n_spans"),
        n_tokens.alias("n_tokens"),
    )


def pack_interleaved(
    df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    chunk_tokens: int = 8192,
    media_token_cost: int = 256,
    num_bins: int = 64,
    bin_col: F.Column | None = None,
    media_token_costs: dict[str, int] | None = None,
) -> DataFrame:
    """Concat-and-chunk packing of INTERLEAVED documents: delegates to
    ``pack_sequences`` with the span-aware token cost from
    ``span_token_costs``, so a document's images occupy their vision-token
    slots in the packed context window instead of packing for free. Same
    output columns and chunk semantics as ``pack_sequences`` (one shuffle on
    the deterministic bin id, no global sort)."""
    from .curation import pack_sequences

    costed = span_token_costs(
        df, spans_col, media_token_cost, media_token_costs=media_token_costs
    )
    return pack_sequences(
        costed,
        id_col=id_col,
        token_col="n_tokens",
        chunk_tokens=chunk_tokens,
        num_bins=num_bins,
        bin_col=bin_col,
    )


def caption_consistency(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    prefer: str = "after",
) -> DataFrame:
    """Same-media-different-caption audit: per media_ref, how many times the
    asset is used as an image-text pair and how many DISTINCT captions
    (whitespace/case-normalized) it carries. An asset re-captioned across
    documents is the canonical alt-text inconsistency / caption-spam signal
    a CLIP-style pair extraction should quarantine.

    Builds on caption_pairs (zero-shuffle extraction), then ONE
    groupBy(media_ref) with map-side combine. Output: [media_ref, n_uses,
    n_distinct_captions, inconsistent]. Normalized caption strings (not
    hashes) are the distinct key so the count is exact; at extreme scale
    swap the key for xxhash64(norm) to narrow the shuffle (same counts up
    to hash collisions).
    """
    pairs = caption_pairs(df, spans_col=spans_col, id_col=id_col, prefer=prefer)
    norm = F.trim(F.regexp_replace(F.lower(F.col("caption")), r"\s+", " "))
    return (
        pairs.select("media_ref", norm.alias("cap"))
        .groupBy("media_ref")
        .agg(
            F.count(F.lit(1)).alias("n_uses"),
            F.count_distinct("cap").alias("n_distinct_captions"),
        )
        .withColumn("inconsistent", F.col("n_distinct_captions") > 1)
    )


def caption_consistency_summary(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    prefer: str = "after",
    max_inconsistent_fraction: float = 0.0,
) -> DataFrame:
    """Single-row rollup of caption_consistency: [n_refs, n_pairs,
    n_reused_refs, n_inconsistent_refs, max_distinct_captions,
    inconsistent_fraction, holds] where the fraction is over REUSED refs
    (single-use assets cannot be inconsistent)."""
    c = caption_consistency(df, spans_col=spans_col, id_col=id_col, prefer=prefer)
    reused = F.col("n_uses") > 1
    out = c.agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.sum("n_uses").alias("n_pairs"),
        F.sum(reused.cast("long")).alias("n_reused_refs"),
        F.sum(F.col("inconsistent").cast("long")).alias("n_inconsistent_refs"),
        F.max("n_distinct_captions").alias("max_distinct_captions"),
    )
    frac = F.try_divide(
        F.col("n_inconsistent_refs"), F.col("n_reused_refs")
    )
    return out.select(
        "n_refs",
        "n_pairs",
        "n_reused_refs",
        "n_inconsistent_refs",
        "max_distinct_captions",
        frac.alias("inconsistent_fraction"),
        F.coalesce(
            frac <= F.lit(max_inconsistent_fraction), F.lit(True)
        ).alias("holds"),
    )
