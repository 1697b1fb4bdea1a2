"""Interleaved-doc analytics (pipelines/interleaved.py)."""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.interleaved import (
    media_ref_census,
    media_reuse_summary,
    span_kind_transitions,
    spans_to_text,
)

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (
            "d0",  # text -> image -> text, offsets deliberately OUT of order
            [
                _span("text", "world", None, 128),
                _span("text", "hello", None, 0),
                _span("image", None, "media://image/7", 64),
            ],
        ),
        ("d1", [_span("image", None, "media://image/7", 0)]),
        ("d2", []),
        (
            "d3",
            [
                _span("text", "solo", None, 0),
                _span("image", None, "media://image/9", 64),
                _span("image", None, "media://image/7", 128),
            ],
        ),
    ]
    return spark.createDataFrame(rows, SCHEMA).persist()


def test_transitions_with_bounds(spark, docs):
    got = {
        (r["src"], r["dst"]): r["n_transitions"]
        for r in span_kind_transitions(docs).collect()
    }
    want = {
        ("BOS", "text"): 2,  # d0, d3
        ("text", "image"): 2,  # d0 (hello->image), d3
        ("image", "text"): 1,  # d0 (image->world)
        ("text", "EOS"): 1,  # d0
        ("BOS", "image"): 1,  # d1
        ("image", "EOS"): 2,  # d1, d3
        ("image", "image"): 1,  # d3
        ("BOS", "EOS"): 1,  # d2 (empty doc)
    }
    assert got == want
    # conservation: total transitions = sum(len(spans) + 1)
    assert sum(got.values()) == (3 + 1) + (1 + 1) + (0 + 1) + (3 + 1)


def test_transitions_without_bounds(spark, docs):
    got = {
        (r["src"], r["dst"]): r["n_transitions"]
        for r in span_kind_transitions(docs, include_bounds=False).collect()
    }
    assert got == {
        ("text", "image"): 2,
        ("image", "text"): 1,
        ("image", "image"): 1,
    }


def test_media_census_and_summary(spark, docs):
    got = {
        r["media_ref"]: (r["n_docs"], r["n_slots"])
        for r in media_ref_census(docs).collect()
    }
    assert got == {"media://image/7": (3, 3), "media://image/9": (1, 1)}
    s = media_reuse_summary(docs, hot_docs=2).collect()[0]
    assert (s["n_media_slots"], s["n_distinct_refs"], s["n_hot_refs"], s["max_doc_reuse"]) == (
        4,
        2,
        1,
        3,
    )


def test_spans_to_text_offset_order(spark, docs):
    got = {r["doc_id"]: r["text"] for r in spans_to_text(docs).collect()}
    assert got["d0"] == "hello world"  # offset order despite input order
    assert got["d1"] == ""
    assert got["d2"] == ""
    assert got["d3"] == "solo"


def test_merge_laws(spark, docs):
    from pyspark_validator.pipelines.interleaved import (
        merge_media_ref_census,
        merge_span_kind_transitions,
    )

    a = docs.filter(F.col("doc_id").isin("d0", "d1"))
    b = docs.filter(~F.col("doc_id").isin("d0", "d1"))

    def tset(df):
        return {(r["src"], r["dst"]): r["n_transitions"] for r in df.collect()}

    merged = merge_span_kind_transitions(
        span_kind_transitions(a), span_kind_transitions(b)
    )
    assert tset(merged) == tset(span_kind_transitions(docs))

    def mset(df):
        return {r["media_ref"]: (r["n_docs"], r["n_slots"]) for r in df.collect()}

    m2 = merge_media_ref_census(media_ref_census(a), media_ref_census(b))
    assert mset(m2) == mset(media_ref_census(docs))


def test_span_structure_drift(spark, docs):
    from pyspark_validator.pipelines.interleaved import span_structure_drift

    # identical snapshots: zero PSI, no drift
    same = span_structure_drift(docs, docs).collect()[0]
    assert same["psi"] == pytest.approx(0.0, abs=1e-12)
    assert not same["drift_detected"]
    # structural change: strip every image span -> big PSI
    no_media = docs.select(
        "doc_id",
        F.filter("spans", lambda s: s["kind"] == "text").alias("spans"),
    )
    moved = span_structure_drift(docs, no_media, psi_threshold=0.2).collect()[0]
    assert moved["psi"] > 0.2 and moved["drift_detected"]
    # conservation: weighted totals = sum(len(spans) + 1) over the 4 docs
    assert same["n_b"] == same["n_c"] == (3 + 1) + (1 + 1) + (0 + 1) + (3 + 1)


def test_dedup_boilerplate_spans(spark):
    from pyspark_validator.pipelines.interleaved import (
        dedup_boilerplate_spans,
        span_text_census,
    )

    footer = {"kind": "text", "text": "subscribe now", "media_ref": None, "offset": 900}
    rows = []
    for i in range(10):
        spans = [
            _span("text", f"unique body {i}", None, 0),
            _span("image", None, f"m://{i}", 64),
        ]
        if i % 2 == 0:
            spans.append(dict(footer))
        if i == 3:
            # same doc repeats the footer twice -> still ONE doc in the census
            spans.append(dict(footer))
            spans.append(dict(footer))
        rows.append((f"d{i}", spans))
    rows.append(("empty", []))
    df = spark.createDataFrame(rows, SCHEMA)

    census = {r["span_key"]: r["n_docs"] for r in span_text_census(df).collect()}
    import pyspark.sql.functions as SF

    fkey = (
        spark.range(1)
        .select(SF.xxhash64(SF.lit("subscribe now")).alias("k"))
        .collect()[0]["k"]
    )
    assert census[fkey] == 6  # docs 0,2,4,6,8 and 3 (distinct docs)

    out = {r["doc_id"]: r for r in dedup_boilerplate_spans(df, min_docs=3).collect()}
    assert len(out) == 11  # empty doc survives
    assert out["empty"]["n_spans"] == 0 and out["empty"]["spans"] == []
    for i in range(10):
        r = out[f"d{i}"]
        texts = [s["text"] for s in r["spans"]]
        assert "subscribe now" not in texts
        assert f"unique body {i}" in texts  # sub-threshold text survives
        assert any(s["kind"] == "image" for s in r["spans"])  # media survives
        expected_removed = {3: 2}.get(i, 1 if i % 2 == 0 else 0)
        assert r["n_removed_spans"] == expected_removed
        # offset order preserved
        offs = [s["offset"] for s in r["spans"]]
        assert offs == sorted(offs)


# ---------------------------------------------------------------------------
# layout fingerprint / clusters


@pytest.fixture(scope="module")
def layout_docs(spark):
    rows = [
        # t0/t1: same skeleton (text lens bucket equally, media slot in the
        # same place) but entirely different words and media identities
        (
            "t0",
            [
                _span("text", "aaaa bbbb cccc dddd", None, 0),  # len 19 -> bucket 1
                _span("image", None, "media://image/1", 19),
                _span("text", "xy", None, 300),  # len 2 -> bucket 0
            ],
        ),
        (
            "t1",
            [
                _span("text", "eeee ffff gggg hhhh", None, 0),  # len 19 -> bucket 1
                _span("image", None, "media://image/999", 19),
                _span("text", "zq", None, 300),
            ],
        ),
        # t2: same kinds but a text length in another bucket -> distinct layout
        (
            "t2",
            [
                _span("text", "a", None, 0),  # bucket 0, not 1
                _span("image", None, "media://image/1", 1),
                _span("text", "xy", None, 300),
            ],
        ),
        # t3: spans listed OUT of offset order; ordered layout equals t0's
        (
            "t3",
            [
                _span("text", "xy", None, 300),
                _span("image", None, "media://image/1", 19),
                _span("text", "aaaa bbbb cccc dddd", None, 0),
            ],
        ),
        ("t4", []),  # empty doc: layout "" -- its own (singleton) class
    ]
    return spark.createDataFrame(rows, SCHEMA).persist()


def test_layout_fingerprint_content_and_media_blind(spark, layout_docs):
    from pyspark_validator.pipelines.interleaved import layout_fingerprint

    got = {
        r["doc_id"]: (r["layout"], r["layout_key"])
        for r in layout_fingerprint(layout_docs).collect()
    }
    assert got["t0"][0] == "text#1|image#-|text#0"
    assert got["t0"] == got["t1"]  # content/media blind
    assert got["t0"] == got["t3"]  # offset-order canonicalization
    assert got["t2"][0] == "text#0|image#-|text#0"
    assert got["t2"] != got["t0"]
    assert got["t4"][0] == ""


def test_layout_clusters_min_and_representative(spark, layout_docs):
    from pyspark_validator.pipelines.interleaved import layout_clusters

    rows = layout_clusters(layout_docs, min_cluster=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["representative"] == "t0"
    assert r["cluster_size"] == 3
    assert r["n_spans"] == 3


def test_layout_len_bucket_knob(spark, layout_docs):
    from pyspark_validator.pipelines.interleaved import layout_fingerprint

    # bucket=1 is exact-length layout: t0 vs t1 still collide (equal lengths),
    # but a single-char difference in length would not
    got = {
        r["doc_id"]: r["layout"]
        for r in layout_fingerprint(layout_docs, len_bucket=1).collect()
    }
    assert got["t0"] == "text#19|image#-|text#2"
    assert got["t0"] == got["t1"]


# ---------------------------------------------------------------------------
# span token costs / interleaved packing


def test_span_token_costs_python_oracle(spark, docs):
    import re

    from pyspark_validator.pipelines.interleaved import span_token_costs
    from pyspark_validator.pipelines.text import BPE_TOKEN_PATTERN

    got = {
        r["doc_id"]: (r["n_text_tokens"], r["n_media_spans"], r["n_tokens"])
        for r in span_token_costs(docs, media_token_cost=10).collect()
    }
    texts = {
        "d0": ["world", "hello"],
        "d1": [],
        "d2": [],
        "d3": ["solo"],
    }
    media = {"d0": 1, "d1": 1, "d2": 0, "d3": 2}
    for doc, ts in texts.items():
        want_text = sum(len(re.findall(BPE_TOKEN_PATTERN, t)) for t in ts)
        assert got[doc] == (want_text, media[doc], want_text + 10 * media[doc]), doc


def test_pack_interleaved_matches_pack_sequences(spark, docs):
    from pyspark_validator.pipelines.curation import pack_sequences
    from pyspark_validator.pipelines.interleaved import (
        pack_interleaved,
        span_token_costs,
    )

    bin_col = F.lit(0)
    got = pack_interleaved(
        docs, chunk_tokens=4, media_token_cost=3, num_bins=1, bin_col=bin_col
    ).select("doc_id", "pack_bin", "n_tokens", "chunk_id", "chunk_offset")
    want = pack_sequences(
        span_token_costs(docs, media_token_cost=3),
        token_col="n_tokens",
        chunk_tokens=4,
        num_bins=1,
        bin_col=bin_col,
    ).select("doc_id", "pack_bin", "n_tokens", "chunk_id", "chunk_offset")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # token conservation: last doc's offset + preceding tokens == total
    rows = sorted(got.collect(), key=lambda r: r["doc_id"])
    total = sum(r["n_tokens"] for r in rows)
    last = rows[-1]
    assert last["chunk_id"] * 4 + last["chunk_offset"] + last["n_tokens"] == total


def test_layout_census_merge_law_and_diversity(spark, layout_docs):
    from pyspark_validator.pipelines.interleaved import (
        layout_census,
        layout_diversity,
        merge_layout_census,
    )

    tagged = layout_docs.withColumn(
        "source", F.when(F.col("doc_id") < "t2", "A").otherwise("B")
    )
    full = layout_census(tagged, "source")
    got = {(r["group"], r["layout_key"]): r["n_docs"] for r in full.collect()}
    # A = {t0, t1} share one layout; B = {t2, t3, t4} all distinct
    assert sorted(got.values()) == [1, 1, 1, 2]

    # sum-merge law: census(all) == merge(census(half1), census(half2))
    h1 = tagged.filter(F.col("doc_id").isin("t0", "t2", "t4"))
    h2 = tagged.filter(F.col("doc_id").isin("t1", "t3"))
    merged = merge_layout_census(layout_census(h1, "source"), layout_census(h2, "source"))
    got_m = {(r["group"], r["layout_key"]): r["n_docs"] for r in merged.collect()}
    assert got_m == got

    div = {r["group"]: r for r in layout_diversity(full).collect()}
    assert div["A"]["n_docs"] == 2 and div["A"]["n_layouts"] == 1
    assert div["A"]["template_ratio"] == pytest.approx(0.5)
    assert div["A"]["top_layout_share"] == pytest.approx(1.0)
    assert div["B"]["n_docs"] == 3 and div["B"]["n_layouts"] == 3
    assert div["B"]["template_ratio"] == pytest.approx(0.0)
    assert div["B"]["top_layout_share"] == pytest.approx(1 / 3)


# ---------------------------------------------------------------------------
# span-aligned greedy chunking


def _py_greedy(costs, budget):
    ids, cur, chunk = [], 0, 0
    for c in costs:
        if cur > 0 and cur + c > budget:
            chunk, cur = chunk + 1, 0
        ids.append(chunk)
        cur += c
    return ids


def test_chunk_interleaved_python_oracle(spark):
    import re

    from pyspark_validator.pipelines.interleaved import chunk_interleaved
    from pyspark_validator.pipelines.text import BPE_TOKEN_PATTERN

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    texts = ["one two three", "four five", "six", "seven eight nine ten", "x"]
    rows = []
    docs = {}
    for d in range(4):
        spans, costs = [], []
        for i in range(d + 2):
            t = texts[(d + i) % len(texts)]
            if (d + i) % 3 == 0:
                spans.append(sp("image", None, f"m://{d}/{i}", i * 100))
                costs.append(5)
            else:
                spans.append(sp("text", t, None, i * 100))
                costs.append(len(re.findall(BPE_TOKEN_PATTERN, t)))
        rows.append((f"d{d}", spans))
        docs[f"d{d}"] = (spans, costs)
    rows.append(("empty", []))
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = chunk_interleaved(df, chunk_tokens=6, media_token_cost=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = (
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]],
            r["n_spans"],
            r["n_tokens"],
        )
    assert "empty" not in got
    for d, (spans, costs) in docs.items():
        ids = _py_greedy(costs, 6)
        want_chunks = {}
        for i, cid in enumerate(ids):
            want_chunks.setdefault(cid, []).append(i)
        assert set(got[d]) == set(want_chunks), d
        for cid, idxs in want_chunks.items():
            w_spans = [
                (spans[i]["kind"], spans[i]["text"], spans[i]["media_ref"],
                 spans[i]["offset"])
                for i in idxs
            ]
            assert got[d][cid] == (w_spans, len(idxs), sum(costs[i] for i in idxs)), (d, cid)


def test_chunk_interleaved_laws(spark, docs):
    from pyspark_validator.pipelines.interleaved import (
        chunk_interleaved,
        span_token_costs,
    )

    out = chunk_interleaved(docs, chunk_tokens=3, media_token_cost=2)
    rows = out.collect()
    # budget law: a chunk exceeds the budget only when it is a single span
    for r in rows:
        assert r["n_tokens"] <= 3 or r["n_spans"] == 1, r
    # conservation law: concatenating a doc's chunks (chunk order) rebuilds
    # the offset-ordered span sequence, and token totals match
    per_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
        per_doc.setdefault(r["doc_id"], []).extend(
            (s["kind"], s["offset"]) for s in r["spans"]
        )
    tot = {
        r["doc_id"]: r["n_tokens"]
        for r in span_token_costs(docs, media_token_cost=2).collect()
    }
    chunk_tot = {}
    for r in rows:
        chunk_tot[r["doc_id"]] = chunk_tot.get(r["doc_id"], 0) + r["n_tokens"]
    for d, seq in per_doc.items():
        assert seq == sorted(seq, key=lambda t: t[1]), d
        assert chunk_tot[d] == tot[d], d


def test_layout_drift_identity_and_shift(spark, layout_docs):
    from pyspark_validator.pipelines.interleaved import layout_drift

    same = layout_drift(layout_docs, layout_docs).collect()[0]
    assert same["psi"] == pytest.approx(0.0, abs=1e-12)
    assert not same["drift_detected"]
    assert same["n_b"] == same["n_c"] == 5

    # planted shift: current = the template cluster only (t0/t1/t3 layout
    # takes 100% of the mass) -> PSI well above threshold
    cur = layout_docs.filter(F.col("doc_id").isin("t0", "t1", "t3"))
    moved = layout_drift(layout_docs, cur, psi_threshold=0.1).collect()[0]
    assert moved["psi"] > 0.1 and moved["drift_detected"]


def test_media_context_rows_and_summary(spark, docs):
    from pyspark_validator.pipelines.interleaved import (
        media_context,
        media_context_summary,
    )

    rows = {
        (r["doc_id"], r["offset"]): (
            r["prev_is_text"],
            r["next_is_text"],
            r["captioned"],
        )
        for r in media_context(docs).collect()
    }
    # d0 sorts to text(0) image(64) text(128): both neighbors text.
    # d1 single image: isolated. d3: image@64 captioned on the left only,
    # image@128 preceded by an image and at the doc edge: isolated.
    assert rows == {
        ("d0", 64): (True, True, True),
        ("d1", 0): (False, False, False),
        ("d3", 64): (True, False, True),
        ("d3", 128): (False, False, False),
    }
    s = media_context_summary(docs).collect()[0]
    assert (s["n_media"], s["n_captioned"], s["n_isolated"]) == (4, 2, 2)
    assert s["caption_ratio"] == pytest.approx(0.5)


def test_interleaved_quality_gate(spark, docs):
    from pyspark_validator.pipelines.interleaved import interleaved_quality_gate

    out = {
        r["doc_id"]: r
        for r in interleaved_quality_gate(
            docs, max_media=2, max_media_run=1, min_text_tokens=1
        ).collect()
    }
    assert out["d0"]["n_spans"] == 3 and out["d0"]["n_media_spans"] == 1
    assert out["d0"]["n_text_tokens"] == 2 and out["d0"]["max_media_run"] == 1
    assert out["d0"]["keep"]
    # d1: single isolated image, no text -> low-text flag only
    assert out["d1"]["flag_low_text"] and not out["d1"]["flag_media_run"]
    assert not out["d1"]["keep"] and out["d1"]["max_media_run"] == 1
    # d2: empty span list -> zero everything, low-text
    assert out["d2"]["n_spans"] == 0 and out["d2"]["max_media_run"] == 0
    assert out["d2"]["media_fraction"] is None and not out["d2"]["keep"]
    # d3: image-image run of 2 trips the run flag at max_media_run=1 but
    # respects the media budget (2 <= 2)
    assert out["d3"]["max_media_run"] == 2 and out["d3"]["flag_media_run"]
    assert not out["d3"]["flag_media_budget"] and not out["d3"]["keep"]
    assert out["d3"]["media_fraction"] == pytest.approx(2 / 3)
    # budget knob: max_media=1 flags d3 too
    strict = {
        r["doc_id"]: r["flag_media_budget"]
        for r in interleaved_quality_gate(docs, max_media=1).collect()
    }
    assert strict == {"d0": False, "d1": False, "d2": False, "d3": True}


def test_caption_pairs(spark, docs):
    from pyspark_validator.pipelines.interleaved import caption_pairs

    got = {
        (r["doc_id"], r["offset"]): (r["media_ref"], r["caption"], r["caption_side"])
        for r in caption_pairs(docs).collect()
    }
    # d0's image has text on both sides: prefer='after' picks "world";
    # d3@64 only has text before; d1 and d3@128 are isolated -> no rows
    assert got == {
        ("d0", 64): ("media://image/7", "world", "after"),
        ("d3", 64): ("media://image/9", "solo", "before"),
    }
    before = {
        (r["doc_id"], r["offset"]): (r["caption"], r["caption_side"])
        for r in caption_pairs(docs, prefer="before").collect()
    }
    assert before[("d0", 64)] == ("hello", "before")
    assert before[("d3", 64)] == ("solo", "before")
    with pytest.raises(ValueError):
        caption_pairs(docs, prefer="nearest")


def test_normalize_interleaved(spark):
    from pyspark_validator.pipelines.interleaved import normalize_interleaved

    rows = [
        (
            "frag",  # out-of-order fragments: merge into one text run per gap
            [
                _span("text", "c", None, 128),
                _span("image", None, "m://1", 64),
                _span("text", "a", None, 0),
                _span("text", "b", None, 32),
                _span("text", "d", None, 192),
            ],
        ),
        (
            "degen",  # empty/null text spans dropped, then survivors merge
            [
                _span("text", "", None, 0),
                _span("text", "keep", None, 32),
                _span("text", None, None, 64),
                _span("text", "me", None, 96),
                _span("image", None, None, 128),  # media without ref: dropped
            ],
        ),
        ("empty", []),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["doc_id"]: r for r in normalize_interleaved(df).collect()}

    frag = got["frag"]
    assert [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in frag["spans"]
    ] == [
        ("text", "a b", None, 0),
        ("image", None, "m://1", 64),
        ("text", "c d", None, 128),
    ]
    assert frag["n_dropped_spans"] == 0 and frag["n_merged_spans"] == 2

    degen = got["degen"]
    assert [(s["text"], s["offset"]) for s in degen["spans"]] == [("keep me", 32)]
    assert degen["n_dropped_spans"] == 3 and degen["n_merged_spans"] == 1

    assert got["empty"]["spans"] == [] and got["empty"]["n_dropped_spans"] == 0

    # knobs: no merge keeps fragments; no drop keeps degenerates
    nm = {
        r["doc_id"]: len(r["spans"])
        for r in normalize_interleaved(df, merge_adjacent_text=False).collect()
    }
    assert nm == {"frag": 5, "degen": 2, "empty": 0}
    nd = {
        r["doc_id"]: (len(r["spans"]), r["n_dropped_spans"])
        for r in normalize_interleaved(df, drop_empty=False).collect()
    }
    assert nd["degen"][1] == 0 and nd["frag"] == (3, 0)


def test_media_census_drift(spark, docs):
    from pyspark_validator.pipelines.interleaved import media_census_drift

    same = media_census_drift(docs, docs).collect()[0]
    assert same["psi"] == pytest.approx(0.0, abs=1e-12)
    assert not same["drift_detected"]
    assert (same["n_vanished_refs"], same["n_new_refs"], same["n_shared_refs"]) == (
        0, 0, 2,
    )
    assert same["n_b"] == same["n_c"] == 4  # total slots per side

    # planted: drop d3 -> m://9 vanishes entirely, m://7 loses one slot
    cur = docs.filter(F.col("doc_id") != "d3")
    moved = media_census_drift(docs, cur, psi_threshold=0.05).collect()[0]
    assert (moved["n_vanished_refs"], moved["n_new_refs"], moved["n_shared_refs"]) == (
        1, 0, 1,
    )
    assert moved["n_b"] == 4 and moved["n_c"] == 2
    assert moved["psi"] > 0.05 and moved["drift_detected"]


def test_media_context_census_merge_and_rollup(spark, docs):
    from pyspark_validator.pipelines.interleaved import (
        media_context_census,
        media_context_rollup,
        merge_media_context_census,
    )

    grouped = docs.withColumn(
        "grp", F.when(F.col("doc_id").isin("d0", "d1"), "a").otherwise("b")
    )
    census = media_context_census(grouped, ["grp"])
    got = {r["grp"]: (r["n_docs"], r["n_media"], r["n_captioned"])
           for r in census.collect()}
    assert got == {"a": (2, 2, 1), "b": (2, 2, 1)}

    # sum-merge law: census(A) ⊕ census(B) == census(A ∪ B)
    a = media_context_census(grouped.filter("doc_id in ('d0','d2')"), ["grp"])
    b = media_context_census(grouped.filter("doc_id in ('d1','d3')"), ["grp"])
    merged = {r["grp"]: (r["n_docs"], r["n_media"], r["n_captioned"])
              for r in merge_media_context_census(a, b).collect()}
    assert merged == got

    roll = {r["grp"]: (r["n_isolated"], r["caption_ratio"], r["media_per_doc"])
            for r in media_context_rollup(census).collect()}
    assert roll["a"] == (1, 0.5, 1.0) and roll["b"] == (1, 0.5, 1.0)
    # zero-media group: null ratio, not a divide error
    zm = media_context_rollup(
        media_context_census(docs.filter("doc_id = 'd2'"), [])
    ).collect()[0]
    assert zm["n_media"] == 0 and zm["caption_ratio"] is None


def test_spans_to_text_media_sentinels(spark, docs):
    from pyspark_validator.pipelines.interleaved import spans_to_text

    flat = {r["doc_id"]: r["text"]
            for r in spans_to_text(docs, media_sentinel="<image>").collect()}
    # d0 sorts to hello, image, world
    assert flat["d0"] == "hello <image> world"
    assert flat["d1"] == "<image>"
    assert flat["d2"] == ""
    assert flat["d3"] == "solo <image> <image>"
    # per-kind map: unknown kinds vanish (None from the map is filtered)
    m = {r["doc_id"]: r["text"]
         for r in spans_to_text(docs, media_sentinel={"video": "<vid>"}).collect()}
    assert m["d0"] == "hello world" and m["d1"] == ""
    m2 = {r["doc_id"]: r["text"]
          for r in spans_to_text(docs, media_sentinel={"image": "<img>"}).collect()}
    assert m2["d3"] == "solo <img> <img>"


def test_media_token_costs_by_kind(spark):
    from pyspark_validator.pipelines.interleaved import span_token_costs

    rows = [
        ("mm", [
            _span("text", "two words", None, 0),
            _span("image", None, "m://i", 10),
            _span("audio", None, "m://a", 20),
            _span("video", None, "m://v", 30),
        ]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    flat = span_token_costs(df, media_token_cost=100).collect()[0]
    assert flat["n_tokens"] == 2 + 3 * 100
    by_kind = span_token_costs(
        df, media_token_cost=100,
        media_token_costs={"image": 64, "video": 1024},
    ).collect()[0]
    # audio absent from the map -> flat fallback 100
    assert by_kind["n_tokens"] == 2 + 64 + 100 + 1024
    assert by_kind["n_media_spans"] == 3


def test_chunk_and_pack_per_kind_costs(spark):
    from pyspark_validator.pipelines.interleaved import (
        chunk_interleaved,
        pack_interleaved,
    )

    rows = [
        ("mm", [
            _span("text", "t", None, 0),
            _span("video", None, "m://v", 10),   # costs 9 under the map
            _span("image", None, "m://i", 20),   # costs 1
        ]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    # budget 10: [text(1) + video(9)] fills chunk 0 exactly; image starts 1
    chunks = chunk_interleaved(
        df, chunk_tokens=10, media_token_cost=5,
        media_token_costs={"video": 9, "image": 1},
    ).collect()
    got = {r["chunk_id"]: (r["n_spans"], r["n_tokens"]) for r in chunks}
    assert got == {0: (2, 10), 1: (1, 1)}
    # flat fallback: both media cost 5 -> text+video fill 6, image (5) would
    # overflow the 10 budget and starts chunk 1
    flat = chunk_interleaved(df, chunk_tokens=10, media_token_cost=5).collect()
    assert {r["chunk_id"]: r["n_tokens"] for r in flat} == {0: 6, 1: 5}

    packed = pack_interleaved(
        df, chunk_tokens=100, media_token_cost=5, num_bins=1,
        bin_col=F.lit(0), media_token_costs={"video": 9, "image": 1},
    )
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == 11
