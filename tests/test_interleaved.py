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
