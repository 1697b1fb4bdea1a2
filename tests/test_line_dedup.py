"""Corpus-wide duplicate-line removal (pipelines/dedup.py::dedup_lines).

Pure-python oracle re-derives the banned set and the rebuilt texts exactly.
"""

from __future__ import annotations

import pytest

from pyspark_validator.pipelines.dedup import dedup_lines, duplicate_lines

DOCS = [
    (1, "unique opening line.\nsubscribe to our newsletter\nreal content one."),
    (2, "real content two.\nsubscribe to our newsletter\ncookie banner text"),
    (3, "cookie banner text\nsubscribe to our newsletter\nreal content three."),
    (4, "repeated inside\nrepeated inside\nonly here once."),
    (5, "   \nindented structure kept\n   "),
    (6, ""),
]


def _py_banned(docs, min_docs):
    from collections import Counter

    c = Counter()
    for _, text in docs:
        seen = {l for l in text.split("\n") if l.strip()}
        c.update(seen)
    return {l: n for l, n in c.items() if n >= min_docs}


def _py_clean(text, banned):
    lines = text.split("\n")
    kept = [l for l in lines if l not in banned]
    removed = len(lines) - len(kept)
    return len(lines), removed, "\n".join(kept)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_duplicate_lines_census(docs_df):
    got = {r.line: r.n_docs for r in duplicate_lines(docs_df, min_docs=2).collect()}
    assert got == _py_banned(DOCS, 2)
    # the within-one-doc repeat is NOT corpus boilerplate
    assert "repeated inside" not in got
    # whitespace-only lines are never reported
    assert all(l.strip() for l in got)


def test_dedup_lines_matches_python(docs_df):
    banned = _py_banned(DOCS, 2)
    out = {
        r.doc_id: (r.n_lines, r.n_removed_lines, r.clean_text)
        for r in dedup_lines(docs_df, min_docs=2).collect()
    }
    for doc_id, text in DOCS:
        assert out[doc_id] == _py_clean(text, banned), doc_id


def test_min_docs_three_keeps_pairwise_lines(docs_df):
    banned = _py_banned(DOCS, 3)
    assert banned == {"subscribe to our newsletter": 3}
    out = {
        r.doc_id: r.clean_text for r in dedup_lines(docs_df, min_docs=3).collect()
    }
    assert out[2] == "real content two.\ncookie banner text"


def test_no_shared_lines_is_identity(spark):
    docs = [(i, f"alpha {i}.\nbeta {i}.") for i in range(6)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r.clean_text for r in dedup_lines(df, min_docs=2).collect()}
    assert out == {i: t for i, t in docs}
    census = duplicate_lines(df, min_docs=2).collect()
    assert census == []


def test_structure_lines_survive(docs_df):
    out = {r.doc_id: r.clean_text for r in dedup_lines(docs_df, min_docs=1).collect()}
    # min_docs=1 bans every non-blank line, but whitespace-only lines survive
    assert out[5] == "   \n   "
    assert out[6] == ""


def test_plan_no_cartesian(docs_df):
    plan = (
        dedup_lines(docs_df, min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
