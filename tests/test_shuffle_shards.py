"""Deterministic corpus shuffle + sharding (pipelines/curation.py::
shuffle_shards / write_training_shards).

Laws pinned:
  * hashlib oracle: shard_id and shuffle_key match a pure-python md5
    re-derivation row-for-row;
  * determinism / seed sensitivity: same seed -> identical assignment across
    calls; different seed -> a different permutation;
  * partition coverage: every row lands in [0, n_shards);
  * assignment plan is Exchange-free (zero shuffle before the writer);
  * writer: each shard_id= dir holds exactly its rows, ordered by the
    shuffle key.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.curation import shuffle_shards, write_training_shards

N, SHARDS = 300, 7


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(N)], "doc_id bigint, text string"
    ).persist()


def _oracle(i, seed):
    key = hashlib.md5(f"{i}|{seed}".encode()).hexdigest()
    return key, int(key[:8], 16) % SHARDS


def test_hashlib_oracle(spark, docs):
    got = {
        r["doc_id"]: (r["shuffle_key"], r["shard_id"])
        for r in shuffle_shards(docs, n_shards=SHARDS, seed="ep0").collect()
    }
    for i in range(N):
        assert got[i] == _oracle(i, "ep0")


def test_seed_changes_permutation(spark, docs):
    a = shuffle_shards(docs, n_shards=SHARDS, seed="ep0")
    b = shuffle_shards(docs, n_shards=SHARDS, seed="ep1")
    order_a = [r["doc_id"] for r in a.orderBy("shuffle_key").collect()]
    order_b = [r["doc_id"] for r in b.orderBy("shuffle_key").collect()]
    assert sorted(order_a) == sorted(order_b) == list(range(N))
    assert order_a != order_b


def test_assignment_plan_exchange_free(spark, docs):
    plan = (
        shuffle_shards(docs, n_shards=SHARDS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_writer_layout(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=SHARDS, seed="ep0")
    back = spark.read.parquet(out)
    assert back.count() == N
    # every row is in its oracle shard
    for r in back.select("doc_id", "shard_id").collect():
        assert r["shard_id"] == _oracle(r["doc_id"], "ep0")[1]
    # within each shard dir, parquet row order == shuffle-key order
    for s in range(SHARDS):
        rows = spark.read.parquet(f"{out}/shard_id={s}").collect()
        keys = [r["shuffle_key"] for r in rows]
        assert keys == sorted(keys)
