"""Clustered SemDeDup (pipelines/similarity.py::cluster_cosine_pairs /
semantic_dedup_clustered) -- the published k-means form.

Laws pinned:
  * degenerate exactness: n_lists=1 puts everything in one cluster, so the
    pair set equals the full numpy cosine>=t pair set;
  * soundness: with any n_lists, every emitted pair is a true cosine>=t pair
    (subset of the numpy set) -- clustering can only lose recall, never
    precision;
  * planted recall: scaled copies normalize to bit-identical unit vectors, so
    they always share a cluster and are always dropped;
  * max_cluster guard: cap=1 drops every cluster -> no pairs, dedup = identity;
  * unit_normalize: unit norms, zero-vector passthrough, float-exactness of
    the x2-scaling invariance.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.similarity import (
    cluster_cosine_pairs,
    semantic_dedup_clustered,
    unit_normalize,
)

DIM, N = 8, 80


def _mat():
    rng = np.random.RandomState(7)
    m = rng.randn(N, DIM).astype(np.float32)
    return m


@pytest.fixture(scope="module")
def emb(spark):
    m = _mat()
    rows = [(i, [float(x) for x in m[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").persist()


def _numpy_pairs(m, t):
    mm = m.astype(np.float64)
    norms = np.sqrt((mm * mm).sum(1))
    cos = (mm @ mm.T) / np.outer(norms, norms)
    out = set()
    for i in range(len(mm)):
        for j in range(i + 1, len(mm)):
            if cos[i, j] >= t:
                out.add((i, j))
    return out


def test_single_cluster_equals_numpy_all_pairs(spark, emb):
    t = 0.5
    got = {
        (r["id_a"], r["id_b"])
        for r in cluster_cosine_pairs(emb, DIM, threshold=t, n_lists=1, iters=2).collect()
    }
    m = _mat().astype(np.float32).astype(np.float64)
    assert got == _numpy_pairs(m, t)


def test_clustered_pairs_are_sound(spark, emb):
    t = 0.5
    got = {
        (r["id_a"], r["id_b"])
        for r in cluster_cosine_pairs(emb, DIM, threshold=t, n_lists=6).collect()
    }
    m = _mat().astype(np.float32).astype(np.float64)
    assert got <= _numpy_pairs(m, t)


def test_planted_copies_always_dropped(spark, emb):
    dup = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda v: v * 2).alias("embedding"),
    )
    planted = emb.unionByName(dup)
    out = semantic_dedup_clustered(planted, DIM, threshold=0.999, n_lists=5)
    survivors = sorted(r["vec_id"] for r in out.select("vec_id").collect())
    assert survivors == list(range(N))


def test_max_cluster_guard(spark, emb):
    out = semantic_dedup_clustered(emb, DIM, threshold=0.0, n_lists=2, max_cluster=1)
    assert out.count() == N


def test_unit_normalize(spark):
    rows = [(0, [3.0, 4.0]), (1, [0.0, 0.0]), (2, [6.0, 8.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {r["vec_id"]: r["unit"] for r in unit_normalize(df).collect()}
    assert got[0] == pytest.approx([0.6, 0.8])
    assert got[1] == [0.0, 0.0]
    # x2-scaled copy normalizes bit-identically (powers of two are exact)
    assert got[2] == got[0]
