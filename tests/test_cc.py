"""Connected-components dedup clustering: pairs -> groups.

Oracle: a driver-side union-find over the same edge list (the textbook
sequential algorithm), compared exactly. Reference analog: the reference's
dedup tooling stops at pair emission; clustering is the training-data-pipeline
step layered on top (SoCC'14 large-star/small-star)."""

import random

from pyspark.sql import functions as F

from pyspark_validator.pipelines.dedup import (
    connected_components,
    dedup_clusters,
    minhash_lsh_pairs,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    want = _uf_components(edges)
    assert got == want


def test_cc_chain(spark):
    # a 10-node path: worst diameter per node count -- exercises iteration
    _check(spark, [(i, i + 1) for i in range(9)])


def test_cc_two_components_mixed_direction(spark):
    _check(spark, [(5, 3), (3, 9), (20, 30), (31, 30), (9, 5)])


def test_cc_star_and_self_dup_edges(spark):
    # pre-converged star + duplicate and reversed edges must be a no-op
    _check(spark, [(1, 0), (2, 0), (0, 3), (3, 0), (1, 0)])


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_dedup_clusters_singletons_and_keep_one(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 4), (4, 6), (2, 3)], "id_a long, id_b long"
    )
    out = dedup_clusters(docs, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {0: 0, 4: 0, 6: 0, 2: 2, 3: 2, 1: 1, 5: 5, 7: 7}
    keep = (
        out.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("rep"))
        .orderBy("cluster_id")
        .collect()
    )
    assert [r["rep"] for r in keep] == [0, 1, 2, 5, 7]


def test_minhash_pairs_to_clusters_end_to_end(spark):
    # 3 exact copies + 1 unrelated: LSH pairs chain the copies into one cluster
    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, base),
            (9, "completely different content with no overlap at all " * 6),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.9)
    out = dedup_clusters(docs, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_cluster_keep_best_matches_union_find_argmax(spark):
    # survivors = per-component argmax(score, tie -> min id); singletons survive
    from pyspark_validator.pipelines.dedup import cluster_keep_best

    rng = random.Random(7)
    n = 60
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(45)})
    score = {i: (i * 37) % 11 for i in range(n)}
    comp = _uf_components(edges)
    groups = {}
    for node, root in comp.items():
        groups.setdefault(root, []).append(node)
    expect = set(range(n)) - set(comp)  # singletons
    for members in groups.values():
        expect.add(min(members, key=lambda i: (-score[i], i)))
    docs = spark.createDataFrame(
        [(i, score[i]) for i in range(n)], "doc_id long, quality long"
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = cluster_keep_best(docs, pairs, F.col("quality"), id_col="doc_id")
    assert sorted(r.doc_id for r in out.collect()) == sorted(expect)
    # schema is preserved (no helper columns leak)
    assert out.columns == ["doc_id", "quality"]
