"""k-NN join (pipelines/similarity.py::knn_join_brute / knn_join_lsh).

Laws pinned here:
  * brute == the numpy exact k-NN join (cosine desc, id asc tie-break),
    including exact-tie boundaries (planted duplicate vectors);
  * batch-boundary invariance: tiny Arrow batches / many partitions give the
    same rows (the per-batch top-k keeps >= kth-value ties, so no true
    winner is dropped);
  * LSH == brute restricted to the LSH candidate set (same planes, same
    probes) -- the spec law, computed independently in numpy;
  * exclude_self drops only (q == id) pairs;
  * plan: no CartesianProduct anywhere, brute shuffles only the window key.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.similarity import (
    _planes,
    ivf_build,
    knn_join_brute,
    knn_join_ivf,
    knn_join_lsh,
    probe_masks,
)


def _mk(spark, n=80, dim=8, seed=7, dups=True):
    rng = np.random.RandomState(seed)
    m = rng.normal(size=(n, dim))
    if dups:
        # planted exact duplicates => exact cosine ties at the top
        m[10] = m[3] * 2.0
        m[11] = m[3] * 0.5
    m32 = m.astype(np.float32)  # Spark stores array<float>; oracle must match
    rows = [(i, [float(x) for x in m32[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>"),
        m32.astype(np.float64),
    )


def _np_knn(q_ids, q_mat, c_ids, c_mat, k, exclude_self):
    qn = q_mat / np.maximum(np.sqrt((q_mat**2).sum(1))[:, None], 1e-300)
    cn = c_mat / np.maximum(np.sqrt((c_mat**2).sum(1))[:, None], 1e-300)
    sims = cn @ qn.T  # (corpus, queries)
    out = []
    for j, q in enumerate(q_ids):
        order = sorted(
            range(len(c_ids)),
            key=lambda i: (-sims[i, j], c_ids[i]),
        )
        if exclude_self:
            order = [i for i in order if c_ids[i] != q]
        for rank, i in enumerate(order[:k], start=1):
            out.append((int(q), int(c_ids[i]), rank, sims[i, j]))
    return out


@pytest.mark.parametrize("exclude_self", [False, True])
def test_brute_matches_numpy(spark, exclude_self):
    df, mat = _mk(spark)
    left = df.filter(F.col("vec_id") % 9 == 0)
    q_ids = [i for i in range(80) if i % 9 == 0]
    got = knn_join_brute(
        left, df, k=5, exclude_self=exclude_self, query_chunk=3
    ).collect()
    want = _np_knn(
        np.array(q_ids), mat[q_ids], np.arange(80), mat, 5, exclude_self
    )
    got_t = sorted((r.qid, r.id, r.rank) for r in got)
    assert got_t == sorted((q, i, rk) for q, i, rk, _ in want)
    by_key = {(q, i): c for q, i, _, c in want}
    for r in got:
        assert abs(r.cosine - by_key[(r.qid, r.id)]) < 1e-9


def test_brute_batch_invariance(spark):
    df, _ = _mk(spark, n=60)
    left = df.filter(F.col("vec_id") < 4)
    a = knn_join_brute(left, df.repartition(1), k=4).collect()
    b = knn_join_brute(left, df.repartition(13), k=4, query_chunk=1).collect()
    # keys must be identical; cosine only to 1e-12 (different chunk shapes
    # pick different BLAS kernels, which round differently in the last ulp)
    key = lambda rows: sorted((r.qid, r.id, r.rank) for r in rows)  # noqa: E731
    assert key(a) == key(b)
    ca = {(r.qid, r.id): r.cosine for r in a}
    for r in b:
        assert abs(ca[(r.qid, r.id)] - r.cosine) < 1e-12


def test_brute_mixed_id_types(spark):
    """qid is typed from the LEFT table's id column, id from the right's —
    a string-keyed query set against a bigint-keyed corpus round-trips both."""
    df, mat = _mk(spark, n=20)
    left = df.filter(F.col("vec_id") < 2).select(
        F.concat(F.lit("q"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    res = knn_join_brute(left, df, k=3)
    got = res.collect()
    schema = res.schema
    assert schema["qid"].dataType.simpleString() == "string"
    assert schema["id"].dataType.simpleString() == "bigint"
    want = _np_knn(np.array([0, 1]), mat[[0, 1]], np.arange(20), mat, 3, False)
    assert sorted((r.qid, r.id, r.rank) for r in got) == sorted(
        (f"q{q}", i, rk) for q, i, rk, _ in want
    )


def test_brute_guard_and_empty(spark):
    df, _ = _mk(spark, n=20)
    with pytest.raises(ValueError, match="max_left"):
        knn_join_brute(df, df, k=2, max_left=5)
    with pytest.raises(ValueError, match="empty"):
        knn_join_brute(df.filter(F.lit(False)), df, k=2)


def test_lsh_equals_brute_on_candidates(spark):
    dim, bits, probes, k = 8, 6, 1, 4
    df, mat = _mk(spark, n=70, dim=dim, dups=False)
    left = df.filter(F.col("vec_id") % 11 == 0)
    q_ids = [i for i in range(70) if i % 11 == 0]
    got = knn_join_lsh(
        left, df, dim=dim, k=k, num_bits=bits, probes=probes, seed=5
    ).collect()
    # independent candidate set: shared planes, hamming <= probes
    planes = _planes(dim, bits, 5)
    sig = ((mat @ planes) > 0) @ (1 << np.arange(bits))
    masks = set(probe_masks(bits, probes))
    want = []
    for q in q_ids:
        cand = [i for i in range(70) if int(sig[q]) ^ int(sig[i]) in masks]
        qn = mat[q] / np.sqrt(mat[q] @ mat[q])
        scored = sorted(
            cand,
            key=lambda i: (-(mat[i] / np.sqrt(mat[i] @ mat[i])) @ qn, i),
        )
        for rank, i in enumerate(scored[:k], start=1):
            want.append((q, i, rank))
    assert sorted((r.qid, r.id, r.rank) for r in got) == sorted(want)
    # no duplicate candidate pairs from probing (exactly-one-mask law)
    pairs = [(r.qid, r.id) for r in got]
    assert len(pairs) == len(set(pairs))


def test_ivf_equals_brute_on_candidates(spark):
    """Spec law: knn_join_ivf == exact top-k restricted to the candidate set
    {r : list(r) in the query's nprobe nearest lists}, recomputed in numpy
    from the SAME standing index."""
    df, mat = _mk(spark, n=70, dups=False)
    left = df.filter(F.col("vec_id") % 11 == 0)
    q_ids = [i for i in range(70) if i % 11 == 0]
    index = ivf_build(df, dim=8, n_lists=4, seed=3)
    indexed, cents = index
    assign = {r.vec_id: r.list_id for r in indexed.select("vec_id", "list_id").collect()}
    got = knn_join_ivf(left, index=index, k=4, nprobe=2).collect()
    want = []
    for q in q_ids:
        d2 = ((cents - mat[q][None, :]) ** 2).sum(1)
        probes = set(np.argsort(d2, kind="stable")[:2].tolist())
        cand = [i for i in range(70) if assign[i] in probes]
        qn = mat[q] / np.sqrt(mat[q] @ mat[q])
        scored = sorted(
            cand, key=lambda i: (-(mat[i] / np.sqrt(mat[i] @ mat[i])) @ qn, i)
        )
        for rank, i in enumerate(scored[:4], start=1):
            want.append((q, i, rank))
    assert sorted((r.qid, r.id, r.rank) for r in got) == sorted(want)
    # probing never duplicates a candidate pair
    pairs = [(r.qid, r.id) for r in got]
    assert len(pairs) == len(set(pairs))


def test_ivf_full_nprobe_is_exact(spark):
    df, mat = _mk(spark, n=50, dups=False)
    left = df.filter(F.col("vec_id") < 3)
    index = ivf_build(df, dim=8, n_lists=4, seed=3)
    got = knn_join_ivf(left, index=index, k=5, nprobe=4).collect()
    want = _np_knn(np.arange(3), mat[:3], np.arange(50), mat, 5, False)
    assert sorted((r.qid, r.id, r.rank) for r in got) == sorted(
        (q, i, rk) for q, i, rk, _ in want
    )


def test_plans_have_no_cartesian(spark):
    df, _ = _mk(spark, n=30)
    left = df.filter(F.col("vec_id") < 3)
    for res in (
        knn_join_brute(left, df, k=3),
        knn_join_lsh(left, df, dim=8, k=3, num_bits=4),
        knn_join_ivf(left, df, dim=8, k=3, n_lists=4, nprobe=2),
    ):
        plan = res._sc._jvm.PythonSQLUtils.explainString(
            res._jdf.queryExecution(), "formatted"
        ).split("Initial Plan")[0]
        assert "CartesianProduct" not in plan


def test_ivf_save_load_roundtrip_and_partition_pruning(spark, tmp_path):
    import numpy as np
    from pyspark.sql import functions as F

    from pyspark_validator.pipelines.similarity import ivf_build, ivf_load, ivf_save, ivf_topk

    rng = np.random.RandomState(3)
    m = rng.randn(120, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(120)],
        "vec_id bigint, embedding array<float>",
    )
    indexed, cents = ivf_build(df, dim=8, n_lists=4, iters=4)
    path = str(tmp_path / "ivf")
    ivf_save(indexed, cents, path)
    loaded, cents2 = ivf_load(spark, path)
    assert np.array_equal(cents, cents2)  # exact float round-trip
    q = [float(x) for x in m[5]]
    a = [(r["id"], r["cosine"]) for r in ivf_topk(indexed, cents, q, k=5, nprobe=4).collect()]
    b = [(r["id"], r["cosine"]) for r in ivf_topk(loaded, cents2, q, k=5, nprobe=4).collect()]
    assert a == b
    # partition pruning: an nprobe=1 query's scan must read ONE list_id dir
    pruned = ivf_topk(loaded, cents2, q, k=5, nprobe=1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    probe_list = int(np.argmin(((cents2 - np.asarray(q, dtype=np.float64)) ** 2).sum(1)))
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf, plan
    # the nprobe=1 filter reaches the scan as a partition filter on the single
    # probed list -- parquet reads ONE list_id directory
    assert re.search(rf"list_id#\d+ (= {probe_list}\b|IN \({probe_list}\))", pf.group(1)), pf.group(1)
