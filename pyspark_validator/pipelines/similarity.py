"""Similarity search over embedding columns (array<float>).

  * brute_force_topk: exact cosine top-k for one query -- dot product via
    F.zip_with/F.aggregate (JVM-side), TakeOrderedAndProject (distributed heap:
    no full sort, no collect).
  * lsh_bucket / ann_topk: random-hyperplane LSH (sign bits of projections onto
    deterministic seeded planes) -- the scale path: candidates come from the
    query's bucket (plus optional multi-probe neighbors), exact cosine re-ranks
    only candidates. Projections are computed in ONE Arrow-vectorized pandas UDF
    (numpy matmul per batch, never per-row Python).
  * cosine_pairs: embedding near-duplicate pairs via shared LSH bucket + exact
    cosine verification (the embedding-cosine dedup path).
  * knn_join_brute / knn_join_lsh: k-NN JOIN (every query row -> its k nearest
    corpus rows; hard-negative mining, retrieval eval). Brute = broadcast
    query matrix + ONE mapInPandas corpus scan with per-batch BLAS matmul and
    per-batch top-k reduction (only partial winners shuffle); LSH = bucketed
    candidates + exact re-rank, the corpus-x-corpus scale path.
  * knn_join_ivf: the coarse-quantizer join path -- corpus assigned once to
    k-means lists (ivf_build), queries probe their nprobe nearest lists,
    exact re-rank; nprobe = n_lists degenerates to the exact join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _norm_dot(vec_col, query: list[float]):
    """Cosine similarity of an array<float/double> column against a literal query,
    pure built-in exprs."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    nq = float(np.sqrt(np.dot(query, query)))
    return dot / (nv * F.lit(nq))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k. orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows -- scales linearly)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            _norm_dot(F.col(vec_col), query).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def _planes(dim: int, num_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(dim, num_bits)).astype(np.float64)


def add_lsh_bucket(
    df: DataFrame,
    dim: int,
    num_bits: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds 'bucket' (int, sign-bit signature of random-hyperplane projections).
    One Arrow-batched pandas UDF doing a single numpy matmul per batch."""
    planes = _planes(dim, num_bits, seed)

    @pandas_udf("long")
    def bucket_of(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())  # (batch, dim)
        signs = (m @ planes) > 0  # (batch, num_bits)
        weights = (1 << np.arange(num_bits)).astype(np.int64)
        return pd.Series(signs @ weights)

    return df.withColumn("bucket", bucket_of(F.col(vec_col)))


def probe_masks(num_bits: int, probes: int) -> list[int]:
    """XOR masks for multi-probe LSH over a ``num_bits`` sign signature: every
    bit pattern flipping at most ``probes`` bits (popcount <= probes).
    ``probes=0`` -> ``[0]`` (exact bucket only).  Capped at 2: beyond that the
    fan-out (1 + b + b(b-1)/2 + ...) stops paying for itself -- use fewer bits
    or more bands instead."""
    if probes > 2:
        raise ValueError("probes > 2 explodes candidate fan-out; lower num_bits instead")
    masks = [0]
    if probes >= 1:
        masks += [1 << i for i in range(num_bits)]
    if probes >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(num_bits)
            for j in range(i + 1, num_bits)
        ]
    return masks


def _explode_probes(df: DataFrame, num_bits: int, probes: int) -> DataFrame:
    """Replace 'bucket' with one row per probed bucket (bucket XOR mask).
    For any candidate pair exactly ONE mask maps the probed row's signature
    onto the other side's, so probing introduces no duplicate pairs."""
    if probes <= 0:
        return df
    masks = probe_masks(num_bits, probes)
    return df.withColumn(
        "bucket",
        F.explode(F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])),
    )


def ann_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    num_bits: int = 12,
    seed: int = 42,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket (+ buckets at
    Hamming distance <= multiprobe), exact cosine re-rank inside. Pass a
    pre-bucketed (cached) df via ``bucketed`` to amortize across queries."""
    dim = len(query)
    if bucketed is None:
        bucketed = add_lsh_bucket(df, dim, num_bits, seed, vec_col)
    planes = _planes(dim, num_bits, seed)
    qsig = int(((np.asarray(query) @ planes) > 0) @ (1 << np.arange(num_bits)))
    probes = {qsig}
    if multiprobe >= 1:
        for i in range(num_bits):
            probes.add(qsig ^ (1 << i))
    if multiprobe >= 2:
        for i in range(num_bits):
            for j in range(i + 1, num_bits):
                probes.add(qsig ^ (1 << i) ^ (1 << j))
    cand = bucketed.filter(F.col("bucket").isin(list(probes)))
    return (
        cand.select(
            F.col(id_col).alias("id"),
            _norm_dot(F.col(vec_col), query).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def ivf_build(
    df: DataFrame,
    dim: int,
    n_lists: int = 16,
    sample_size: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: k-means centroids trained on a driver sample
    (the standard IVF build path -- training data is a bounded sample however
    large the table), then ONE Arrow-batched pass assigns every vector to its
    nearest list. Returns (assigned_df with 'list_id', centroids).

    The assigned frame is the index: persist/write it partitioned by list_id
    and queries scan only nprobe lists.
    """
    n = df.count()
    frac = min(1.0, sample_size / max(n, 1))
    sample = np.stack(
        df.sample(fraction=frac, seed=seed)
        .select(vec_col)
        .toPandas()[vec_col]
        .to_numpy()
    ).astype(np.float64)
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)]

    def _nearest(m: np.ndarray, c: np.ndarray) -> np.ndarray:
        # argmin_j ||m_i - c_j||^2 = argmin_j (||c_j||^2 - 2 m_i . c_j): one
        # BLAS matmul, never the (n, k, dim) broadcast temp -- at 50k x 1024
        # x 64 that temp is 26 GB per evaluation and was the measured
        # bottleneck of the first scale soak (450 s for 50k vectors).
        return ((c * c).sum(1)[None, :] - 2.0 * (m @ c.T)).argmin(1)

    for _ in range(iters):  # Lloyd iterations on the sample, driver-side
        assign = _nearest(sample, cents)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, sample)
        counts = np.bincount(assign, minlength=len(cents))
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz, None]

    @pandas_udf("int")
    def nearest_list(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series(_nearest(m, cents).astype(np.int32))

    return df.withColumn("list_id", nearest_list(F.col(vec_col))), cents


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF query: rank lists by centroid distance, scan the nprobe nearest
    lists only (partition-pruned when the index is written
    partitionBy('list_id')), exact cosine re-rank inside."""
    q = np.asarray(query, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(1)
    probes = [int(i) for i in d2.argsort()[:nprobe]]
    cand = indexed.filter(F.col("list_id").isin(probes))
    return (
        cand.select(
            F.col(id_col).alias("id"),
            _norm_dot(F.col(vec_col), query).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_bits: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 10_000,
    probes: int = 0,
) -> DataFrame:
    """Embedding near-duplicate pairs: same LSH bucket => candidate, exact cosine
    verifies. High-cosine pairs collide with high probability (collision prob per
    bit = 1 - theta/pi); oversized buckets are dropped (skew guard).
    ``probes`` >= 1 multi-probes one join side (buckets at Hamming distance <=
    probes also match), recovering pairs a single hyperplane separates at the
    cost of a (1 + num_bits [+ C(num_bits,2)])x fan-out on that side only --
    verification stays exact, so probing only ever ADDS true pairs."""
    # persist: the pandas-UDF bucketing feeds the size stats AND both join
    # sides -- without it the Arrow projection runs 3x.
    b = (
        add_lsh_bucket(df, dim, num_bits, seed, vec_col)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "bucket")
        .persist()
    )
    sizes = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("bs"))
    b = b.join(F.broadcast(sizes.filter(F.col("bs") > max_bucket)), on="bucket", how="left_anti")
    x, y = b.alias("x"), _explode_probes(b, num_bits, probes).alias("y")
    dot = F.aggregate(
        F.zip_with("x.v", "y.v", lambda a, c: a.cast("double") * c.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    nx = F.sqrt(F.aggregate("x.v", F.lit(0.0), lambda acc, t: acc + t.cast("double") * t.cast("double")))
    ny = F.sqrt(F.aggregate("y.v", F.lit(0.0), lambda acc, t: acc + t.cast("double") * t.cast("double")))
    return (
        x.join(
            y,
            on=(F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            (dot / (nx * ny)).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def knn_join_brute(
    left: DataFrame,
    right: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_left: int = 100_000,
    exclude_self: bool = False,
    query_chunk: int = 1024,
) -> DataFrame:
    """Exact k-NN join: for every ``left`` row, its ``k`` nearest ``right``
    rows by cosine (hard-negative mining / retrieval-eval shape: a bounded
    query set against an unbounded corpus).

    Scale design: the query side is collected to a driver matrix (guarded by
    ``max_left`` -- eval/query sets are bounded by construction) and shipped
    as a broadcast; the corpus side streams through ONE mapInPandas scan
    whose kernel does a single BLAS matmul per Arrow batch (never per-row
    Python) and reduces each batch to its per-query top-k *candidates*
    before anything is shuffled.  The only shuffled rows are the
    ``<= n_batches * |L| * k`` partial winners feeding the final per-query
    window -- the |L| x |R| pair space never materializes.  Ties at the
    batch k-boundary are kept (``>= kth value`` mask), so the final window
    (cosine desc, id asc) is exact and deterministic.  Zero-norm corpus
    vectors get cosine 0.

    Returns (qid, id, rank, cosine): ``rank`` 1..k per qid.
    """
    rows = left.select(id_col, vec_col).limit(max_left + 1).collect()
    if len(rows) > max_left:
        raise ValueError(
            f"left side exceeds max_left={max_left}; k-NN join broadcasts the "
            "query side -- pre-sample it or raise the guard explicitly"
        )
    if not rows:
        raise ValueError("left side is empty")
    q_ids = np.array([r[0] for r in rows])
    q_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    q_norm = np.sqrt((q_mat * q_mat).sum(1))
    q_norm[q_norm == 0] = 1.0
    q_mat = q_mat / q_norm[:, None]

    qid_ddl = left.schema[id_col].dataType.simpleString()
    id_ddl = right.schema[id_col].dataType.simpleString()
    out_schema = f"qid {qid_ddl}, id {id_ddl}, cosine double"
    kk = k

    def _scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt((m * m).sum(1))
            norms[norms == 0] = 1.0
            m = m / norms[:, None]
            batch_ids = pdf[id_col].to_numpy()
            outs = []
            for s in range(0, len(q_ids), query_chunk):
                qc_ids = q_ids[s : s + query_chunk]
                sims = m @ q_mat[s : s + query_chunk].T  # (batch, chunk)
                if exclude_self:
                    sims = np.where(batch_ids[:, None] == qc_ids[None, :], -np.inf, sims)
                if len(m) > kk:
                    thresh = np.partition(sims, -kk, axis=0)[-kk]
                    mask = sims >= thresh[None, :]
                else:
                    mask = np.ones_like(sims, dtype=bool)
                mask &= sims > -np.inf
                bi, qi = np.nonzero(mask)
                outs.append(
                    pd.DataFrame(
                        {"qid": qc_ids[qi], "id": batch_ids[bi], "cosine": sims[bi, qi]}
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    from pyspark.sql import Window

    partial = right.select(id_col, vec_col).mapInPandas(_scan, schema=out_schema)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "rank", "cosine")
    )


def knn_join_lsh(
    left: DataFrame,
    right: DataFrame,
    dim: int,
    k: int = 10,
    num_bits: int = 12,
    seed: int = 42,
    probes: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 10_000,
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate k-NN join at corpus-x-corpus scale: candidates are rows
    sharing an LSH bucket (query side multi-probed to Hamming distance <=
    ``probes``), exact cosine re-ranks candidates only, one window takes the
    per-query top-k.  The corpus is bucketed ONCE (persist/write it
    partitioned by bucket to amortize); oversized buckets are dropped (skew
    guard, surfaced by comparing counts).  For any (left, right) pair exactly
    one probe mask maps the left signature onto the right's, so probing
    introduces no duplicate candidates and ``rank`` is exact over the
    candidate set.

    Returns (qid, id, rank, cosine) -- top-k *of the candidates*; recall vs
    the exact join rises with num_bits' collision probability and probes.
    """
    r = (
        add_lsh_bucket(right, dim, num_bits, seed, vec_col)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("rv"), "bucket")
        .persist()
    )
    sizes = r.groupBy("bucket").agg(F.count(F.lit(1)).alias("bs"))
    r = r.join(
        F.broadcast(sizes.filter(F.col("bs") > max_bucket)), on="bucket", how="left_anti"
    )
    lft = add_lsh_bucket(left, dim, num_bits, seed, vec_col).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"), "bucket"
    )
    lft = _explode_probes(lft, num_bits, probes)
    j = lft.join(r, on="bucket")
    if exclude_self:
        j = j.filter(F.col("qid") != F.col("id"))
    dot = F.aggregate(
        F.zip_with("qv", "rv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    nq = F.sqrt(
        F.aggregate("qv", F.lit(0.0), lambda acc, t: acc + t.cast("double") * t.cast("double"))
    )
    nr = F.sqrt(
        F.aggregate("rv", F.lit(0.0), lambda acc, t: acc + t.cast("double") * t.cast("double"))
    )
    scored = j.select("qid", "id", (dot / (nq * nr)).alias("cosine"))

    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "rank", "cosine")
    )


def knn_join_ivf(
    left: DataFrame,
    right: DataFrame | None = None,
    dim: int = None,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 3,
    seed: int = 42,
    sample_size: int = 10_000,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = False,
    index: tuple[DataFrame, np.ndarray] | None = None,
) -> DataFrame:
    """IVF-partitioned approximate k-NN join -- the coarse-quantizer scale
    path beside :func:`knn_join_lsh`: the corpus is assigned ONCE to its
    nearest k-means list (:func:`ivf_build`; persist/write partitioned by
    list_id to amortize across query batches), every query row probes its
    ``nprobe`` nearest lists, exact cosine re-ranks candidates only, one
    window takes the per-query top-k.

    The candidate set is deterministic given (seed, sample): candidates(q) =
    {r : list(r) in the nprobe nearest lists of q}, so recall rises
    monotonically with nprobe and ``nprobe = n_lists`` degenerates to the
    exact join (spec law pinned in tests). A query's probe lists are distinct
    by construction -- probing never duplicates a candidate pair.

    Pass ``index=(assigned_df, centroids)`` (from :func:`ivf_build`) to reuse
    a standing index; otherwise one is built from ``right``.

    Returns (qid, id, rank, cosine) -- top-k of the candidates.
    """
    if index is None:
        indexed, cents = ivf_build(
            right, dim, n_lists, sample_size, iters, seed, vec_col
        )
    else:
        indexed, cents = index
    r = indexed.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("rv"), "list_id"
    )
    npb = min(nprobe, len(cents))
    c = cents

    @pandas_udf("array<int>")
    def probe_lists(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        # ||c||^2 - 2 m.c orders identically to ||m - c||^2 per row (||m||^2
        # is row-constant): one matmul, no (batch, n_lists, dim) temp
        d2 = (c * c).sum(1)[None, :] - 2.0 * (m @ c.T)
        part = np.argsort(d2, axis=1, kind="stable")[:, :npb].astype(np.int32)
        return pd.Series(list(part))

    lft = left.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.explode(probe_lists(F.col(vec_col))).alias("list_id"),
    )
    j = lft.join(r, on="list_id")
    if exclude_self:
        j = j.filter(F.col("qid") != F.col("id"))
    dot = F.aggregate(
        F.zip_with("qv", "rv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    nq = F.sqrt(
        F.aggregate("qv", F.lit(0.0), lambda acc, t: acc + t.cast("double") * t.cast("double"))
    )
    nr = F.sqrt(
        F.aggregate("rv", F.lit(0.0), lambda acc, t: acc + t.cast("double") * t.cast("double"))
    )
    scored = j.select("qid", "id", (dot / (nq * nr)).alias("cosine"))

    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "rank", "cosine")
    )


def unit_normalize(df: DataFrame, vec_col: str = "embedding", out_col: str = "unit") -> DataFrame:
    """Adds ``out_col`` = the unit-normalized (double) copy of an embedding
    column, pure JVM exprs. The norm is materialized behind a Generate barrier
    (explode(array(e))) so CollapseProject cannot re-inline the O(dim)
    aggregate into every element of the per-element transform (the measured
    CollapseProject blowup family). Zero vectors pass through unscaled."""
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col), F.lit(0.0), lambda a, t: a + t.cast("double") * t.cast("double")
        )
    )
    return (
        df.withColumn("__n", F.explode(F.array(norm)))
        .withColumn(
            out_col,
            F.when(
                F.col("__n") > 0,
                F.transform(F.col(vec_col), lambda t: t.cast("double") / F.col("__n")),
            ).otherwise(F.transform(F.col(vec_col), lambda t: t.cast("double"))),
        )
        .drop("__n")
    )


def cluster_cosine_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_lists: int = 16,
    sample_size: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster: int = 10_000,
    index: DataFrame | None = None,
) -> DataFrame:
    """Within-cluster embedding near-duplicate pairs -- the published SemDeDup
    candidate structure (Abbas et al. 2023): k-means on the UNIT SPHERE
    (normalize, then the ivf_build coarse quantizer), candidates = same
    cluster, exact cosine verifies. Returns [id_a, id_b, cosine].

    Scale shape: the only pair join is within-list (one shuffle on list_id);
    a degenerate mega-cluster is dropped by ``max_cluster`` (drop-not-salt --
    a cluster that big means the quantizer, not the pairing, needs fixing).
    Pairs split across a cluster boundary are missed by construction -- that
    is SemDeDup's documented recall trade; cosine_pairs (LSH + multi-probe)
    is the overlapping-candidate alternative.

    Pass ``index`` (a previous return of ``ivf_build(unit_normalize(df), ...)``
    restricted to [id, u (unit vector), list_id]) to reuse a standing
    assignment.

    The pair verify computes cosine as dot(u_a, u_b) on the ALREADY-normalized
    vectors -- one O(dim) fold per pair instead of dot + two norms (the norms
    were paid once per ROW in unit_normalize, never per pair; measured ~1.5x
    on the sf0.1 planted query)."""
    if index is None:
        u = unit_normalize(df, vec_col=vec_col, out_col="__unit")
        assigned, _ = ivf_build(
            u,
            dim,
            n_lists=n_lists,
            sample_size=sample_size,
            iters=iters,
            seed=seed,
            vec_col="__unit",
        )
        b = assigned.select(
            F.col(id_col).alias("id"), F.col("__unit").alias("u"), "list_id"
        ).persist()
    else:
        b = index
    sizes = b.groupBy("list_id").agg(F.count(F.lit(1)).alias("cs"))
    b = b.join(
        F.broadcast(sizes.filter(F.col("cs") > max_cluster)), on="list_id", how="left_anti"
    )
    x, y = b.alias("x"), b.alias("y")
    cos = F.aggregate(
        F.zip_with("x.u", "y.u", lambda a, c: a * c),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return (
        x.join(
            y,
            on=(F.col("x.list_id") == F.col("y.list_id")) & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter((F.col("cosine") >= threshold) & ~F.isnan("cosine"))
    )


def semantic_dedup_clustered(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_lists: int = 16,
    sample_size: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster: int = 10_000,
) -> DataFrame:
    """SemDeDup in its published form (Abbas et al. 2023): k-means clusters on
    normalized embeddings, within-cluster cosine >= threshold pairs, keep-one
    (a row is dropped iff it is the larger id of some pair -- the same
    conservative single-pass reduction as :func:`semantic_dedup`, which is the
    LSH-bucketed variant of this operator). Returns surviving rows."""
    pairs = cluster_cosine_pairs(
        df,
        dim,
        threshold=threshold,
        n_lists=n_lists,
        sample_size=sample_size,
        iters=iters,
        seed=seed,
        vec_col=vec_col,
        id_col=id_col,
        max_cluster=max_cluster,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def semantic_dedup(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_bits: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 10_000,
    probes: int = 0,
) -> DataFrame:
    """Embedding-space near-duplicate removal (SemDeDup-style, Abbas et al.
    2023): LSH-bucketed candidate pairs verified by exact cosine, then a
    single-pass keep-one reduction -- a row is dropped iff it appears as the
    LARGER id of some >= threshold pair. Deterministic and conservative:
    every duplicate component keeps its smallest id (and never loses all
    rows), while two rows similar only through a dropped middleman both
    survive -- i.e. it drops at most what iterative connected-components
    keep-one would, without the iteration. Returns the surviving rows with
    the input schema."""
    pairs = cosine_pairs(
        df,
        dim,
        threshold=threshold,
        num_bits=num_bits,
        seed=seed,
        vec_col=vec_col,
        id_col=id_col,
        max_bucket=max_bucket,
        probes=probes,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    # left_anti on the (usually small) loser set; AQE picks broadcast when it fits
    return df.join(losers, on=id_col, how="left_anti")


def ivf_save(indexed: DataFrame, centroids: np.ndarray, path: str) -> None:
    """Persist an IVF index as the standing on-disk artifact: the assigned
    vectors under ``path/lists/`` PARTITIONED BY list_id (so a query's
    nprobe filter becomes parquet partition PRUNING -- only the probed list
    directories are read, pinned in tests), plus the centroid matrix as JSON
    under ``path/centroids.json`` (exact float round-trip via repr)."""
    import json

    indexed.write.partitionBy("list_id").mode("overwrite").parquet(f"{path}/lists")
    payload = {
        "shape": list(centroids.shape),
        "data": [float(x) for x in centroids.ravel()],
    }
    with open(f"{path}/centroids.json", "w") as f:
        json.dump(payload, f)


def ivf_load(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """Load a standing IVF index written by :func:`ivf_save`. The returned
    frame is partition-pruned on list_id filters; feed it straight to
    ivf_topk / knn_join_ivf."""
    import json

    with open(f"{path}/centroids.json") as f:
        payload = json.load(f)
    cents = np.array(payload["data"], dtype=np.float64).reshape(payload["shape"])
    return spark.read.parquet(f"{path}/lists"), cents
