"""JS-divergence drift, 1-D Wasserstein drift, Zipf-slope vocabulary check.

Python oracles recompute each statistic from first principles, including the
sparse-bucket span weighting in the Wasserstein integral.
"""

import math

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pyspark_validator.checks.drift import js_divergence_drift, wasserstein_drift
from pyspark_validator.pipelines.text import zipf_signals


# ---------------------------------------------------------------------------
# JS divergence


def _jsd_oracle(xs, ys):
    ca, cb = Counter(xs), Counter(ys)
    na, nb = len(xs), len(ys)
    jsd = 0.0
    for v in set(ca) | set(cb):
        p, q = ca.get(v, 0) / na, cb.get(v, 0) / nb
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log2(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log2(q / m)
    return jsd


def test_jsd_python_oracle(spark):
    xs = [f"v{i % 7}" for i in range(140)]
    ys = [f"v{(i * 3) % 5}" for i in range(90)]
    b = spark.createDataFrame([(x,) for x in xs], "c string")
    c = spark.createDataFrame([(y,) for y in ys], "c string")
    r = js_divergence_drift(b, c, "c").collect()[0]
    o = _jsd_oracle(xs, ys)
    assert r["jsd"] == pytest.approx(o, rel=1e-12)
    assert r["js_distance"] == pytest.approx(math.sqrt(o), rel=1e-12)
    assert (r["n_b"], r["n_c"]) == (140, 90)


def test_jsd_identical_zero_disjoint_one(spark):
    xs = [("a",)] * 50 + [("b",)] * 30
    b = spark.createDataFrame(xs, "c string")
    r = js_divergence_drift(b, b, "c").collect()[0]
    assert r["jsd"] == pytest.approx(0.0, abs=1e-15)
    assert not r["drift_detected"]
    c = spark.createDataFrame([("z",)] * 40, "c string")
    r2 = js_divergence_drift(b, c, "c", threshold=0.5).collect()[0]
    assert r2["jsd"] == pytest.approx(1.0, abs=1e-12)  # disjoint supports
    assert r2["drift_detected"]


def test_jsd_per_group(spark):
    rows_b = [("g1", "a")] * 10 + [("g2", "a")] * 10
    rows_c = [("g1", "a")] * 10 + [("g2", "z")] * 10
    b = spark.createDataFrame(rows_b, "g string, c string")
    c = spark.createDataFrame(rows_c, "g string, c string")
    got = {
        r["g"]: r["jsd"]
        for r in js_divergence_drift(b, c, "c", by=["g"]).collect()
    }
    assert got["g1"] == pytest.approx(0.0, abs=1e-15)
    assert got["g2"] == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# Wasserstein


def _w1_oracle(xs, ys, lo, hi, bins):
    width = (hi - lo) / bins

    def bucket(v):
        return min(max(math.floor((v - lo) / width), -1), bins)

    ca, cb = Counter(map(bucket, xs)), Counter(map(bucket, ys))
    na, nb = len(xs), len(ys)
    w1 = 0.0
    fa = fb = 0.0
    for k in range(-1, bins + 1):
        fa += ca.get(k, 0) / na
        fb += cb.get(k, 0) / nb
        w1 += abs(fa - fb) * width
    return w1


def test_wasserstein_python_oracle(spark):
    xs = [float((i * 17) % 100) for i in range(300)]
    ys = [float((i * 17) % 100) + 10.0 for i in range(200)]  # shifted +10
    b = spark.createDataFrame([(x,) for x in xs], "v double")
    c = spark.createDataFrame([(y,) for y in ys], "v double")
    r = wasserstein_drift(
        b, c, "v", num_bins=22, bin_edges=(0.0, 110.0), threshold=5.0
    ).collect()[0]
    o = _w1_oracle(xs, ys, 0.0, 110.0, 22)
    assert r["wasserstein"] == pytest.approx(o, rel=1e-12)
    # a +10 shift on 5-unit bins integrates to ~10
    assert r["wasserstein"] == pytest.approx(10.0, abs=1.0)
    assert r["drift_detected"]
    assert r["wasserstein_norm"] == pytest.approx(o / 110.0, rel=1e-12)


def test_wasserstein_sparse_bucket_span(spark):
    # all baseline mass in bin 0, all current in bin 9; bins 1..8 ABSENT ->
    # the gap of 1.0 must persist across the 9-bin span: W1 = 9 * width
    b = spark.createDataFrame([(0.5,)] * 10, "v double")
    c = spark.createDataFrame([(9.5,)] * 10, "v double")
    r = wasserstein_drift(b, c, "v", num_bins=10, bin_edges=(0.0, 10.0)).collect()[0]
    assert r["wasserstein"] == pytest.approx(9.0, rel=1e-12)


def test_wasserstein_identical_zero(spark):
    b = spark.createDataFrame([(float(i % 13),) for i in range(100)], "v double")
    r = wasserstein_drift(b, b, "v", num_bins=13, bin_edges=(0.0, 13.0)).collect()[0]
    assert r["wasserstein"] == pytest.approx(0.0, abs=1e-15)
    assert not r["drift_detected"]  # threshold None => informational


def test_wasserstein_per_group(spark):
    rows_b = [("g1", 1.0)] * 10 + [("g2", 1.0)] * 10
    rows_c = [("g1", 1.0)] * 10 + [("g2", 5.0)] * 10
    b = spark.createDataFrame(rows_b, "g string, v double")
    c = spark.createDataFrame(rows_c, "g string, v double")
    got = {
        r["g"]: r["wasserstein"]
        for r in wasserstein_drift(
            b, c, "v", by=["g"], num_bins=8, bin_edges=(0.0, 8.0)
        ).collect()
    }
    assert got["g1"] == pytest.approx(0.0, abs=1e-15)
    assert got["g2"] == pytest.approx(4.0, rel=1e-12)  # 1.x -> 5.x is 4 bins


# ---------------------------------------------------------------------------
# Zipf


def _zipf_oracle(texts, max_rank):
    cnt = Counter()
    for t in texts:
        # normalize_text semantics: lowercase + whitespace-collapse only
        cnt.update(w for w in t.lower().split() if w)
    head = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:max_rank]
    xs = [math.log(i + 1) for i in range(len(head))]
    ys = [math.log(c) for _, c in head]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    return dict(
        slope=slope,
        n_tokens=sum(cnt.values()),
        n_types=len(cnt),
        m=m,
        top1=max(cnt.values()) / sum(cnt.values()),
    )


def test_zipf_python_oracle(spark):
    # genuinely zipfian synthetic corpus: word w_r appears ~ C/r times
    words = []
    for r in range(1, 60):
        words += [f"word{r:03d}"] * max(round(600 / r), 1)
    texts = [" ".join(words[i::7]) for i in range(7)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    s = zipf_signals(df, max_rank=50).collect()[0]
    o = _zipf_oracle(texts, 50)
    assert s["n_tokens"] == o["n_tokens"]
    assert s["n_types"] == o["n_types"]
    assert s["n_ranks_fit"] == o["m"]
    assert s["zipf_slope"] == pytest.approx(o["slope"], rel=1e-9)
    assert s["top1_share"] == pytest.approx(o["top1"], rel=1e-12)
    # a 1/r corpus fits slope ~ -1
    assert -1.2 < s["zipf_slope"] < -0.8
    assert s["holds"]
    assert s["r2"] > 0.95


def test_zipf_flat_corpus_fails_band(spark):
    # uniform vocabulary (template farm): slope ~ 0 -> outside the band
    texts = [" ".join(f"tok{j}" for j in range(40)) for _ in range(25)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    s = zipf_signals(df, max_rank=40).collect()[0]
    assert abs(s["zipf_slope"]) < 0.05
    assert not s["holds"]


def test_zipf_min_count_filter(spark):
    texts = ["aaa aaa aaa bbb bbb ccc"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    s = zipf_signals(df, max_rank=10, min_count=2).collect()[0]
    assert s["n_types"] == 2  # ccc dropped
    assert s["n_tokens"] == 5


# ---------------------------------------------------------------------------
# top-k drift


def test_topk_drift_identical(spark):
    from pyspark_validator.checks.drift import topk_drift

    rows = [(f"v{i % 6}",) for i in range(120)]
    df = spark.createDataFrame(rows, "c string")
    r = topk_drift(df, df, "c", k=4).collect()[0]
    assert r["jaccard"] == 1.0 and r["footrule"] == 0.0
    assert r["top1_same"] and not r["drift_detected"]


def test_topk_drift_python_oracle(spark):
    from collections import Counter

    from pyspark_validator.checks.drift import topk_drift

    xs = [f"v{(i * i) % 9}" for i in range(300)]
    ys = [f"v{(i * 7 + 2) % 11}" for i in range(250)]
    k = 5
    b = spark.createDataFrame([(x,) for x in xs], "c string")
    c = spark.createDataFrame([(y,) for y in ys], "c string")
    r = topk_drift(b, c, "c", k=k).collect()[0]

    def top(vals):
        cnt = Counter(vals)
        head = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return {v: i + 1 for i, (v, _) in enumerate(head)}

    rb, rc = top(xs), top(ys)
    shared = set(rb) & set(rc)
    jac = len(shared) / len(set(rb) | set(rc))
    assert r["n_shared"] == len(shared)
    assert r["jaccard"] == pytest.approx(jac, rel=1e-12)
    if shared:
        fr = sum(abs(rb[v] - rc[v]) for v in shared) / (len(shared) * (k - 1))
        assert r["footrule"] == pytest.approx(fr, rel=1e-12)
    assert r["top1_b"] == min(rb, key=rb.get)


def test_topk_drift_disjoint(spark):
    from pyspark_validator.checks.drift import topk_drift

    b = spark.createDataFrame([("a",)] * 5, "c string")
    c = spark.createDataFrame([("z",)] * 5, "c string")
    r = topk_drift(b, c, "c", k=3).collect()[0]
    assert r["jaccard"] == 0.0 and r["footrule"] is None
    assert r["drift_detected"]


# ---------------------------------------------------------------------------
# embedding dimension drift


def test_embedding_dimension_drift_oracle(spark):
    import numpy as np

    from pyspark_validator.checks.drift import embedding_dimension_drift

    rng = np.random.default_rng(11)
    dim = 8
    mb = rng.normal(size=(60, dim)).astype(np.float32)
    mc = mb.copy()
    mc = rng.normal(size=(50, dim)).astype(np.float32)
    mc[:, 3] += 2.0  # plant a big axis shift on dim 3
    b = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(mb)], "id int, e array<float>"
    )
    c = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(mc)], "id int, e array<float>"
    )
    r = embedding_dimension_drift(b, c, vec_col="e", max_smd=0.5).collect()[0]
    assert r["worst_dim"] == 3 and r["drift_detected"]
    # python oracle (population variance, float64 on the float32-rounded data)
    A = mb.astype(np.float64)
    B = mc.astype(np.float64)
    smd = np.abs(A.mean(0) - B.mean(0)) / np.sqrt(
        np.maximum((A.var(0) + B.var(0)) / 2, 1e-24)
    )
    assert r["max_smd_value"] == pytest.approx(smd.max(), rel=1e-9)
    assert r["mean_smd"] == pytest.approx(smd.mean(), rel=1e-9)
    assert r["dim"] == dim and r["n_b"] == 60 and r["n_c"] == 50


def test_embedding_dimension_drift_identical_zero(spark):
    from pyspark_validator.checks.drift import embedding_dimension_drift

    rows = [(i, [float(i % 5), float(i % 3)]) for i in range(40)]
    df = spark.createDataFrame(rows, "id int, e array<float>")
    r = embedding_dimension_drift(df, df, vec_col="e").collect()[0]
    assert r["max_smd_value"] == pytest.approx(0.0, abs=1e-12)
    assert not r["drift_detected"]


# ---------------------------------------------------------------------------
# change-point localization (binned CUSUM)


def test_change_point_planted_shift(spark):
    from pyspark_validator.checks.drift import change_point_check

    rows = [
        (float(i), 10.0 + (5.0 if i >= 600 else 0.0) + (i % 7) * 0.1)
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    r = change_point_check(df, "x", "y", num_bins=50).collect()[0]
    # true change at x=600; bin width 19.98 -> boundary within one bin
    assert abs(r["change_point"] - 600.0) < 25.0
    assert r["mean_before"] == pytest.approx(10.3, abs=0.1)
    assert r["mean_after"] == pytest.approx(15.3, abs=0.1)
    assert r["shift"] == pytest.approx(5.0, abs=0.1)
    assert r["detected"]


def test_change_point_python_cusum_oracle(spark):
    from collections import defaultdict

    from pyspark_validator.checks.drift import change_point_check

    rows = [(float(i % 40), float((i * 13) % 29)) for i in range(400)]
    df = spark.createDataFrame(rows, "x double, y double")
    bins_n = 8
    r = change_point_check(
        df, "x", "y", num_bins=bins_n, bin_edges=(0.0, 40.0)
    ).collect()[0]
    # python oracle
    agg = defaultdict(lambda: [0, 0.0])
    for x, y in rows:
        b = min(max(int(x // 5.0), 0), bins_n - 1)
        agg[b][0] += 1
        agg[b][1] += y
    n = sum(c for c, _ in agg.values())
    S = sum(s for _, s in agg.values())
    ck = cs = 0.0
    best = (None, -1.0)
    for b in sorted(agg):
        ck += agg[b][0]
        cs += agg[b][1]
        if ck < n:
            c = abs(cs - ck * S / n)
            if c > best[1] + 1e-12:
                best = (b, c)
    assert r["change_bin"] == best[0]
    assert r["n"] == n


def test_change_point_stationary_not_detected(spark):
    from pyspark_validator.checks.drift import change_point_check

    rows = [(float(i), float((i * 7) % 11)) for i in range(500)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = change_point_check(df, "x", "y", num_bins=20).collect()[0]
    assert not r["detected"]
    assert abs(r["shift_smd"]) < 0.5
