"""Outlier-row detection vs python first-principles oracles."""

import statistics

import pytest

from pyspark_validator.checks.outlier import _MAD_C, outlier_check


@pytest.fixture(scope="module")
def vals():
    # deterministic heavy-tailed-ish sample with planted spikes
    base = [float((i * 37) % 100) for i in range(200)]
    return base + [500.0, -400.0, 999.0]


@pytest.fixture(scope="module")
def vdf(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                 "id int, v double")


def _quantile(xs, p):
    # linear interpolation (type-7), matching Spark percentile / quantile_cont
    s = sorted(xs)
    h = (len(s) - 1) * p
    lo = int(h)
    return s[lo] + (h - lo) * (s[min(lo + 1, len(s) - 1)] - s[lo])


def test_iqr_oracle(vdf, vals):
    s = outlier_check(vdf, "v", method="iqr").summary().collect()[0]
    q1, q3 = _quantile(vals, 0.25), _quantile(vals, 0.75)
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    want = sum(1 for v in vals if v < lo or v > hi)
    assert s["fence_lo"] == pytest.approx(lo, rel=1e-12)
    assert s["fence_hi"] == pytest.approx(hi, rel=1e-12)
    assert s["n_outliers"] == want and want >= 3
    assert not s["holds"]


def test_mad_oracle(vdf, vals):
    s = outlier_check(vdf, "v", method="mad").summary().collect()[0]
    med = _quantile(vals, 0.5)
    mad = _quantile([abs(v - med) for v in vals], 0.5)
    half = 3.5 * mad / _MAD_C
    want = sum(1 for v in vals if abs(v - med) > half + 1e-12)
    assert s["fence_lo"] == pytest.approx(med - half, rel=1e-12)
    assert s["n_outliers"] == want


def test_zscore_oracle(vdf, vals):
    s = outlier_check(vdf, "v", method="zscore").summary().collect()[0]
    m = statistics.fmean(vals)
    sd = statistics.pstdev(vals)
    want = sum(1 for v in vals if abs(v - m) > 3.0 * sd)
    assert s["n_outliers"] == want
    assert s["fence_hi"] == pytest.approx(m + 3 * sd, rel=1e-12)


def test_violations_order_and_cap(vdf, vals):
    v = outlier_check(vdf, "v").violations(["id"], cap=2).collect()
    assert len(v) == 2
    # worst exceedance first: 999 then 500 or -400 depending on fences
    assert v[0]["value"] == 999.0
    assert v[0]["exceedance"] > v[1]["exceedance"]


def test_zero_spread_no_outliers(spark):
    df = spark.createDataFrame([(float(7),)] * 50, "v double")
    for m in ("mad", "zscore"):
        s = outlier_check(df, "v", method=m).summary().collect()[0]
        assert s["n_outliers"] == 0 and s["holds"]
        assert s["fence_lo"] is None
    # iqr with zero spread: fences collapse to the value, still no outliers
    s = outlier_check(df, "v", method="iqr").summary().collect()[0]
    assert s["n_outliers"] == 0 and s["holds"]


def test_all_null_column(spark):
    df = spark.createDataFrame([(None,)] * 5, "v double")
    s = outlier_check(df, "v").summary().collect()[0]
    assert s["n"] == 0 and s["n_outliers"] == 0 and s["holds"]
    assert outlier_check(df, "v").violations().count() == 0


def test_bad_method(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        outlier_check(df, "v", method="nope")


# ---------------------------------------------------------------------------
# embedding outliers (diagonal Mahalanobis)


def test_embedding_outliers_planted(spark):
    import numpy as np

    from pyspark_validator.checks.outlier import embedding_outlier_check

    rng = np.random.default_rng(3)
    m = rng.normal(size=(80, 6)).astype(np.float32)
    m[17] = 50.0  # planted corrupt vector
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(m)], "vid int, e array<float>"
    )
    c = embedding_outlier_check(df, vec_col="e", id_col="vid", top_k=3)
    top = c.top().collect()
    assert top[0]["id"] == 17
    assert top[0]["score"] > 10 * top[1]["score"]
    # numpy oracle on the float32-rounded data (population std)
    A = m.astype(np.float64)
    mu, sd = A.mean(0), A.std(0)
    sd[sd == 0] = 1.0
    scores = (((A - mu) / sd) ** 2).sum(1)
    assert top[0]["score"] == pytest.approx(scores[17], rel=1e-9)
    s = c.summary().collect()[0]
    assert s["dim"] == 6 and s["n"] == 80
    assert s["mean_score"] == pytest.approx(scores.mean(), rel=1e-9)
    # sanity: mean score == dim under the score's own standardization
    assert s["mean_score"] == pytest.approx(6.0, rel=1e-9)


def test_embedding_outliers_threshold_gate(spark):
    import numpy as np

    from pyspark_validator.checks.outlier import embedding_outlier_check

    rng = np.random.default_rng(5)
    m = rng.normal(size=(50, 4)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(m)], "vid int, e array<float>"
    )
    s = embedding_outlier_check(
        df, vec_col="e", id_col="vid", score_threshold=1e9
    ).summary().collect()[0]
    assert s["n_flagged"] == 0 and s["holds"]


def test_embedding_outliers_constant_dim_no_nan(spark):
    from pyspark_validator.checks.outlier import embedding_outlier_check

    rows = [(i, [float(i % 3), 7.0]) for i in range(30)]  # dim 1 constant
    df = spark.createDataFrame(rows, "vid int, e array<float>")
    s = embedding_outlier_check(df, vec_col="e", id_col="vid").summary().collect()[0]
    import math

    assert not math.isnan(s["mean_score"])  # constant dim contributes 0
