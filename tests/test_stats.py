"""Column-profile tests: cross-validated against pandas/numpy formulas (the
reference computes the same quantities single-node: statistics/data_stats.cpp)."""

import numpy as np
import pandas as pd
import pytest

from pyspark_validator.checks.stats import (
    entropy_and_gini,
    monotonicity,
    numeric_profile,
    string_profile,
    topk_values,
    topk_words,
)


@pytest.fixture(scope="module")
def num_df(spark):
    rng = np.random.RandomState(42)
    vals = np.concatenate([rng.normal(10, 3, 500), rng.exponential(5, 300), [0, 0, -5]])
    pdf = pd.DataFrame({"x": vals, "y": rng.randint(0, 7, len(vals)).astype(float)})
    pdf.loc[::50, "x"] = np.nan
    return spark.createDataFrame(pdf), pdf


def test_numeric_profile_exact(spark, num_df):
    df, pdf = num_df
    row = numeric_profile(df, ["x"], exact_quantiles=True).collect()[0]
    x = pdf["x"].dropna()
    assert row.column == "x"
    assert row["count"] == len(x)
    assert row.n_nulls == pdf["x"].isna().sum()
    assert row.n_distinct == x.nunique()
    assert row.min == pytest.approx(x.min())
    assert row.max == pytest.approx(x.max())
    assert row.avg == pytest.approx(x.mean())
    assert row.std == pytest.approx(x.std(ddof=1), rel=1e-9)
    # population skewness / kurtosis (non-excess), matching our documented formulas
    m = x - x.mean()
    m2, m3, m4 = (m**2).mean(), (m**3).mean(), (m**4).mean()
    assert row.skewness == pytest.approx(m3 / m2**1.5, rel=1e-7)
    assert row.kurtosis == pytest.approx(m4 / m2**2, rel=1e-7)
    assert row.median == pytest.approx(x.quantile(0.5, interpolation="linear"))
    assert row.q25 == pytest.approx(x.quantile(0.25, interpolation="linear"))
    assert row.n_zeros == (x == 0).sum()
    assert row.n_negatives == (x < 0).sum()
    assert row.sum_squares == pytest.approx((x**2).sum())
    pos = x[x > 0]
    assert row.geometric_mean == pytest.approx(np.exp(np.log(pos).mean()), rel=1e-9)


def test_string_profile(spark):
    rows = [("hello world",), ("",), (None,), ("NULL",), ("  pad  ",), ("héllo",), ("one two three",)]
    df = spark.createDataFrame(rows, ["s"])
    r = string_profile(df, ["s"]).collect()[0]
    assert r["count"] == 6  # non-null
    assert r.n_nulls == 1
    assert r.n_empties == 1
    assert r.n_null_literals == 1
    assert r.n_distinct == 6
    assert r.max_len == 13
    assert r.total_words == 2 + 0 + 1 + 1 + 1 + 3
    assert r.n_untrimmed == 1
    assert r.n_non_ascii == 1


def test_topk(spark):
    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, ["v"])
    top = topk_values(df, "v", 2).collect()
    assert [(t.value, t.cnt) for t in top] == [("a", 5), ("b", 3)]
    words = spark.createDataFrame([("x y x",), ("y x",)], ["t"])
    tw = topk_words(words, "t", 2).collect()
    assert [(t.word, t.cnt) for t in tw] == [("x", 3), ("y", 2)]


def test_entropy_gini(spark):
    df = spark.createDataFrame([("a",)] * 2 + [("b",)] * 2, ["v"])
    r = entropy_and_gini(df, "v").collect()[0]
    assert r.entropy == pytest.approx(np.log(2))
    assert r.gini == pytest.approx(0.5)


def test_monotonicity(spark):
    df = spark.createDataFrame([(i, float(i * 2)) for i in range(100)], ["o", "v"])
    r = monotonicity(df, "v", "o").collect()[0]
    assert r.monotonic_asc and not r.monotonic_desc
    df2 = spark.createDataFrame([(i, float(-i)) for i in range(100)], ["o", "v"])
    r2 = monotonicity(df2, "v", "o").collect()[0]
    assert r2.monotonic_desc and not r2.monotonic_asc


def test_string_profile_extras(spark):
    """Char classes, whitespace/special rows, case-word counts
    (data_stats.h:141-212 getter parity on a hand-checked frame)."""
    from pyspark_validator.checks.stats import string_profile

    df = spark.createDataFrame(
        [("Héllo World",), ("ABC d2f",), ("  ",), ("",), (None,), ("x@y 'Q'",)],
        ["s"],
    )
    r = string_profile(df, ["s"]).collect()[0]
    assert r.n_chars == 27
    assert r.n_digit_chars == 1
    assert r.n_lowercase_chars == 11  # ASCII a-z; é is non-ASCII
    assert r.n_uppercase_chars == 6
    assert r.n_whitespace_only == 1
    assert r.n_leading_ws == 1 and r.n_trailing_ws == 1
    assert r.n_special_rows == 1  # "x@y 'Q'" hits @ and ' from kSpecialChars
    assert (r.min_whitespaces, r.max_whitespaces) == (1, 2)
    assert r.n_entirely_upper_words == 2  # ABC, 'Q'
    assert r.n_entirely_lower_words == 2  # d2f, x@y
    assert (r.min_words, r.max_words) == (0, 2)


def test_char_stats(spark):
    """GetVocab / GetTopKChars / GetCharFrequency / diacritics parity."""
    from pyspark_validator.checks.stats import char_stats

    df = spark.createDataFrame(
        [("banana",), ("bab",), ("",), (None,), ("Ménü",)], ["s"]
    )
    r = char_stats(df, ["s"], k=3).collect()[0]
    assert r.vocab == "Mabnéü"
    # counts: a=4 b=3 n=3 M=1 é=1 ü=1 -> top3 = a, b, n (count desc, char asc)
    assert r.top_k_chars == ["a", "b", "n"]
    assert r.first_char_freq == "b:2"
    assert r.last_char_freq in ("a:1", "b:1", "ü:1")  # all counts 1 -> max char
    assert r.last_char_freq == "ü:1"
    assert r.n_diacritic_chars == 2  # é and ü decompose to one Mn mark each
