"""DataStats golden parity vs the reference's own unit suite.

Every expected value below is lifted verbatim from
/root/reference/src/tests/unit/test_data_stats.cpp over the reference's own
fixture CSVs (test_input_data/TestDataStats.csv, BernoulliRelation.csv,
SimpleTypes.csv, TestMetric.csv). The fixtures are parsed with the reference's
conventions: the literal string ``NULL`` is null, the empty cell is the
distinct Empty value (kept as "" in string columns, null in numeric ones),
rows keep file order (builtin.h:36-40, typed_column_data.h:181-251).
"""

import csv
import math

import pandas as pd
import pytest

from pyspark_validator.compat import DataStats

REF = "/root/reference/test_input_data"

#: reference type assignment for TestDataStats.csv columns (0-based)
_TDS_FLOAT = {2, 7, 9}
_TDS_INT = {3, 4, 8}


def _load_ref_csv(name, header, float_cols=(), int_cols=()):
    with open(f"{REF}/{name}", newline="") as f:
        rows = list(csv.reader(f))
    if header:
        names, rows = rows[0], rows[1:]
    else:
        names = [f"c{i}" for i in range(len(rows[0]))]
    cols = {}
    for i, name_i in enumerate(names):
        vals = [r[i] for r in rows]
        if i in float_cols:
            cols[name_i] = pd.array(
                [None if v in ("", "NULL") else float(v) for v in vals],
                dtype="float64",
            )
        elif i in int_cols:
            cols[name_i] = pd.array(
                [None if v in ("", "NULL") else int(v) for v in vals],
                dtype="Int64",
            )
        else:
            cols[name_i] = pd.array(
                [None if v == "NULL" else v for v in vals], dtype="object"
            )
    return pd.DataFrame(cols)


@pytest.fixture(scope="module")
def tds(spark):
    ds = DataStats(spark)
    ds.load_data(_load_ref_csv("TestDataStats.csv", header=False,
                               float_cols=_TDS_FLOAT, int_cols=_TDS_INT))
    ds.execute(exact_quantiles=True)
    return ds


@pytest.fixture(scope="module")
def bern(spark):
    ds = DataStats(spark)
    ds.load_data(_load_ref_csv("BernoulliRelation.csv", header=True,
                               int_cols=set(range(6))))
    ds.execute(exact_quantiles=True)
    return ds


def test_string_word_stats(tds):
    # TestGetWords / TestGetTopKWords / TestGetWordCount /
    # TestGetEntirely{Upper,Lower}caseCount / TestGet{Max,Min}Words
    assert set(tds.get_words("c6")) == {
        "abc", "abd", "abe", "eeee", "ggg", "gre", "grg"
    }
    assert tds.get_top_k_words("c11", 1) == ["this"]
    assert tds.get_number_of_words("c11") == 21
    assert tds.get_number_of_entirely_uppercase_words("c11") == 2
    assert tds.get_number_of_entirely_lowercase_words("c11") == 16
    assert tds.get_max_number_of_words("c11") == 9
    assert tds.get_min_number_of_words("c11") == 1


def test_string_char_stats(tds):
    # TestGet{Max,Min}Chars / TestGetAvgNumberOfChars / TestGetNumberOfChars /
    # TestGetNumberOf{Uppercase,Lowercase,Digit,NonLetter}Chars /
    # TestGetTopKChars / TestGetVocab
    assert tds.get_max_number_of_chars("c10") == 13
    assert tds.get_min_number_of_chars("c10") == 3
    assert tds.get_avg_number_of_chars("c10") == pytest.approx(5.875)
    assert tds.get_number_of_chars("c10") == 47
    assert tds.get_number_of_uppercase_chars("c10") == 6
    assert tds.get_number_of_lowercase_chars("c10") == 33
    assert tds.get_number_of_digit_chars("c10") == 6
    assert tds.get_number_of_non_letter_chars("c10") == 8
    assert tds.get_top_k_chars("c10", 2) == ["d", "a"]
    assert tds.get_vocab("c1") == "abd"


def test_null_and_unique_columns(spark, tds):
    # TestGetNumberOfNulls / NumberOfValues / TestGetColumnsWithUniqueValues
    assert tds.get_num_nulls("c0") == 5
    assert tds.get_number_of_values("c0") == 0
    # pybind getter returns column indices (c0..c11 -> 0..11)
    assert tds.get_columns_with_all_unique_values() == [8, 9, 10, 11]

    # TestGetNullColumns on SimpleTypes (all columns as strings suffices:
    # only the all-NULL-literal column qualifies)
    ds = DataStats(spark)
    ds.load_data(_load_ref_csv("SimpleTypes.csv", header=True))
    ds.execute()
    names = ds._data_cols
    assert [names.index(n) for n in ds.get_null_columns()] == [1]

    # TestGetColumnsWithNull on TestMetric
    dm = DataStats(spark)
    dm.load_data(_load_ref_csv("TestMetric.csv", header=True))
    dm.execute()
    assert dm.get_columns_with_null() == list(range(6, 16))


def test_numeric_center_and_deviation(tds):
    # TestMedianAD / TestGetMedian / TestMeanAD
    assert tds.get_median_ad("c8") == pytest.approx(123.0, rel=1e-12)
    assert tds.get_median("c8") == pytest.approx(35.0, rel=1e-12)
    assert tds.get_median("c9") == pytest.approx(25.875, rel=1e-12)
    assert tds.get_mean_ad("c7") == pytest.approx(258.263, rel=1e-12)


def test_numeric_aggregates(tds):
    # TestGeometricMean / TestSumOfSquares / TestNumberOfNegatives /
    # TestGetNumberOfZeros / TestMinDouble / TestMaxDouble / TestSumDouble /
    # TestGetAvg
    assert tds.get_geometric_mean("c3") == pytest.approx(
        2.4819630489759605, rel=1e-12
    )
    assert tds.get_geometric_mean("c9") == pytest.approx(
        33.33024629230983, rel=1e-12
    )
    assert tds.get_sum_of_squares("c7") == pytest.approx(
        1096089.607224, rel=1e-12
    )
    assert tds.get_number_of_negatives("c8") == 3
    assert tds.get_number_of_zeros("c7") == 3
    assert tds.get_min("c2") == pytest.approx(1.07)
    assert tds.get_max("c2") == pytest.approx(143.9)
    assert tds.get_sum("c2") == pytest.approx(212.61, rel=1e-12)
    assert tds.get_average("c2") == pytest.approx(53.1525, rel=1e-12)


def test_string_min_max_skip_empties(tds):
    # TestMinString / TestMaxString: "" never wins (DeleteNullAndEmpties)
    assert tds.get_min("c1") == "a"
    assert tds.get_max("c1") == "abd"


def test_distinct_and_categorical(tds):
    # TestDistinct / TestDistinctStringColumn / TestIsCategorial
    assert tds.get_number_of_distinct("c3") == 5
    assert tds.get_number_of_distinct("c5") == 6  # mixed column, as strings
    assert tds.get_number_of_distinct("c6") == 7
    assert tds.is_categorical("c3", 5)


def test_nearest_rank_quantiles_and_iqr(tds):
    # TestGetQuantiles: col4 = [1..5], k = floor(5*part)
    assert tds.get_quantile(0.25, "c4") == 2
    assert tds.get_quantile(0.5, "c4") == 3
    assert tds.get_quantile(0.75, "c4") == 4
    # TestNewStatistics InterquartileRange_*
    assert tds.get_interquartile_range("c2") == pytest.approx(126.69, abs=1e-3)
    assert tds.get_interquartile_range("c4") == pytest.approx(2.0, abs=1e-3)
    assert tds.get_interquartile_range("c8") == pytest.approx(920.0, abs=1e-3)
    assert tds.get_interquartile_range("c1") is None  # string -> empty stat


def test_bernoulli_moments(bern):
    # TestGetSTD / TestGetSkewness / TestGetKurtosis (hybrid estimators:
    # population central moments over the corrected std)
    assert bern.get_corrected_std("B") == pytest.approx(
        0.547722557505166113456969782801, rel=1e-12
    )
    assert bern.get_skewness("B") == pytest.approx(0.0, abs=1e-12)
    assert bern.get_kurtosis("B") == pytest.approx(-2.305, abs=1e-3)
    # TestGetNumberOfZeros (Int zeros)
    assert bern.get_number_of_zeros("A") == 5


def test_coefficient_of_variation(tds):
    # TestNewStatistics CoefficientOfVariation_*
    assert tds.get_coefficient_of_variation("c7") == pytest.approx(
        1.714, abs=1e-2
    )
    cv = tds.get_coefficient_of_variation("c9")
    assert cv == pytest.approx(
        tds.get_corrected_std("c9") / tds.get_average("c9"), rel=1e-10
    )


def test_monotonicity(tds):
    # TestNewStatistics Monotonicity_*: file order, null/empty skipped
    assert tds.get_monotonicity("c3") == "ascending"
    assert tds.get_monotonicity("c1") == "ascending"  # "",a,aaa,abd,"" -> skip ""
    assert tds.get_monotonicity("c2") == "none"
    assert tds.get_monotonicity("c4") == "ascending"  # trailing nulls skipped


def test_jarque_bera(tds):
    # TestNewStatistics JarqueBera_*: JB = n/6*(S^2+(K-3)^2/4) with the
    # reference's OWN S and already-excess K (literal double subtraction)
    for col, n in (("c7", 8), ("c8", 8)):
        s, k = tds.get_skewness(col), tds.get_kurtosis(col)
        expected = n / 6.0 * (s * s + (k - 3.0) ** 2 / 4.0)
        assert tds.get_jarque_bera_statistic(col) == pytest.approx(
            expected, rel=1e-10
        )
    jb3 = tds.get_jarque_bera_statistic("c3")
    assert 0.0 <= jb3 < 10.0


def test_entropy_and_gini(tds):
    # TestNewStatistics Entropy_*: string-only, log2, null/empty skipped
    assert tds.get_entropy("c6") == pytest.approx(2.75, abs=1e-2)
    assert tds.get_entropy("c10") == pytest.approx(
        math.log2(tds.get_number_of_distinct("c10")), abs=0.1
    )
    assert tds.get_entropy("c1") > 0.0
    assert tds.get_entropy("c2") is None  # numeric -> empty stat
    # Gini sanity on the same semantics: 1 - sum p^2 over non-empty values
    assert tds.get_gini_coefficient("c6") == pytest.approx(
        1.0 - ((2 / 8) ** 2 + 6 * (1 / 8) ** 2), rel=1e-12
    )
