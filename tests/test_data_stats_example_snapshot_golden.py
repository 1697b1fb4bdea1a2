"""DataStats walkthrough pinned to the reference's data_stats example
snapshot (snap_test_examples_pytest.py data_stats_output) over Workshop.csv.

Every asserted value is a published digit: the table-level census (no null
columns, columns 0-1 all-unique, 6 columns), each column's min/max/distinct
and char/word extents, the id-column char vocabulary, and the numeric
column 4 block (avg 932.258201058201, sum of squares 894298474, median 945,
corrected std 278.07204551856535, IQR 220, CV 0.2982779290146521,
monotonicity none, Jarque-Bera 202.76349414378436)."""

import pandas as pd
import pytest

WORKSHOP = "/root/reference/examples/datasets/Workshop.csv"


@pytest.fixture(scope="module")
def stats(spark):
    from pyspark_validator.compat import DataStats

    ds = DataStats(spark)
    ds.load_data(pd.read_csv(WORKSHOP))
    ds.execute()
    return ds


def test_table_level_census(stats):
    assert stats.get_columns_with_null() == []
    assert stats.get_columns_with_all_unique_values() == [0, 1]
    assert stats.get_number_of_columns() == 6


def test_id_column_0(stats):
    assert stats.get_min(0) == "0008f14d-e2a7-4582-bf5e-89ce32b55606"
    assert stats.get_max(0) == "fff1cd7a-04f9-486c-97de-d5d2c6ddb3cb"
    assert stats.get_number_of_distinct(0) == 945
    assert stats.get_min_number_of_chars(0) == 36
    assert stats.get_max_number_of_chars(0) == 36
    assert stats.get_min_number_of_words(0) == 1
    assert stats.get_max_number_of_words(0) == 1
    assert "".join(stats.get_vocab(0)) == "-0123456789abcdef"


def test_string_columns(stats):
    assert stats.get_min(1) == "Anthony Campbell"
    assert stats.get_max(1) == "William Taylor"
    assert stats.get_number_of_distinct(1) == 945
    assert (stats.get_min_number_of_chars(1), stats.get_max_number_of_chars(1)) == (8, 21)
    assert "".join(stats.get_vocab(1)) == " ABCDEGHJKLMNPRSTWYabcdefghiklmnoprstuvwyz"

    assert stats.get_min(2) == "Addyson Aaliyah"
    assert stats.get_max(2) == "Shena Desiree"
    assert stats.get_number_of_distinct(2) == 6
    assert (stats.get_min_number_of_chars(2), stats.get_max_number_of_chars(2)) == (11, 15)

    assert stats.get_min(3) == "MonsterWorq"
    assert stats.get_max(3) == "Yogatacular"
    assert stats.get_number_of_distinct(3) == 5
    assert "".join(stats.get_vocab(3)) == "AMSTVWYabceghiklnopqrstu"

    assert stats.get_min(5) == "Client Solution Analyst"
    assert stats.get_max(5) == "Workshop Technician"
    assert stats.get_number_of_distinct(5) == 15
    assert (stats.get_min_number_of_words(5), stats.get_max_number_of_words(5)) == (1, 3)
    assert "".join(stats.get_vocab(5)) == " -ACDEFJLMOPRSTWacdeghijklmnoprstuvy"


def test_salary_column_4_numeric_block(stats):
    assert stats.get_min(4) == 465
    assert stats.get_max(4) == 2036
    assert stats.get_number_of_distinct(4) == 28
    assert stats.get_average(4) == pytest.approx(932.258201058201, abs=1e-9)
    assert stats.get_sum_of_squares(4) == pytest.approx(894298474)
    assert stats.get_median(4) == pytest.approx(945.0)
    assert stats.get_corrected_std(4) == pytest.approx(278.07204551856535, abs=1e-9)
    assert stats.get_interquartile_range(4) == pytest.approx(220.0)
    assert stats.get_coefficient_of_variation(4) == pytest.approx(
        0.2982779290146521, abs=1e-12
    )
    assert stats.get_monotonicity(4) == "none"
    assert stats.get_jarque_bera_statistic(4) == pytest.approx(
        202.76349414378436, abs=1e-8
    )
