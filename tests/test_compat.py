"""Reference-API facade tests: the load-once/execute-many lifecycle and getter
names must behave like the reference bindings (verifying_ucc.py example shape,
examples/basic/verifying_ucc.py:19-35)."""

import pandas as pd
import pytest

from pyspark_validator.compat import FdVerifier, IndVerifier, UccVerifier


def test_ucc_verifier_lifecycle(spark):
    v = UccVerifier(spark)
    v.load_data(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
    # execute-many without reloading (reference contract algorithm.cpp:91-95)
    v.execute(ucc_indices=["l_orderkey", "l_linenumber"])
    assert not v.ucc_holds()
    assert v.get_num_clusters_violating_ucc() == 1161  # known data fact
    assert v.get_num_rows_violating_ucc() == 2562
    assert v.get_error() == pytest.approx(3368 / (6000 * 5999))
    assert len(v.get_clusters_violating_ucc()) > 0

    v.execute(ucc_indices=[0, 3, 5])  # positional indices like the reference
    assert isinstance(v.ucc_holds(), bool)


def test_fd_verifier_with_pandas_input(spark):
    pdf = pd.DataFrame({"x": ["a", "a", "b"], "y": ["1", "2", "1"]})
    v = FdVerifier(spark)
    v.load_data(pdf)
    v.execute(lhs_indices=[0], rhs_indices=[1])
    assert not v.fd_holds()
    assert v.get_num_error_clusters() == 1
    assert v.get_num_error_rows() == 2
    assert v.get_error() == pytest.approx(2 / (3 * 3 - 3))
    hl = v.get_highlights()
    assert hl[0]["num_distinct_rhs_values"] == 2
    assert hl[0]["lhs_values"] == ["a"]


def test_ind_verifier_two_tables(spark):
    v = IndVerifier(spark)
    v.load_data(
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet"),
    )
    v.execute(lhs_indices=["o_custkey"], rhs_indices=["c_custkey"])
    assert v.ind_holds()
    assert v.get_violating_clusters_count() == 0


def test_data_stats_facade(spark):
    from pyspark_validator.compat import DataStats

    ds = DataStats(spark)
    ds.load_data(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
    ds.execute()
    import duckdb

    exp = duckdb.sql(
        """SELECT min(l_quantity), max(l_quantity), avg(l_quantity),
                  stddev_samp(l_quantity), median(l_quantity),
                  count(DISTINCT l_quantity)
           FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')"""
    ).fetchone()
    assert ds.get_min("l_quantity") == exp[0]
    assert ds.get_max("l_quantity") == exp[1]
    assert ds.get_average("l_quantity") == pytest.approx(exp[2])
    assert ds.get_corrected_std("l_quantity") == pytest.approx(exp[3])
    assert ds.get_median("l_quantity") == pytest.approx(exp[4])
    assert ds.get_number_of_distinct("l_quantity") == exp[5]
    assert ds.get_interquartile_range("l_quantity") == pytest.approx(
        ds.get_quantile_75("l_quantity") - ds.get_quantile_25("l_quantity")
    )
    assert ds.get_mean_ad("l_quantity") > 0
    assert ds._data_cols.index("l_quantity") not in ds.get_columns_with_null()
    assert ds.get_min_number_of_chars("l_returnflag") == 1
    assert len(ds.get_all_statistics_as_string()) > 100


def test_compat_md_verifier(spark):
    from pyspark_validator.compat import MdVerifier

    rows = [
        (0, "Simba", "lion", "meat"), (1, "Clarence", "lion", "mead"),
        (2, "Baloo", "bear", "fish"), (3, "Pooh", "beer", "fish"),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "animal", "diet"])
    v = MdVerifier(spark)
    v.load_data(df)
    v.execute(
        lhs=[("levenshtein", "animal", None, 0.75)],
        rhs=("levenshtein", "diet", None, 0.75),
        left_id="id",
    )
    assert v.get_result() is True
    assert v.get_true_rhs_decision_boundary() == 0.75
    v.execute(
        lhs=[("levenshtein", "name", None, 0.125),
             ("levenshtein", "animal", None, 0.75)],
        rhs=("levenshtein", "name", None, 0.5),
        left_id="id",
    )
    assert v.get_result() is False
    assert abs(v.get_true_rhs_decision_boundary() - 0.2) < 1e-12
    hl = {(h["left_id"], h["right_id"]) for h in v.get_highlights()}
    assert hl == {(2, 3), (3, 2)}
    assert v.get_md_suggestion()["rhs"][1] == v.get_true_rhs_decision_boundary()


def test_compat_sd_verifier(spark):
    from pyspark_validator.compat import SdVerifier

    rows = [(x + 1, y) for x, y in enumerate([0, 5, 10, 20, 40, 45, 55, 65, 70])]
    df = spark.createDataFrame(rows, ["x", "y"])
    v = SdVerifier(spark)
    v.load_data(df)
    v.execute(["x"], ["y"], g1=0.0, g2=10.0)  # BasicViolation fixture
    assert v.get_ops() == 1
    assert abs(v.get_confidence() - 8 / 9) < 1e-9
    assert v.holds(0.2) and not v.holds(0.05)
    viol = v.get_violations()
    assert [x["kind"] for x in viol] == ["insertion"]
    v.execute(["x"], ["y"], g1=0.0, g2=-1.0)  # negative g2 = infinity
    assert v.get_ops() == 0 and v.get_error() == 0.0


def test_data_stats_string_extras_getters(spark):
    import pandas as pd

    from pyspark_validator.compat import DataStats

    ds = DataStats(spark)
    ds.load_data(
        pd.DataFrame(
            {
                "s": ["Hello World.", "ABC DEF", "  padded  ", "café", "x1 y2"],
            }
        )
    )
    ds.execute()
    assert ds.get_number_of_digit_chars("s") == 2
    assert ds.get_number_of_words("s") == 2 + 2 + 1 + 1 + 2
    assert ds.get_min_number_of_words("s") == 1
    assert ds.get_number_of_entirely_uppercase_words("s") >= 2  # ABC DEF
    assert ds.get_number_of_rows_with_leading_whitespace("s") == 1
    assert ds.get_number_of_rows_with_trailing_whitespace("s") == 1
    # char-level (lazy)
    assert "H" in ds.get_vocab("s")
    assert len(ds.get_top_k_chars("s", 3)) == 3
    assert ds.get_number_of_diacritic_chars("s") == 1  # é
    assert ":" in ds.get_first_char_frequency("s")
    # word-level
    assert ds.get_top_k_words("s", 2)
    assert "Hello" in ds.get_words("s")
