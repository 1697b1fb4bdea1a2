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
    assert "l_quantity" not in ds.get_columns_with_null()
    assert ds.get_min_number_of_chars("l_returnflag") == 1
    assert len(ds.get_all_statistics_as_string()) > 100
