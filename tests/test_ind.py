"""IND golden tests: pinned expectations from the reference
(src/tests/unit/test_ind_verifier.cpp:75-110 on IndTestTypos.csv), two-table
referential checks on driver testdata, and the HLL pre-screen."""

import pandas as pd
import pytest

from pyspark_validator.checks.ind import ind_check
from pyspark_validator.oracle import fixtures
from pyspark_validator.oracle.pandas_oracle import ind_oracle


def _row(df):
    return df.collect()[0]


# (lhs cols, rhs cols, violating rows, violating clusters, error)
GOLDEN = [
    (["typo_col"], ["typo_col2"], 8, 6, 6 / 6),
    (["typo_col"], ["pk1"], 3, 2, 2 / 6),
    (["typo_col2"], ["pk2"], 3, 2, 2 / 6),
    (["typo_col", "typo_col2"], ["pk1", "pk2"], 3, 2, 2 / 6),
    (["pk1"], ["typo_col"], 4, 4, 4 / 8),
    (["rand"], ["typo_col"], 5, 2, 2 / 5),
]


@pytest.mark.parametrize("lhs,rhs,v_rows,v_clusters,err", GOLDEN)
def test_ind_typos_golden(spark, lhs, rhs, v_rows, v_clusters, err):
    df = fixtures.ind_typos_spark(spark)
    s = _row(ind_check(df, lhs, df, rhs).summary())
    assert s.n_violating_rows == v_rows
    assert s.n_violating_clusters == v_clusters
    assert s.error == pytest.approx(err)
    assert s.holds == (v_clusters == 0)
    # oracle agreement
    pdf = pd.DataFrame(fixtures.IND_TYPOS_ROWS, columns=fixtures.IND_TYPOS_COLS)
    o = ind_oracle(pdf, lhs, pdf, rhs)
    assert (s.n_violating_clusters, s.n_violating_rows) == (
        o.num_violating_clusters,
        o.num_violating_rows,
    )


def test_ind_two_table_referential(spark):
    """orders.o_custkey subseteq customer.c_custkey on driver testdata; holds by
    construction of the TPC-H-ish generator."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    s = _row(ind_check(orders, ["o_custkey"], customer, ["c_custkey"]).summary())
    assert s.holds
    assert s.n_violating_clusters == 0
    # reverse direction typically fails (customers without orders are fine, but
    # every c_custkey must appear as o_custkey only if all customers ordered)
    s_rev = _row(ind_check(customer, ["c_custkey"], orders, ["o_custkey"]).summary())
    assert s_rev.n_violating_clusters >= 0  # value checked vs oracle below
    import duckdb

    exp = duckdb.sql(
        """
        SELECT count(*) FROM (
          SELECT DISTINCT c_custkey FROM read_parquet('/root/testdata/sf0.001/customer.parquet')
          WHERE c_custkey NOT IN (SELECT o_custkey FROM read_parquet('/root/testdata/sf0.001/orders.parquet'))
        )"""
    ).fetchone()[0]
    assert s_rev.n_violating_clusters == exp


def test_ind_violations_listing(spark):
    df = fixtures.ind_typos_spark(spark)
    v = ind_check(df, ["typo_col"], df, ["pk1"]).violations().collect()
    vals = sorted(r.typo_col for r in v)
    assert vals == ["1", "4"]  # distinct typo_col values absent from pk1
    occ = {r.typo_col: r.occurrences for r in v}
    assert occ == {"1": 2, "4": 1}


def test_ind_null_handling(spark):
    """NULL LHS keys must be counted (null-safe anti join), matching the pandas
    oracle, not silently dropped like a plain SQL NOT IN."""
    lhs = spark.createDataFrame([("a",), (None,), (None,)], ["k"])
    rhs = spark.createDataFrame([("a",), ("b",)], ["r"])
    s = _row(ind_check(lhs, ["k"], rhs, ["r"]).summary())
    assert s.n_violating_clusters == 1  # the NULL value-group
    assert s.n_violating_rows == 2
    # and NULL matches NULL on the RHS
    rhs2 = spark.createDataFrame([("a",), (None,)], ["r"])
    s2 = _row(ind_check(lhs, ["k"], rhs2, ["r"]).summary())
    assert s2.holds


def test_ind_hll_prescreen(spark):
    df = fixtures.ind_typos_spark(spark)
    a = _row(ind_check(df, ["typo_col"], df, ["pk1"]).approx_inclusion())
    # union of {0..5} and pk1 {0,2,3,5,6,7,8,9} has 10 distinct; rhs has 8
    assert a.approx_violating_lhs >= 1  # proves violation without a join


def test_ind_per_partition_verdicts(spark):
    """Per-partition rollup must reconcile exactly with the global summary and
    be invariant to physical repartitioning (north-rule exactness)."""
    o = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    r = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = ind_check(o, ["c_custkey"], r, ["o_custkey"])
    v = c.verdicts(num_partitions=16)
    g = c.summary().collect()[0]
    from pyspark.sql import functions as F

    agg = v.agg(
        F.sum("n_violating_clusters").alias("vc"),
        F.sum("n_distinct_lhs").alias("nd"),
    ).collect()[0]
    assert agg.vc == g.n_violating_clusters
    assert agg.nd == g.n_distinct_lhs
    rows1 = sorted(tuple(x) for x in v.collect())
    v2 = ind_check(o.repartition(7), ["c_custkey"], r, ["o_custkey"]).verdicts(16)
    assert sorted(tuple(x) for x in v2.collect()) == rows1
