"""Domain-PAC tests: hand-computed ECDF expectations on tiny tables
(reference semantics: pac/domain_pac.h -- Pr(x in D +- eps) >= delta)."""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.checks.pac import (
    categorical_distance,
    domain_pac_check,
    interval_distance,
    value_set_distance,
)


def _row(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_pac_interval_holds(spark):
    # 8 of 10 values in [0, 10]; outliers at 12 (dist 2) and 15 (dist 5)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 12.0, 15.0]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    c = domain_pac_check(df, interval_distance(F.col("x"), 0, 10), exact=True)
    s = _row(c.holds(epsilon=0.0, delta=0.8))
    assert s.holds and s.actual_delta == pytest.approx(0.8)
    assert s.n_violating_rows == 2
    assert not _row(c.holds(epsilon=0.0, delta=0.9)).holds
    assert _row(c.holds(epsilon=2.0, delta=0.9)).holds  # 12 now inside
    assert _row(c.holds(epsilon=5.0, delta=1.0)).holds


def test_pac_epsilon_for_delta(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 12.0, 15.0]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    c = domain_pac_check(df, interval_distance(F.col("x"), 0, 10), exact=True)
    e = _row(c.epsilon_for_delta(1.0))
    assert e.epsilon == pytest.approx(5.0)
    d = _row(c.delta_for_epsilon(2.0))
    assert d.delta == pytest.approx(0.9)


def test_pac_value_set_and_categorical(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (7.5,)], ["x"])
    c = domain_pac_check(df, value_set_distance(F.col("x"), [1, 2, 3]), exact=True)
    # distances: 0, 0, 4.5
    assert _row(c.holds(4.5, 1.0)).holds
    assert not _row(c.holds(4.4, 1.0)).holds

    sdf = spark.createDataFrame([("a",), ("b",), ("zz",)], ["k"])
    cc = domain_pac_check(sdf, categorical_distance(F.col("k"), ["a", "b"]), exact=True)
    s = _row(cc.holds(0.0, 2 / 3))
    assert s.holds and s.n_violating_rows == 1


def test_pac_ecdf_and_elbow(spark):
    # 95 in-domain values + 5 progressively distant outliers -> the ECDF is flat
    # until delta ~ 0.95 then rises; the elbow lands at the flat segment's end.
    rows = [(float(i % 10),) for i in range(95)] + [
        (20.0,), (30.0,), (40.0,), (50.0,), (60.0,)
    ]
    df = spark.createDataFrame(rows, ["x"])
    c = domain_pac_check(df, interval_distance(F.col("x"), 0, 10), exact=True)
    grid = c.ecdf(min_delta=0.9, steps=11).collect()
    assert len(grid) == 11
    # percentile interpolates between order stats: the flat segment runs
    # through delta=0.94 (the 95th order stat is the last 0-distance value)
    assert all(g.epsilon == 0.0 for g in grid if g.delta <= 0.941)
    assert all(g.epsilon > 0.0 for g in grid if g.delta >= 0.95)
    knee = c.elbow(min_delta=0.9, steps=11)
    assert knee["delta"] == pytest.approx(0.94, abs=0.011)
    assert knee["epsilon"] == pytest.approx(0.0)
