"""Domain-PAC refinement goldens vs the reference's own unit suite.

Every (epsilon, delta) pair is lifted verbatim from
/root/reference/src/tests/unit/test_domain_pac_verifier.cpp for the
parameterizations whose fixtures the repo ships (SimpleTypos.csv,
MixedWithNulls.csv, TestDC1.csv; the CustomMetricBalls cases need an
unshipped CSV). The tolerance matches the reference's kThreshold = 1e-3.

The refinement replica (checks/pac.py DomainPACCheck.refine) replays
FindEpsilons + FindEpsilonDelta exactly over the distinct-distance CDF;
domains are the reference's Parallelepiped (Chebyshev to the nearer bound,
leveled) and Ball (leveled euclidean minus radius), with null components
contributing distance 0.
"""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.checks.pac import (
    DomainPACCheck,
    ball_distance,
    chebyshev_box_distance,
)
from pyspark_validator.io import read_reference_csv

REF = "/root/reference/test_input_data"
TOL = 1e-3


@pytest.fixture(scope="module")
def typos(spark):
    return read_reference_csv(spark, f"{REF}/SimpleTypos.csv")


@pytest.fixture(scope="module")
def dc1(spark):
    return read_reference_csv(spark, f"{REF}/TestDC1.csv")


def _check(df, dist, **kw):
    return DomainPACCheck(df=df, distance=dist, exact=True).refine(**kw)


@pytest.mark.parametrize(
    "lo,hi,kw,exp_eps,exp_delta",
    [
        # -- "Refinement" (#0, #1, #6, #7) --
        (0, 5, {"min_delta": 0.8}, 0, 0.9),
        (5, 7, {}, 4, 1),  # defaults: min_delta 0.9
        (11, 11, {"min_delta": 0.3}, 9, 0.6),  # +inf side
        (0, 0, {"min_delta": 0.3}, 4, 0.9),  # -inf side
        # -- parametrized refinement (#12) : (min_eps, ??) wins as a point --
        (0, 5, {"min_delta": 0.0, "min_epsilon": 1}, 1, 0.9),
        # -- no pairs between min/max eps (#22-#30) --
        (0, 3, {"min_epsilon": 3, "max_epsilon": 4}, 3, 0.9),
        (0, 3, {"min_epsilon": 3, "max_epsilon": 3}, 1, 0.9),
        (0, 5, {"min_epsilon": 3, "max_epsilon": 4}, 3, 0.9),
        (0, 5, {"min_epsilon": 3, "max_epsilon": 3}, 0, 0.9),
        (0, 5, {"min_epsilon": 6, "max_epsilon": -1}, 5, 1),
        (0, 5, {"min_epsilon": 6, "max_epsilon": 6}, 5, 1),
        (0, 5, {"min_epsilon": 0, "max_epsilon": 2}, 0, 0.9),
        (0, 5, {"min_epsilon": 2, "max_epsilon": 2}, 0, 0.9),
        (7, 7, {"min_epsilon": 0, "max_epsilon": 2}, 0, 0),  # empty domain
    ],
)
def test_simple_typos_parallelepiped(typos, lo, hi, kw, exp_eps, exp_delta):
    dist = chebyshev_box_distance(["OneTypo"], [lo], [hi])
    res = _check(typos, dist, **kw)
    assert res["epsilon"] == pytest.approx(exp_eps, abs=TOL)
    assert res["delta"] == pytest.approx(exp_delta, abs=TOL)


@pytest.mark.parametrize(
    "min_delta,exp_eps,exp_delta",
    [(0.7, 0, 0.8), (0.9, 1, 1)],
)
def test_mixed_with_nulls_not_null_domain(spark, min_delta, exp_eps, exp_delta):
    # NotNullDomain (test file :85-103): distance 1 for NULL, else 0; the
    # empty cell is NOT null (kEmpty is a value). Spark's CSV reader drops
    # fully-empty lines, so parse with the csv module to keep the kEmpty row
    # the reference counts (10 rows, 2 NULL literals -> 0.8 at min_delta 0.7).
    import csv

    import pandas as pd

    with open(f"{REF}/MixedWithNulls.csv", newline="") as f:
        rows = list(csv.reader(f))
    vals = [None if (r and r[0] == "NULL") else (r[0] if r else "") for r in rows[1:]]
    df = spark.createDataFrame(pd.DataFrame({"v": pd.array(vals, dtype="object")}))
    dist = F.when(F.col("v").isNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    res = _check(df, dist, min_delta=min_delta)
    assert res["epsilon"] == pytest.approx(exp_eps, abs=TOL)
    assert res["delta"] == pytest.approx(exp_delta, abs=TOL)


def test_leveled_ball_on_testdc1(dc1):
    # #8: Ball(center (3500, 0.2), r=1, leveling {1e-3, 10}) over
    # (Salary, FedTaxRate), min_delta 0.7 -> (0.803, 0.8)
    dist = ball_distance(
        ["Salary", "FedTaxRate"], [3500.0, 0.2], 1.0, coeffs=[1e-3, 10.0]
    )
    res = _check(dc1, dist, min_delta=0.7)
    assert res["epsilon"] == pytest.approx(0.803, abs=TOL)
    assert res["delta"] == pytest.approx(0.8, abs=TOL)


@pytest.mark.parametrize(
    "eps1,eps2,expected",
    [
        (0.1, 1.1, ["3", "7"]),
        (1.1, 2.1, ["2", "2", "2", "8"]),
        (2.1, 3.1, ["1", "1", "1", "1", "9"]),
    ],
)
def test_highlights_parallelepiped_test1(spark, eps1, eps2, expected):
    # TestDomainPACHighlight #1: kTest1 col0, Parallelepiped [4, 6] --
    # rows with distance in (eps1, eps2], unordered multiset equality
    df = read_reference_csv(spark, f"{REF}/Test1.csv")
    col = df.columns[0]
    chk = DomainPACCheck(
        df=df, distance=chebyshev_box_distance([col], [4], [6]), exact=True
    )
    got = sorted(r[col] for r in chk.highlights(eps1, eps2).collect())
    assert got == sorted(expected)


@pytest.mark.parametrize(
    "eps1,eps2,expected",
    [
        (0.1, 1.1, ["22", "22"]),
        (1.1, 2.1, ["11", "11", "11", "11"]),
        (2.1, 5.1, ["10"]),
        (5.1, 25.1, ["33", "34", "44"]),
    ],
)
def test_highlights_ball_simple_typos(typos, eps1, eps2, expected):
    # TestDomainPACHighlight #2: SimpleTypos col2, Ball(17, 4)
    chk = DomainPACCheck(
        df=typos, distance=ball_distance(["TwoTypos"], [17.0], 4.0), exact=True
    )
    got = sorted(r["TwoTypos"] for r in chk.highlights(eps1, eps2).collect())
    assert got == sorted(expected)
