"""AFD measure goldens vs the reference's TANE validation suite.

Every value is lifted verbatim from
/root/reference/src/tests/unit/test_tane_afd_measures.cpp
(AfdMeasuresTaneValidationSuite + PdepSelfTaneValidationSuite) over the
shipped TestFD.csv / WDC_satellites.csv -- the kIris / kNeighbors10k rows
need unshipped fixtures. The frame loads with the reference CSV
conventions (NULL literal null, '' a value, mixed columns compared as
strings, null == null in grouping)."""

import pytest

from pyspark_validator.checks.fd import afd_measures
from pyspark_validator.io import read_reference_csv

REF = "/root/reference/test_input_data"

PDEP = {
    (0, 1): 0.25, (0, 2): 0.13888888888888887, (0, 3): 0.3749999999999999,
    (0, 4): 0.20833333333333331, (0, 5): 0.12499999999999997,
    (1, 0): 1.0, (1, 2): 0.5555555555555555, (1, 3): 0.7777777777777778,
    (1, 4): 0.7777777777777778, (1, 5): 0.4999999999999999,
    (2, 0): 1.0, (2, 1): 1.0, (2, 3): 0.9166666666666666,
    (2, 4): 0.9166666666666666, (2, 5): 0.9166666666666666,
    (3, 0): 1.0, (3, 1): 0.5833333333333333, (3, 2): 0.4305555555555556,
    (3, 4): 0.5833333333333333, (3, 5): 0.4305555555555556,
    (4, 0): 1.0, (4, 1): 0.9166666666666666, (4, 2): 0.6111111111111109,
    (4, 3): 0.9166666666666666, (4, 5): 0.6111111111111109,
    (5, 0): 1.0, (5, 1): 1.0, (5, 2): 1.0, (5, 3): 1.0, (5, 4): 1.0,
}

TAU = {
    (0, 1): 0.0, (0, 2): 0.0, (0, 3): 0.0, (0, 4): 0.0, (0, 5): 0.0,
    (1, 0): 1.0, (1, 2): 0.48387096774193533, (1, 3): 0.6444444444444446,
    (1, 4): 0.7192982456140351, (1, 5): 0.42857142857142844,
    (2, 0): 1.0, (2, 1): 1.0, (2, 3): 0.8666666666666668,
    (2, 4): 0.894736842105263, (2, 5): 0.9047619047619048,
    (3, 0): 1.0, (3, 1): 0.44444444444444436, (3, 2): 0.3387096774193548,
    (3, 4): 0.47368421052631565, (3, 5): 0.34920634920634924,
    (4, 0): 1.0, (4, 1): 0.8888888888888888, (4, 2): 0.5483870967741933,
    (4, 3): 0.8666666666666668, (4, 5): 0.5555555555555554,
    (5, 0): 1.0, (5, 1): 1.0, (5, 2): 1.0, (5, 3): 1.0, (5, 4): 1.0,
}

MU_PLUS = {
    (0, 1): 0.0, (0, 2): 0.0, (0, 3): 0.0, (0, 4): 0.0, (0, 5): 0.0,
    (1, 0): 1.0, (1, 2): 0.29032258064516114, (1, 3): 0.5111111111111112,
    (1, 4): 0.6140350877192983, (1, 5): 0.2142857142857142,
    (2, 0): 1.0, (2, 1): 1.0, (2, 3): 0.6333333333333332,
    (2, 4): 0.7105263157894736, (2, 5): 0.7380952380952379,
    (3, 0): 1.0, (3, 1): 0.23611111111111094, (3, 2): 0.09072580645161299,
    (3, 4): 0.27631578947368407, (3, 5): 0.10515873015873012,
    (4, 0): 1.0, (4, 1): 0.8253968253968254, (4, 2): 0.29032258064516103,
    (4, 3): 0.7904761904761903, (4, 5): 0.3015873015873013,
    (5, 0): 1.0, (5, 1): 1.0, (5, 2): 1.0, (5, 3): 1.0, (5, 4): 1.0,
}

RHO = {
    (0, 1): 0.25, (0, 2): 0.125, (0, 3): 0.25, (0, 4): 0.2,
    (0, 5): 0.1111111111111111,
    (1, 0): 1.0, (1, 2): 0.5, (1, 3): 0.6666666666666666,
    (1, 4): 0.6666666666666666, (1, 5): 0.4444444444444444,
    (2, 0): 1.0, (2, 1): 1.0, (2, 3): 0.8888888888888888,
    (2, 4): 0.8888888888888888, (2, 5): 0.8888888888888888,
    (3, 0): 1.0, (3, 1): 0.6666666666666666, (3, 2): 0.4444444444444444,
    (3, 4): 0.6666666666666666, (3, 5): 0.4444444444444444,
    (4, 0): 1.0, (4, 1): 0.8333333333333334, (4, 2): 0.5555555555555556,
    (4, 3): 0.8333333333333334, (4, 5): 0.5555555555555556,
    (5, 0): 1.0, (5, 1): 1.0, (5, 2): 1.0, (5, 3): 1.0, (5, 4): 1.0,
}

#: PdepSelfTaneValidationSuite: pdep(Y) per column (the unconditional
#: self-pdep; the reference's own eps there is 1e-3,
#: test_tane_afd_measures.cpp:61)
PDEP_SELF_TESTFD = {0: 1.0, 1: 0.25, 2: 0.138, 3: 0.375, 4: 0.208, 5: 0.125}
PDEP_SELF_SATELLITES = {
    0: 0.0396, 1: 0.00578, 2: 0.037, 3: 0.006,
    4: 0.069, 5: 0.0466, 6: 0.0757, 7: 0.309,
}


@pytest.fixture(scope="module")
def testfd(spark):
    df = read_reference_csv(spark, f"{REF}/TestFD.csv")
    rows = {}
    cols = df.columns
    for li in range(len(cols)):
        for ri in range(len(cols)):
            if li == ri:
                continue
            rows[(li, ri)] = (
                afd_measures(df, [cols[li]], [cols[ri]]).collect()[0].asDict()
            )
    return rows


@pytest.mark.parametrize(
    "field,table,tol",
    [
        ("pdep", PDEP, 1e-10),
        ("tau", TAU, 1e-10),
        ("mu_plus", MU_PLUS, 1e-10),
        ("rho", RHO, 1e-10),
    ],
)
def test_afd_measures_testfd(testfd, field, table, tol):
    for pair, expected in table.items():
        got = testfd[pair][field]
        assert got == pytest.approx(expected, abs=tol), (field, pair)


def test_pdep_self(spark):
    # pdep(Y) = sum cy^2 / n^2 -- read off any measure row's internals via
    # the tau identity: pdep_y = (pdep_xy - tau*1)/(1 - tau) is unstable, so
    # compute directly from value counts (one grouped agg per column)
    from pyspark.sql import functions as F

    for name, table in (
        ("TestFD", PDEP_SELF_TESTFD),
        ("WDC_satellites", PDEP_SELF_SATELLITES),
    ):
        df = read_reference_csv(spark, f"{REF}/{name}.csv")
        n = df.count()
        for idx, expected in table.items():
            c = df.columns[idx]
            row = (
                df.groupBy(c)
                .agg(F.count(F.lit(1)).alias("cy"))
                .agg((F.sum(F.col("cy") * F.col("cy")) / (n * n)).alias("p"))
                .collect()[0]
            )
            assert row["p"] == pytest.approx(expected, abs=1e-3), (name, idx)
