"""PFD golden tests pinned to the reference's cases
(src/tests/unit/test_pfd_verifier.cpp:55-73 on TestFD.csv). The CSV's literal
"NULL" and empty-string cells are kept as distinct string values; each occurs
once per checked column so the equal-nulls knob cannot change these verdicts."""

import pytest

from pyspark_validator.checks.fd import fd_check

# test_input_data/TestFD.csv (string-typed, as the reference ingests it)
FD_ROWS = [
    ("1", "1", "1", "1.233", "-", "1"),
    ("1", "1", "1", "0", "8", "2"),
    ("1", "1", "2.1", "0", "8", "3"),
    ("1", "2", "2", "hjkl", "444", "4"),
    ("1", "2", "2", "hjkl", "444", "4"),
    ("1", "2", "", "hjkl", "444", "5"),
    ("1", "3", "3", "0", "9", "6"),
    ("1", "3", "3", "0", "9", "6"),
    ("1", "3", "NULL", "999", "-", "7"),
    ("1", "4", "4", "hjkl", "555", "8"),
    ("1", "4", "4", "hjkl", "555", "8"),
    ("1", "4", "abc", "hjkl", "555", "9"),
]
COLS = [f"c{i}" for i in range(6)]


@pytest.fixture(scope="module")
def fd_df(spark):
    return spark.createDataFrame(FD_ROWS, COLS)


# (lhs, rhs, measure, error, n_violating_clusters, n_violating_rows)
GOLDEN = [
    (["c2"], ["c3"], "per_value", 0.0625, 1, 1),
    (["c0", "c1"], ["c4"], "per_value", 0.166667, 2, 2),
    (["c4"], ["c5"], "per_value", 0.3334, 4, 4),
    (["c5"], ["c1"], "per_value", 0.0, 0, 0),
    (["c2"], ["c3"], "per_tuple", 0.0834, 1, 1),
    (["c0", "c1"], ["c4"], "per_tuple", 0.1667, 2, 2),
    (["c4"], ["c5"], "per_tuple", 0.3334, 4, 4),
    (["c5"], ["c1"], "per_tuple", 0.0, 0, 0),
]


@pytest.mark.parametrize("lhs,rhs,measure,err,n_cl,n_rows", GOLDEN)
def test_pfd_reference_golden(fd_df, lhs, rhs, measure, err, n_cl, n_rows):
    s = fd_check(fd_df, lhs, rhs, num_partitions=4).pfd(measure).collect()[0]
    assert float(s.error) == pytest.approx(err, abs=5e-4)
    assert s.n_violating_clusters == n_cl
    assert s.n_violating_rows == n_rows


def test_afd_metric_calculator_reference_golden(fd_df):
    """AFD metric goldens (test_afd_metric_calculator.cpp on TestFD.csv):
    tau / g2 / FI / mu+ for {4}->{3} and {3}->{4}."""
    import math

    m1 = fd_check(fd_df, ["c4"], ["c3"], num_partitions=4).afd_measures().collect()[0]
    assert float(m1.tau) == pytest.approx(78 / 90)
    assert float(m1.g2) == pytest.approx(1 / 6)
    assert float(m1.fi) == pytest.approx(1 - math.log(4) / math.log(746496))
    assert float(m1.mu_plus) == pytest.approx(498 / 630)

    m2 = fd_check(fd_df, ["c3"], ["c4"], num_partitions=4).afd_measures().collect()[0]
    assert float(m2.tau) == pytest.approx(54 / 114)
    assert float(m2.g2) == pytest.approx(5 / 6)
    assert float(m2.fi) == pytest.approx(math.log(432) / math.log(13824))
    assert float(m2.mu_plus) == pytest.approx(252 / 912)
