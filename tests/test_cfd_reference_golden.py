"""CFD golden tests pinned to the reference's cases
(src/tests/unit/test_cfd_verifier.cpp:41-75 on cfd_data/tennis.csv)."""

import pytest

from pyspark_validator.checks.cfd import cfd_check

# test_input_data/cfd_data/tennis.csv
TENNIS = [
    ("sunny", "hot", "high", "false", "no"),
    ("sunny", "hot", "high", "true", "no"),
    ("overcast", "hot", "high", "false", "yes"),
    ("rainy", "mild", "high", "false", "yes"),
    ("rainy", "cool", "normal", "false", "yes"),
    ("rainy", "cool", "normal", "true", "no"),
    ("overcast", "cool", "normal", "true", "yes"),
    ("sunny", "mild", "high", "false", "no"),
    ("sunny", "cool", "normal", "false", "yes"),
    ("rainy", "mild", "normal", "false", "yes"),
    ("sunny", "mild", "normal", "true", "yes"),
    ("overcast", "mild", "high", "true", "yes"),
    ("overcast", "hot", "normal", "false", "yes"),
    ("rainy", "mild", "high", "true", "no"),
]
COLS = ["outlook", "temp", "humidity", "windy", "play"]


@pytest.fixture(scope="module")
def tennis(spark):
    return spark.createDataFrame(TENNIS, COLS)


# (lhs, rhs, minconf, minsup, expect_holds) -- test_cfd_verifier.cpp:44-75
GOLDEN = [
    ([("outlook", "overcast")], ("play", "yes"), 1.0, 0, True),
    (
        [("temp", None), ("outlook", None), ("play", "yes")],
        ("windy", None),
        1.0,
        0,
        True,
    ),
    ([("temp", "mild")], ("play", "yes"), 1.0, 0, False),
    ([("outlook", "rainy")], ("play", "yes"), 1.0, 0, False),
    ([("temp", "cool")], ("play", "yes"), 1.0, 0, False),
    ([("humidity", "normal")], ("play", "yes"), 0.8, 0, True),
    ([("humidity", "normal")], ("play", "yes"), 1.0, 0, False),
    ([], ("play", "yes"), 1.0, 0, False),  # empty LHS boundary case
]


@pytest.mark.parametrize("lhs,rhs,minconf,minsup,expected", GOLDEN)
def test_cfd_tennis_golden(tennis, lhs, rhs, minconf, minsup, expected):
    s = (
        cfd_check(tennis, lhs, rhs, minsup=minsup, minconf=minconf)
        .summary()
        .collect()[0]
    )
    assert s.holds == expected


def test_cfd_tennis_values(tennis):
    # quantitative spot-check: humidity=normal -> play=yes has 7 supported rows,
    # 6 satisfy -> confidence 6/7 (~0.857, >= 0.8 but < 1.0)
    s = (
        cfd_check(tennis, [("humidity", "normal")], ("play", "yes"), minconf=0.8)
        .summary()
        .collect()[0]
    )
    assert s.support == 7
    assert float(s.confidence) == pytest.approx(6 / 7)
    assert s.n_violating_rows == 1
