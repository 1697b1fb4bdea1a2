"""CIND discovery goldens vs the reference's own unit suite.

Every expected value is lifted verbatim from
/root/reference/src/tests/unit/test_cind_algorithms.cpp over its shipped
fixtures test_input_data/cind/cind_test_{de,en}.csv: the TestCINDNumber
AIND counts per error threshold and all TestCINDConditions front-CIND
condition counts (both CondType::kRow and kGroup; the Cinderella and
PliCind rows assert the same values -- the two strategies compute the same
set, which is why ``algo`` is accepted as an alias here).
"""

import pytest

from pyspark_validator.cind_discovery import mine_cinds
from pyspark_validator.io import read_reference_csv

REF = "/root/reference/test_input_data/cind"


@pytest.fixture(scope="module")
def tables(spark):
    # CSVConfigs order {kTestCINDDe, kTestCINDEn} -- de is table 0
    return {
        "de": read_reference_csv(spark, f"{REF}/cind_test_de.csv"),
        "en": read_reference_csv(spark, f"{REF}/cind_test_en.csv"),
    }


@pytest.mark.parametrize(
    "max_error,expected",
    [(0.0, 3), (0.3, 4), (0.4, 5), (0.5, 8)],
)
def test_cind_number(tables, max_error, expected):
    # TestCINDNumber: one CIND per AIND at the Spider error threshold
    assert len(mine_cinds(tables, max_error=max_error)) == expected


@pytest.mark.parametrize("algo", ["cinderella", "pli_cind"])
@pytest.mark.parametrize(
    "cond_type,validity,completeness,expected",
    [
        ("row", 0.0, 0.01, 61),
        ("row", 0.0, 0.15, 23),
        ("row", 0.0, 0.56, 3),
        ("row", 1.0, 0.01, 56),
        ("row", 1.0, 0.15, 18),
        ("row", 1.0, 0.56, 2),
        ("group", 0.1, 0.4, 61),
        ("group", 0.1, 0.6, 1),
        ("group", 0.75, 0.4, 56),
        ("group", 0.75, 0.6, 0),
    ],
)
def test_cind_conditions(tables, algo, cond_type, validity, completeness, expected):
    # TestCINDConditions: conditions of the FIRST CIND in Spider's result
    # order (dep attr id asc, ref id asc) at error=0.5 -- de.pid -> en.pid
    res = mine_cinds(
        tables,
        max_error=0.5,
        min_validity=validity,
        min_completeness=completeness,
        condition_type=cond_type,
        algo=algo,
    )
    front = res[0]
    assert (front.lhs, front.rhs) == (("de", "pid"), ("en", "pid"))
    assert front.conditions_number() == expected
    for cond in front.conditions:
        assert cond.validity >= validity
        assert cond.completeness >= completeness


def test_condition_values_shape(tables):
    # conditions are per-conditional-attribute value vectors with '-' for
    # unconstrained positions (condition.h kAnyValue), and the high-validity
    # singleton at 0.56 completeness is the Kellaway/18 family
    res = mine_cinds(
        tables,
        max_error=0.5,
        min_validity=1.0,
        min_completeness=0.56,
        condition_type="row",
    )
    front = res[0]
    assert front.conditional_attributes == [
        "de.cent",
        "de.birthplace",
        "de.deathplace",
        "de.desc",
    ]
    vals = {c.values for c in front.conditions}
    # the only validity-1 conditions covering >56% of Kellaway+Sheppard rows
    # are the Schauspieler family (6/7 of the included de rows)
    assert vals == {
        ("-", "-", "-", "Schauspieler"),
        ("18", "-", "-", "Schauspieler"),
    }
    for c in front.conditions:
        assert c.validity == pytest.approx(1.0)
        assert c.completeness == pytest.approx(6 / 7)
