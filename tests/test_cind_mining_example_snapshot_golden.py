"""CIND mining walkthrough pinned to the reference's mining_cind_1 example
snapshot (snap_test_examples_pytest.py mining_cind_1_output) over the
cind_test_en/de Wikipedia tables.

Published results pinned verbatim: the 8 relaxed-threshold CINDs with their
per-IND condition counts (19/13/26/59/27/19/43/26), three of de->en pid's
concrete conditions with validity/completeness digits, and the 4 strict
group-mode CINDs (98/59/0/1 conditions) including the cent='18' asymmetry
(fails direction birthplace->deathplace at validity 0.667, passes the
reverse at 1.000)."""

import pytest

from pyspark_validator.cind_discovery import mine_cinds
from pyspark_validator.io import read_reference_csv

IND = "/root/reference/examples/datasets/ind_datasets"


def _tables(spark):
    return {
        name: read_reference_csv(spark, f"{IND}/cind_test_{name}.csv")
        for name in ["en", "de"]
    }


def _counts(cinds):
    return {
        (f"{r.lhs[0]}.{r.lhs[1]}", f"{r.rhs[0]}.{r.rhs[1]}"): r.conditions_number()
        for r in cinds
    }


def test_cind_mining_relaxed_matches_snapshot(spark):
    cinds = mine_cinds(
        _tables(spark), max_error=0.5, min_validity=0.75,
        min_completeness=0.25, condition_type="row",
    )
    assert _counts(cinds) == {
        ("de.pid", "en.pid"): 19,
        ("de.cent", "en.cent"): 13,
        ("en.pid", "de.pid"): 26,
        ("en.cent", "de.cent"): 59,
        ("en.birthplace", "de.deathplace"): 27,
        ("en.birthplace", "en.deathplace"): 19,
        ("en.deathplace", "de.deathplace"): 43,
        ("en.deathplace", "en.birthplace"): 26,
    }

    (de_pid,) = [r for r in cinds if r.lhs == ("de", "pid")]
    assert de_pid.conditional_attributes == [
        "de.cent", "de.birthplace", "de.deathplace", "de.desc"
    ]
    conds = {
        c.values: (round(c.validity, 3), round(c.completeness, 3))
        for c in de_pid.conditions
    }
    # the snapshot's "first few conditions of CIND #1"
    assert conds[("-", "Sud", "-", "-")] == (1.0, 0.429)
    assert conds[("-", "-", "USA", "-")] == (1.0, 0.286)
    assert conds[("18", "-", "-", "-")] == (0.778, 1.0)


def test_cind_mining_strict_group_matches_snapshot(spark):
    cinds = mine_cinds(
        _tables(spark), max_error=0.3, min_validity=0.95,
        min_completeness=0.5, condition_type="group",
    )
    assert _counts(cinds) == {
        ("de.cent", "en.cent"): 98,
        ("en.cent", "de.cent"): 59,
        ("en.birthplace", "en.deathplace"): 0,
        ("en.deathplace", "en.birthplace"): 1,
    }


def test_cind_cent18_direction_asymmetry_matches_snapshot(spark):
    """Scenario 4: unfiltered group-mode conditions expose why cent='18'
    passes only in the deathplace -> birthplace direction."""
    cinds = mine_cinds(
        _tables(spark), max_error=0.3, min_validity=0.0,
        min_completeness=0.0, condition_type="group",
    )
    by_ind = {(r.lhs, r.rhs): r for r in cinds}

    fwd = by_ind[(("en", "birthplace"), ("en", "deathplace"))]
    assert fwd.conditional_attributes == ["en.pid", "en.cent", "en.desc"]
    c18 = {c.values: c for c in fwd.conditions}[("-", "18", "-")]
    assert c18.validity == pytest.approx(2 / 3)
    assert c18.completeness == pytest.approx(2 / 3)

    rev = by_ind[(("en", "deathplace"), ("en", "birthplace"))]
    c18r = {c.values: c for c in rev.conditions}[("-", "18", "-")]
    assert c18r.validity == pytest.approx(1.0)
    assert c18r.completeness == pytest.approx(2 / 3)
