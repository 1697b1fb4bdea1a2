"""Remaining verification walkthroughs pinned to the reference's example
snapshots (examples/test_examples/snapshots/snap_test_examples_pytest.py:
verifying_cfd / verifying_cind / verifying_dc / verifying_aod /
verifying_domain_pac1..4 / verifying_domain_pac_custom_domain outputs).

Every asserted digit is published in the snapshot file: the city.csv CFD
support 5 / confidence 0.80 and its single (LA, Apartment) cluster; the
en->de CIND validity/completeness sequence 0.5|1.0 -> 0.5|0.5 -> 1.0|0.5 ->
0.667|1.0 -> 0.0|0.0 -> 1.0|0.333; the taxes_1/taxes_2 DC verdicts with
violation pairs (8,11),(9,11),(10,11); the employee-grade AOD removal sets
and 1/9 errors; and the engine-temperature PAC series (eps 7 @ 0.954545,
find_delta(5)=0.681818, the 2-d leveled parallelepiped and ball results,
the Levenshtein ball, and the cosine custom domain 0.37695@0.9 /
0.0141436@0.7)."""

import pandas as pd
import pytest

from pyspark_validator.checks.cind import cind_check
from pyspark_validator.checks.dc import dc_check
from pyspark_validator.checks.od import aod_check
from pyspark_validator.checks.pac import (
    ball_distance,
    chebyshev_box_distance,
    domain_pac_check,
    interval_distance,
)

DATASETS = "/root/reference/examples/datasets"


# ----------------------------------------------------------- verifying_cfd --


def test_cfd_city_matches_snapshot(spark):
    from pyspark_validator.compat import CfdVerifier

    table = pd.read_csv(f"{DATASETS}/cfd_verification_datasets/city.csv")
    v = CfdVerifier(spark)
    v.load_data(table)
    lhs = [("City", "Los Angeles"), ("BuildingType", None)]  # None = '_'
    v.execute(lhs, ("BuildingCost", "high"), minconf=1.0)
    assert v.cfd_holds() is False
    assert v.get_real_support() == 5
    assert v.get_real_confidence() == pytest.approx(0.80)
    assert v.get_num_clusters_violating_cfd() == 1

    # published fix: all LA non-high rows set to high -> holds at conf 1.00
    fixed = table.copy()
    fixed.loc[
        (fixed["City"] == "Los Angeles") & (fixed["BuildingCost"] != "high"),
        "BuildingCost",
    ] = "high"
    v2 = CfdVerifier(spark)
    v2.load_data(fixed)
    v2.execute(lhs, ("BuildingCost", "high"), minconf=1.0)
    assert v2.cfd_holds() is True
    assert v2.get_real_support() == 5
    assert v2.get_real_confidence() == pytest.approx(1.0)
    assert v2.get_num_clusters_violating_cfd() == 0


# ---------------------------------------------------------- verifying_cind --


def test_cind_en_de_scenarios_match_snapshot(spark):
    from pyspark_validator.compat import CindVerifier

    en = pd.read_csv(f"{DATASETS}/ind_datasets/cind_test_en.csv")
    de = pd.read_csv(f"{DATASETS}/ind_datasets/cind_test_de.csv")

    def run(lhs, rhs, cond_vals=None):
        v = CindVerifier(spark)
        v.load_data(lhs, rhs)
        v.execute([0], [0], condition_values=cond_vals,
                  min_validity=1.0, min_completeness=0.0)
        return v

    # Scenario 1: empty condition == plain IND
    v = run(en, de)
    assert v.holds() is False
    assert v.get_real_validity() == pytest.approx(0.5)
    assert v.get_real_completeness() == pytest.approx(1.0)
    assert v.get_violating_clusters_count() == 2
    assert sorted(c[0] for c in v.get_violating_clusters()) == [
        "Buddy Roosevelt",
        "Sante Gaiardoni",
    ]

    # Scenario 2: duplicate Buddy row; only the new row matches desc='Actor'
    en_dup = pd.concat(
        [en, pd.DataFrame([{
            "pid": "Buddy Roosevelt", "cent": 18, "birthplace": "NY",
            "deathplace": "NY", "desc": "Actor",
        }])],
        ignore_index=True,
    )
    v = run(en_dup, de, ["_", "_", "_", "Actor"])
    assert v.get_real_validity() == pytest.approx(0.5)
    assert v.get_real_completeness() == pytest.approx(0.5)
    assert v.get_violating_clusters_count() == 1
    ((pid, occurrences, basket_rows),) = v.get_violating_clusters()
    assert pid == "Buddy Roosevelt"
    assert occurrences == 1 and basket_rows == 2  # matching vs basket rows

    # Scenario 3: desc='Actor' on the original table holds exactly
    v = run(en, de, ["_", "_", "_", "Actor"])
    assert v.holds() is True
    assert v.get_real_validity() == pytest.approx(1.0)
    assert v.get_real_completeness() == pytest.approx(0.5)

    # Scenario 4: cent=18 -> validity 2/3; desc='Olympic' -> 0/0; after the
    # de fix the CIND holds with completeness 1/3
    v = run(en, de, ["18", "_", "_", "_"])
    assert v.get_real_validity() == pytest.approx(2 / 3)
    assert v.get_real_completeness() == pytest.approx(1.0)
    assert v.get_violating_clusters_count() == 1
    assert v.get_violating_clusters()[0][0] == "Buddy Roosevelt"

    v = run(en, de, ["_", "_", "_", "Olympic"])
    assert v.get_real_validity() == pytest.approx(0.0)
    assert v.get_real_completeness() == pytest.approx(0.0)

    de_fixed = pd.concat(
        [de, pd.DataFrame([{
            "pid": "Sante Gaiardoni", "cent": 19, "birthplace": "-",
            "deathplace": "-", "desc": "Olympionike",
        }])],
        ignore_index=True,
    )
    v = run(en, de_fixed, ["_", "_", "_", "Olympic"])
    assert v.holds() is True
    assert v.get_real_validity() == pytest.approx(1.0)
    assert v.get_real_completeness() == pytest.approx(1 / 3)

    # Scenario 5: wrong condition_values length raises the reference message
    v = CindVerifier(spark)
    v.load_data(en, de)
    with pytest.raises(ValueError, match="conditional attributes"):
        v.execute([0], [0], condition_values=["18", "_"])


# ------------------------------------------------------------ verifying_dc --


DC_PREDS = [
    ("s.State", "==", "t.State"),
    ("s.Salary", "<", "t.Salary"),
    ("s.FedTaxRate", ">", "t.FedTaxRate"),
]


def _dc(spark, name):
    pdf = pd.read_csv(f"{DATASETS}/{name}.csv")
    pdf["__row"] = range(len(pdf))
    return dc_check(spark.createDataFrame(pdf), DC_PREDS, row_ref="__row")


def test_dc_taxes_1_and_2_match_snapshot(spark):
    assert bool(_dc(spark, "taxes_1").summary().collect()[0]["holds"]) is True

    chk = _dc(spark, "taxes_2")
    assert bool(chk.summary().collect()[0]["holds"]) is False
    # published pairs (8,11),(9,11),(10,11) use 1-based ids incl. the header
    got = {
        tuple(sorted((r["rid_s"] + 2, r["rid_t"] + 2)))
        for r in chk.highlights().collect()
    }
    assert got == {(8, 11), (9, 11), (10, 11)}


# ----------------------------------------------------------- verifying_aod --


AOD_ROWS = [
    (0, 2020, 24, 1000), (1, 2020, 40, 7000), (2, 2020, 32, 5000),
    (3, 2020, 29, 3000), (4, 2020, 49, 10000), (5, 2021, 50, 15000),
    (6, 2021, 25, 1500), (7, 2021, 30, 6000),
]
AOD_COLS = ["rid", "year", "employee_grade", "avg_salary"]


def test_aod_salary_walkthrough_matches_snapshot(spark):
    df = spark.createDataFrame(AOD_ROWS, AOD_COLS)

    # exact legs: OC {year}: employee_grade<= ~ avg_salary and
    # OFD {employee_grade}: [] -> year both hold with empty removal sets
    s = aod_check(df, ["year"], oc=("employee_grade", "avg_salary")).summary()
    r = s.collect()[0]
    assert bool(r["holds"]) and r["error"] == pytest.approx(0.0)
    s = aod_check(df, ["employee_grade"], ofd_right="year").summary()
    r = s.collect()[0]
    assert bool(r["holds"]) and r["error"] == pytest.approx(0.0)

    # add row 8 = (2020, 50, 9000): both break with error 1/9; the minimal
    # removal sets are {4}/{8} (OC) and {5}/{8} (OFD) -- interchangeable per
    # the published note ("rows 8 and 4 are interchangeable")
    df9 = spark.createDataFrame(AOD_ROWS + [(8, 2020, 50, 9000)], AOD_COLS)

    chk = aod_check(df9, ["year"], oc=("employee_grade", "avg_salary"))
    r = chk.summary().collect()[0]
    assert not bool(r["holds"])
    assert r["error"] == pytest.approx(1 / 9)
    removed = {x["row_ref"] for x in chk.removal_rows("rid").collect()}
    assert removed in ({4}, {8})

    chk = aod_check(df9, ["employee_grade"], ofd_right="year")
    r = chk.summary().collect()[0]
    assert not bool(r["holds"])
    assert r["error"] == pytest.approx(1 / 9)
    removed = {x["row_ref"] for x in chk.removal_rows("rid").collect()}
    assert removed in ({5}, {8})


# ----------------------------------------------------- verifying_domain_pac --


def _pac_df(spark, name):
    return spark.createDataFrame(
        pd.read_csv(f"{DATASETS}/verifying_pac/{name}.csv")
    )


def test_pac1_engine_temps_match_snapshot(spark):
    from pyspark.sql import functions as F

    bad = _pac_df(spark, "engine_temps_bad")
    chk = domain_pac_check(bad, interval_distance(F.col("t"), 85, 95), exact=True)

    # default run: eps 7, delta 21/22 = 0.954545
    res = chk.refine()
    assert res["epsilon"] == pytest.approx(7.0)
    assert res["delta"] == pytest.approx(21 / 22, abs=1e-6)

    # find_delta(eps=5) -> 0.681818
    r = chk.delta_for_epsilon(5.0).collect()[0]
    assert r["delta"] == pytest.approx(15 / 22, abs=1e-6)

    # the published outlier table ((eps_1, eps_2] bands over t)
    def band(e1, e2):
        return sorted(
            r["t"] for r in chk.highlights(eps_1=e1, eps_2=e2).collect()
        )

    assert band(0, 1) == [84, 96]
    assert band(1, 2) == []
    assert band(2, 3) == []
    assert band(3, 5) == [80]
    assert band(5, 7) == [78, 78, 78, 79, 79, 79]
    assert band(7, float("inf")) == [104]

    # the improved engine: PAC (5, 0.954545) holds
    good = _pac_df(spark, "engine_temps_good")
    chk2 = domain_pac_check(good, interval_distance(F.col("t"), 85, 95), exact=True)
    r = chk2.delta_for_epsilon(5.0).collect()[0]
    assert r["delta"] == pytest.approx(21 / 22, abs=1e-6)
    assert r["delta"] >= 0.9


def test_pac2_leveling_coefficients_match_snapshot(spark):
    bad = _pac_df(spark, "engine_temps_bad")

    # unleveled 2-d parallelepiped: RPM dominates -> (1, 0.5)
    chk = domain_pac_check(
        bad,
        chebyshev_box_distance(["t", "rpm"], [85, 1500], [95, 3500]),
        exact=True,
    )
    res = chk.refine(max_epsilon=10)
    assert res["epsilon"] == pytest.approx(1.0)
    assert res["delta"] == pytest.approx(0.5)
    out = {(r["t"], r["rpm"]) for r in chk.highlights(0.0, 1.0).collect()}
    assert out == {(96, 1800), (84, 2000)}

    # leveling_coefficients=[1, 0.01]: back to the pac1 shape (7, 21/22)
    chk = domain_pac_check(
        bad,
        chebyshev_box_distance(
            ["t", "rpm"], [85, 1500], [95, 3500], coeffs=[1, 0.01]
        ),
        exact=True,
    )
    res = chk.refine(max_epsilon=10, min_delta=0.9)
    assert res["epsilon"] == pytest.approx(7.0)
    assert res["delta"] == pytest.approx(21 / 22, abs=1e-6)
    out = {(r["t"], r["rpm"]) for r in chk.highlights(0.0, 5.0).collect()}
    assert out == {
        (96, 1800), (84, 2000), (89, 1400), (90, 1000), (80, 3000), (95, 4000),
    }


def test_pac3_ball_domain_matches_snapshot(spark):
    bad = _pac_df(spark, "engine_temps_bad")
    chk = domain_pac_check(
        bad,
        ball_distance(["t", "rpm"], [90, 2500], 5, coeffs=[1, 0.005]),
        exact=True,
    )
    res = chk.refine()
    assert res["epsilon"] == pytest.approx(7.29837, abs=1e-4)
    assert res["delta"] == pytest.approx(20 / 22, abs=1e-6)
    out = {(r["t"], r["rpm"]) for r in chk.highlights(7.3, float("inf")).collect()}
    assert out == {(79, 900), (104, 3500)}


def test_pac4_levenshtein_ball_matches_snapshot(spark):
    from pyspark.sql import functions as F

    df = _pac_df(spark, "levenshtein_typos")
    chk = domain_pac_check(
        df, F.levenshtein(F.col("Query"), F.lit("Desbordante")).cast("double"),
        exact=True,
    )
    r = chk.delta_for_epsilon(3.0).collect()[0]
    assert r["delta"] == pytest.approx(0.9)


def test_pac_custom_domain_matches_snapshot(spark):
    from pyspark.sql import functions as F

    df = _pac_df(spark, "user_preferences")
    cols = [F.col(c).cast("double") for c in df.columns]
    ideal = [0.9, 0.4, 0.05]
    dot = sum((c * F.lit(v) for c, v in zip(cols, ideal)), F.lit(0.0))
    xlen = F.sqrt(sum((c * c for c in cols), F.lit(0.0)))
    ylen = float(sum(v * v for v in ideal)) ** 0.5
    cosine = F.lit(1.0) - dot / (xlen * F.lit(ylen))
    chk = domain_pac_check(df, cosine, exact=True)

    res = chk.refine()
    assert res["epsilon"] == pytest.approx(0.37695, abs=1e-4)
    assert res["delta"] == pytest.approx(0.9, abs=1e-9)

    res = chk.refine(min_delta=0.6)
    assert res["epsilon"] == pytest.approx(0.0141436, abs=1e-6)
    assert res["delta"] == pytest.approx(0.7, abs=1e-9)
