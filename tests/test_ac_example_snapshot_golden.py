"""Seeded BHUNT AC mining pinned to the reference's own example snapshot
(examples/test_examples/snapshots/snap_test_examples_pytest.py,
mining_ac_output): ac_seed=11, iterations_limit=4, fuzziness=0.2,
p_fuzz=0.85 over player_stats.csv (+) and cargo_march.csv (-) at weights
0.1 and 0.05.  ac_reference_ranges replays the reference's per-iteration
mt19937 Bernoulli row sample and k_bumps growth loop exactly
(ac_algorithm.cpp:96-196), so the discovered intervals -- and the three
cargo parcels outside them -- match reference-published output; the
default ACCheck value-hash sampling remains the scale path and is golden
against test_ac_algorithm.cpp in tests/test_ac_nar.py."""

import pandas as pd
import pytest

from pyspark_validator.checks.ac import ac_check, ac_reference_ranges

DATASETS = "/root/reference/examples/datasets"
KW = dict(fuzziness=0.2, p_fuzz=0.85, iterations_limit=4, ac_seed=11)


@pytest.fixture(scope="module")
def cargo(spark):
    return spark.createDataFrame(pd.read_csv(f"{DATASETS}/cargo_march.csv"))


def test_player_stats_sum_ranges(spark):
    df = spark.createDataFrame(pd.read_csv(f"{DATASETS}/player_stats.csv"))
    got = ac_reference_ranges(
        df, "Strength", "Agility", binop="+", weight=0.1, **KW
    )
    assert got == [(4.0, 5.0), (22.0, 24.0)]


def test_cargo_difference_ranges_and_exceptions(cargo):
    got = ac_reference_ranges(
        cargo, "Delivery date", "Dispatch date", binop="-", weight=0.1, **KW
    )
    assert got == [(2.0, 7.0), (15.0, 22.0)]
    ex = (
        ac_check(cargo, "Delivery date", "Dispatch date", binop="-")
        .exceptions(["id"], ranges=got)
        .orderBy("id")
        .collect()
    )
    assert [(r["id"], r["res"]) for r in ex] == [
        (7, 29.0),
        (26, 11.0),
        (30, 11.0),
    ]


def test_cargo_reduced_weight_covers_everything(cargo):
    got = ac_reference_ranges(
        cargo, "Delivery date", "Dispatch date", binop="-", weight=0.05, **KW
    )
    assert got == [(2.0, 7.0), (11.0, 11.0), (15.0, 22.0), (29.0, 29.0)]
    ex = ac_check(
        cargo, "Delivery date", "Dispatch date", binop="-"
    ).exceptions(["id"], ranges=got)
    assert ex.count() == 0
