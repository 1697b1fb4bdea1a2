"""DES NAR mining pinned to the reference's own example snapshot
(examples/test_examples/snapshots/snap_test_examples_pytest.py,
mining_nar_output): both seeded runs over examples/datasets/dog_breeds.csv
(159 rows, 14 mixed string/int/double attributes).  The reference repo does
not ship abalone.csv, so until now the DES goldens were RNG test vectors
and property laws (tests/test_nar_discovery.py); this pins the full
algorithm -- encode order over a real mixed-type table, mt19937 trajectory,
rand/1/bin evolution, support/confidence to the last bit -- against
reference-published output."""

import pandas as pd
import pytest

from pyspark_validator.nar_discovery import mine_nars

DOGS = "/root/reference/examples/datasets/dog_breeds.csv"


@pytest.fixture(scope="module")
def dogs(spark):
    pdf = pd.read_csv(DOGS)
    pdf["__row"] = range(len(pdf))
    df = spark.createDataFrame(pdf)
    return df, [c for c in pdf.columns if c != "__row"]


def test_seed_5854_run_matches_snapshot(dogs):
    df, cols = dogs
    rules = mine_nars(
        df, cols, minsup=0.1, minconf=0.7, population_size=500,
        max_fitness_evaluations=700, seed=5854, order_col="__row",
    )
    assert len(rules) == 2
    r = rules[1]
    assert r.ante == {"Type": "Hound"}
    assert r.cons == {
        "Intelligence": (5.0, 8.0),
        "Friendliness": (5.0, 9.0),
    }
    assert r.support == 0.16352201257861634
    assert r.confidence == 0.9629629629629629


def test_seed_10_run_matches_snapshot(dogs):
    df, cols = dogs
    rules = mine_nars(
        df, cols, minsup=0.05, minconf=0.7, population_size=700,
        max_fitness_evaluations=1500, seed=10, order_col="__row",
    )
    got = [
        (r.ante, r.cons, r.support, r.confidence) for r in rules
    ]
    want = [
        (
            {"Intelligence": (4.0, 10.0), "Shedding": "Moderate"},
            {"Friendliness": (6.0, 10.0), "Life Span": (9.0, 16.0)},
            0.5660377358490566,
            0.9574468085106383,
        ),
        (
            {"Health Issues Risk": "Moderate", "Life Span": (8.0, 14.0)},
            {"Friendliness": (5.0, 8.0)},
            0.33962264150943394,
            0.7714285714285715,
        ),
        (
            {
                "Grooming Needs": "Moderate",
                "Intelligence": (5.0, 8.0),
                "Size": (1.0, 2.0),
                "Weight": (15.246273280491677, 68.26182004095448),
            },
            {"Shedding": "Moderate"},
            0.05660377358490566,
            0.9,
        ),
        (
            {
                "Exercise Requirements": (
                    1.708422802608946,
                    2.261993905981413,
                ),
                "Friendliness": (5.0, 10.0),
                "Type": "Working",
            },
            {"Life Span": (10.0, 16.0), "Training Difficulty": (4.0, 9.0)},
            0.08176100628930817,
            0.7222222222222222,
        ),
    ]
    assert got == want
