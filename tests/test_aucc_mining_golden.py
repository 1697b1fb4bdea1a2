"""AUCC mining pinned to the reference's own example snapshot
(examples/test_examples/snapshots/snap_test_examples_pytest.py,
mining_aucc_output): PyroUCC over examples/datasets/ucc_datasets/aucc.csv
and aucc_correct.csv at thresholds 0 / 0.1 / 0.05.  The AUCC error is the
pair-violation share sum c*(c-1) / (n*(n-1)) -- hand-check on the fixture:
Name has one duplicate pair (two Harrys), 2/42 = 0.0476, so [Name] appears
at 0.05 but not at 0; Grade and Work_experience carry 4/42 = 0.0952, inside
0.1 only; Salary carries 8/42 = 0.19, never unary."""

import csv

import pytest

AUCC = "/root/reference/examples/datasets/ucc_datasets/aucc.csv"
AUCC_CORRECT = "/root/reference/examples/datasets/ucc_datasets/aucc_correct.csv"

#: (csv, error, snapshot result) -- mining_aucc_output verbatim
GOLDEN = [
    (
        AUCC,
        0.0,
        [
            ("Grade", "Salary"),
            ("Grade", "Work_experience"),
            ("Name", "Grade"),
            ("Name", "Work_experience"),
            ("Salary", "Work_experience"),
        ],
    ),
    (
        AUCC,
        0.1,
        [("Grade",), ("Name",), ("Work_experience",)],
    ),
    (
        AUCC,
        0.05,
        [
            ("Grade", "Salary"),
            ("Grade", "Work_experience"),
            ("Name",),
            ("Salary", "Work_experience"),
        ],
    ),
    (
        AUCC_CORRECT,
        0.0,
        [
            ("Grade", "Salary"),
            ("Grade", "Work_experience"),
            ("Name",),
            ("Salary", "Work_experience"),
        ],
    ),
]


def _load(spark, path):
    rows = list(csv.reader(open(path)))
    return spark.createDataFrame([tuple(r) for r in rows[1:]], rows[0])


@pytest.mark.parametrize("path,error,want", GOLDEN)
def test_aucc_mining_matches_example_snapshot(spark, path, error, want):
    from pyspark_validator.discovery import mine_uccs

    df = _load(spark, path)
    got = mine_uccs(df, df.columns, max_arity=2, max_error=error)
    assert got == sorted(want)


def test_pyro_ucc_facade_error_surface(spark):
    from pyspark_validator import compat

    p = compat.PyroUCC(spark)
    p.load_data(_load(spark, AUCC).toPandas())
    p.execute(error=0.05)
    # index short strings (bind_ucc.cpp): Name=0 Grade=1 Salary=2 WE=3
    names = {str(u) for u in p.get_uccs()}
    assert names == {"[0]", "[1 2]", "[1 3]", "[2 3]"}
    p.execute(error=0.0)
    assert "[0]" not in {str(u) for u in p.get_uccs()}
