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


# --- comparison_ucc_and_aucc_1/2 snapshots ---------------------------------
# (examples/test_examples/snapshots: UCC/AUCC mining over the ucc_aucc_*
# fixtures, incl. arity-3 AUCCs and empty-cell NULL grouping)

UCC_AUCC_1 = "/root/reference/examples/datasets/ucc_datasets/ucc_aucc_1.csv"
UCC_AUCC_1C = "/root/reference/examples/datasets/ucc_datasets/ucc_aucc_1_correct.csv"
UCC_AUCC_2 = "/root/reference/examples/datasets/ucc_datasets/ucc_aucc_2.csv"
UCC_AUCC_2C = "/root/reference/examples/datasets/ucc_datasets/ucc_aucc_2_correct.csv"


def test_comparison_1_snapshot(spark):
    from pyspark_validator.checks.ucc import ucc_check
    from pyspark_validator.discovery import mine_uccs

    df = _load(spark, UCC_AUCC_1)
    assert mine_uccs(df, max_arity=4) == [
        ("Grade",), ("Salary",), ("Work_experience",)
    ]
    # "AUCC holds with threshold = 0.048": the Name pair-violation share is
    # 2/42 (the two Harrys)
    row = ucc_check(df, ["Name"]).summary().collect()[0]
    assert not row["holds"]
    assert abs(row["aucc_error"] - 2 / 42) < 1e-12
    fixed = _load(spark, UCC_AUCC_1C)
    assert mine_uccs(fixed, max_arity=4) == [
        ("Grade",), ("Name",), ("Salary",), ("Work_experience",)
    ]


def test_comparison_2_snapshot(spark):
    from pyspark_validator.discovery import mine_uccs

    df = _load(spark, UCC_AUCC_2)
    assert mine_uccs(df, max_arity=3) == [
        ("First_name", "Grade", "Salary"), ("Work_experience",)
    ]
    assert mine_uccs(df, max_arity=3, max_error=0.013) == [
        ("First_name", "Grade"),
        ("First_name", "Last_name"),
        ("First_name", "Salary"),
        ("Last_name", "Grade", "Salary"),
        ("Work_experience",),
    ]
    fixed = _load(spark, UCC_AUCC_2C)
    assert mine_uccs(fixed, max_arity=3) == [
        ("First_name", "Grade", "Salary"),
        ("First_name", "Last_name"),
        ("Last_name", "Grade", "Salary"),
        ("Work_experience",),
    ]
