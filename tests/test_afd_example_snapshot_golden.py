"""TANE AFD mining pinned to the reference's own example snapshot
(examples/test_examples/snapshots/snap_test_examples_pytest.py,
mining_afd_output): all five error measures over
examples/datasets/inventory_afd.csv at error 0.3 -- a third fixture beyond
the TestFD/iris hash suite, and one with a genuine knife edge: the tau
error of ProductName -> Price is exactly 3/10, so it registers only when
the double rounding of the error lands AT the threshold the way the
reference's long-double accumulation does (the reduced-form
(1-pdep)/(1-ps) evaluation in _afd_errors)."""

import csv

import pytest

from pyspark_validator.pfd_discovery import mine_afds_tane

INVENTORY = "/root/reference/examples/datasets/inventory_afd.csv"

#: (measure, snapshot result at error 0.3) -- mining_afd_output verbatim
GOLDEN = [
    (
        "g1",
        [
            "[Id] -> Price",
            "[Id] -> ProductName",
            "[Price] -> Id",
            "[Price] -> ProductName",
            "[ProductName] -> Id",
            "[ProductName] -> Price",
        ],
    ),
    ("pdep", ["[Id] -> Price", "[Id] -> ProductName", "[ProductName] -> Price"]),
    (
        "tau",
        ["[Id] -> Price", "[Id] -> ProductName", "[ProductName] -> Price"],
    ),
    ("mu_plus", ["[Id] -> Price", "[Id] -> ProductName"]),
    ("rho", ["[Id] -> Price", "[Id] -> ProductName", "[ProductName] -> Price"]),
]


@pytest.mark.parametrize("measure,want", GOLDEN)
def test_inventory_afd_snapshot(spark, measure, want):
    rows = list(csv.reader(open(INVENTORY)))
    hdr, data = rows[0], rows[1:]
    df = spark.createDataFrame([tuple(r) for r in data], hdr)
    fds = mine_afds_tane(df, hdr, max_error=0.3, error_measure=measure)
    got = sorted(f"[{' '.join(lhs)}] -> {rhs}" for lhs, rhs in fds)
    assert got == sorted(want)
