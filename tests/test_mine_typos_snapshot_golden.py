"""The reference's expert typo-mining pipeline pinned to its example
snapshot (examples/test_examples/snapshots/snap_test_examples_pytest.py,
mine_typos_output): "almost holding" FDs over Workshop.csv = g1 AFDs at
error 0.005 minus the exact minimal FDs -- the snapshot's five -- and the
selected [workshop] -> supervisor_surname dependency's violating cluster:
Yogatacular with 199 rows, 198 'Galen Calla' vs 1 typo'd 'Galen Calella'
(most-frequent proportion 198/199)."""

import pandas as pd
import pytest

from pyspark_validator.checks.fd import fd_check
from pyspark_validator.discovery import mine_fds
from pyspark_validator.pfd_discovery import mine_afds_tane

WORKSHOP = "/root/reference/examples/datasets/Workshop.csv"


@pytest.fixture(scope="module")
def workshop(spark):
    return spark.createDataFrame(pd.read_csv(WORKSHOP).astype(str))


def test_almost_holding_fds_match_snapshot(workshop):
    cols = workshop.columns
    fds = {(tuple(sorted(l)), r) for l, r in mine_fds(workshop, cols, max_lhs=5)}
    afds = {
        (tuple(sorted(l)), r)
        for l, r in mine_afds_tane(
            workshop, cols, max_error=0.005, error_measure="g1"
        )
    }
    assert afds - fds == {
        (("salary", "supervisor_surname"), "job_post"),
        (("job_post", "supervisor_surname"), "salary"),
        (("workshop",), "supervisor_surname"),
        (("salary", "workshop"), "job_post"),
        (("job_post", "workshop"), "salary"),
    }


def test_typo_cluster_matches_snapshot(workshop):
    h = (
        fd_check(workshop, ["workshop"], ["supervisor_surname"], num_partitions=8)
        .highlights()
        .collect()
    )
    assert len(h) == 1
    row = h[0]
    assert row["workshop"] == "Yogatacular"
    assert row["cluster_size"] == 199
    assert row["num_distinct_rhs"] == 2
    assert float(row["most_frequent_rhs_proportion"]) == 198 / 199
    counts = dict(
        workshop.filter(workshop.workshop == "Yogatacular")
        .groupBy("supervisor_surname")
        .count()
        .collect()
    )
    assert counts == {"Galen Calla": 198, "Galen Calella": 1}
