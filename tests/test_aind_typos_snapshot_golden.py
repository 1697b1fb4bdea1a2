"""Mind approximate-IND mining + verification pinned to the reference's
aind_typos example snapshot (examples/test_examples/snapshots/
snap_test_examples_pytest.py, aind_typos_output): mining at error 0.4 over
the ind_datasets orders/customers/products tables yields six exact INDs --
including both binary GenNext products -- plus the two AINDs whose g3'
errors the snapshot pins at 1/3 and 1/5, and whose violating clusters
(the typo'd customer ids 201/108 and the order-less customer 105) the
verifier reproduces."""

import pandas as pd
import pytest

from pyspark_validator.checks.ind import ind_check
from pyspark_validator.discovery import mine_nary_inds

P = "/root/reference/examples/datasets/ind_datasets"


@pytest.fixture(scope="module")
def tables(spark):
    return {
        n: spark.createDataFrame(pd.read_csv(f"{P}/{n}.csv"))
        for n in ("orders", "customers", "products")
    }


def test_mind_error_mode_matches_snapshot(tables):
    got = {
        ((t, lc), (rt, rc), round(e, 6))
        for (t, lc), (rt, rc), e in mine_nary_inds(
            tables, max_arity=2, max_error=0.4
        )
    }
    assert got == {
        (("orders", ("id",)), ("products", ("id",)), 0.0),
        (("orders", ("product",)), ("products", ("name",)), 0.0),
        (("products", ("id",)), ("orders", ("id",)), 0.0),
        (("products", ("name",)), ("orders", ("product",)), 0.0),
        (("orders", ("id", "product")), ("products", ("id", "name")), 0.0),
        (("products", ("id", "name")), ("orders", ("id", "product")), 0.0),
        (("orders", ("customer_id",)), ("customers", ("id",)), 0.333333),
        (("customers", ("id",)), ("orders", ("customer_id",)), 0.2),
    }


def test_aind_violating_clusters_match_snapshot(tables):
    chk = ind_check(
        tables["orders"], ["customer_id"], tables["customers"], ["id"]
    )
    assert sorted(r[0] for r in chk._missing.collect()) == [108, 201]
    chk2 = ind_check(
        tables["customers"], ["id"], tables["orders"], ["customer_id"]
    )
    assert sorted(r[0] for r in chk2._missing.collect()) == [105]
