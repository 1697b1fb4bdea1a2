"""Verification walkthroughs pinned to the reference's example snapshots
(examples/test_examples/snapshots/snap_test_examples_pytest.py:
verifying_pfd / verifying_fd_afd / verifying_aucc / verifying_ind_aind /
dynamic_verifying_fd outputs).

Every number asserted below is a published digit from the reference's own
snapshot file: PFD per_tuple error 0.4375 with 7 violating rows over 3
clusters on glitchy_sensor_2; the two duplicates_short FD clusters (Mary Doe
0.75/2, Bjorn Wolf 2/3/2); the DnD AFD error 4/21; the AUCC_example errors
1/15 and 2/15 with their exact clusters; the orders->customers AIND repair
sequence 0.33 -> 0.2 -> holds; and the full DnD dynamic insert/delete/update
walkthrough ending in the lone (Dragon, True) cluster."""

import pandas as pd
import pytest

DATASETS = "/root/reference/examples/datasets"


def _csv(name):
    return pd.read_csv(f"{DATASETS}/{name}")


# ----------------------------------------------------------- verifying_pfd --


def test_pfd_glitchy_sensor_2_matches_snapshot(spark):
    from pyspark_validator.compat import PfdVerifier

    v = PfdVerifier(spark)
    v.load_data(_csv("glitchy_sensor_2.csv"))

    # per_value measure: holds at error 0.3 (snapshot prints only "PFD holds")
    v.execute(lhs_indices=[1], rhs_indices=[2], error_measure="per_value")
    assert v.get_error() <= 0.3
    assert v.get_error() == pytest.approx(17 / 60)  # 1 - (1/6+2/3+1+1+3/4)/5

    # per_tuple: published error 0.4375, 7 rows / 3 clusters
    v.execute(lhs_indices=[1], rhs_indices=[2], error_measure="per_tuple")
    assert v.get_error() == pytest.approx(0.4375)
    assert v.get_num_violating_rows() == 7
    assert v.get_num_violating_clusters() == 3
    clusters = {
        c["DeviceId"]: (c["cluster_size"], c["num_distinct_rhs"])
        for c in v.get_violating_clusters()
    }
    assert clusters == {"D-1": (6, 6), "D-2": (3, 2), "D-5": (4, 2)}


# -------------------------------------------------------- verifying_fd_afd --


def test_fd_duplicates_short_matches_snapshot(spark):
    from pyspark_validator.compat import FdVerifier

    v = FdVerifier(spark)
    v.load_data(_csv("duplicates_short.csv"))

    # [id] -> [name] holds
    v.execute(lhs_indices=[0], rhs_indices=[2])
    assert v.fd_holds() is True

    # [name] -> [credit_score]: 2 clusters (Mary Doe incl. the nan row)
    v.execute(lhs_indices=[1], rhs_indices=[2])
    assert v.fd_holds() is False
    assert v.get_num_error_clusters() == 2
    hl = {
        tuple(h["lhs_values"]): (
            h["cluster_size"],
            h["num_distinct_rhs_values"],
            h["most_frequent_rhs_value_proportion"],
        )
        for h in v.get_highlights()
    }
    assert hl[("Mary Doe",)] == (4, 2, pytest.approx(0.75))
    assert hl[("Björn Wolf",)] == (3, 2, pytest.approx(2 / 3))


def test_afd_dnd_matches_snapshot(spark):
    from pyspark_validator.compat import FdVerifier

    v = FdVerifier(spark)
    v.load_data(_csv("DnD.csv"))
    v.execute(lhs_indices=[0], rhs_indices=[1])

    # published: holds at 0.5, fails at 0.1, exact error 0.19047619047619047
    assert v.get_error() == pytest.approx(4 / 21, abs=1e-15)
    assert v.get_error() < 0.5 and not v.get_error() < 0.1
    assert v.get_num_error_clusters() == 3
    hl = {
        tuple(h["lhs_values"]): (
            h["cluster_size"],
            h["num_distinct_rhs_values"],
            h["most_frequent_rhs_value_proportion"],
        )
        for h in v.get_highlights()
    }
    assert hl[("Elf",)] == (3, 2, pytest.approx(2 / 3))
    assert hl[("Ogre",)] == (2, 2, pytest.approx(0.5))
    assert hl[("Dwarf",)] == (2, 2, pytest.approx(0.5))


# --------------------------------------------------------- verifying_aucc --


def test_aucc_example_matches_snapshot(spark):
    from pyspark_validator.compat import UccVerifier

    v = UccVerifier(spark)
    v.load_data(_csv("AUCC_example.csv"))

    v.execute(ucc_indices=[0])  # (ID) holds
    assert v.ucc_holds() is True

    v.execute(ucc_indices=[1])  # (name): Alex twice -> error 1/15
    assert v.ucc_holds() is False
    assert v.get_error() == pytest.approx(1 / 15)
    assert v.get_num_rows_violating_ucc() == 2
    assert v.get_num_clusters_violating_ucc() == 1

    v.execute(ucc_indices=[2])  # (card_num): 665 and 667 doubled -> 2/15
    assert v.ucc_holds() is False
    assert v.get_error() == pytest.approx(2 / 15)
    assert v.get_num_rows_violating_ucc() == 4
    assert v.get_num_clusters_violating_ucc() == 2

    v.execute(ucc_indices=[2, 3])  # (card_num, card_active) holds
    assert v.ucc_holds() is True


# ----------------------------------------------------- verifying_ind_aind --


def test_ind_aind_repair_walkthrough_matches_snapshot(spark):
    from pyspark_validator.compat import IndVerifier

    ind = f"{DATASETS}/ind_datasets"
    orders = pd.read_csv(f"{ind}/orders.csv")
    products = pd.read_csv(f"{ind}/products.csv")
    customers = pd.read_csv(f"{ind}/customers.csv")

    # exact leg: [orders.product] -> [products.name] holds
    v = IndVerifier(spark)
    v.load_data(orders, products)
    v.execute(lhs_indices=[2], rhs_indices=[1])
    assert v.ind_holds() is True

    # AIND leg: [orders.customer_id] -> [customers.id], error 0.33, two
    # violating values 201 and 108
    v = IndVerifier(spark)
    v.load_data(orders, customers)
    v.execute(lhs_indices=[1], rhs_indices=[0])
    assert v.ind_holds() is False
    assert v.get_error() == pytest.approx(2 / 6)
    viol = v.get_violating_clusters()
    assert sorted(t[0] for t in viol) == [108, 201]

    # Step 1: fix the 201 -> 101 typo; error drops to 0.2
    orders_fixed = orders.copy()
    orders_fixed.loc[orders_fixed["customer_id"] == 201, "customer_id"] = 101
    v = IndVerifier(spark)
    v.load_data(orders_fixed, customers)
    v.execute(lhs_indices=[1], rhs_indices=[0])
    assert v.get_error() == pytest.approx(0.2)

    # Step 2: add the missing customer 108; the IND now holds
    customers_fixed = pd.concat(
        [customers, pd.DataFrame([{"id": 108, "name": "Frank", "country": "Italy"}])],
        ignore_index=True,
    )
    v = IndVerifier(spark)
    v.load_data(orders_fixed, customers_fixed)
    v.execute(lhs_indices=[1], rhs_indices=[0])
    assert v.ind_holds() is True


# -------------------------------------------------- dynamic_verifying_fd --


def test_dynamic_fd_dnd_walkthrough_matches_snapshot(spark, tmp_path):
    from pyspark_validator.compat import DynamicFdVerifier

    dnd = _csv("DnD.csv")  # Creature, Strength, HaveMagic
    v = DynamicFdVerifier(spark, state_path=str(tmp_path / "state"))
    v.load_data(dnd, lhs_indices=[0, 2], rhs_indices=[1])
    v.execute()  # initial verdict, no delta

    def clusters():
        return {
            tuple(h["lhs_values"]): (h["cluster_size"], h["num_distinct_rhs_values"])
            for h in v.get_highlights()
        }

    # initial: 3 violating clusters
    assert v.fd_holds() is False
    assert v.get_num_error_clusters() == 3
    assert clusters() == {
        ("Elf", True): (3, 2),
        ("Ogre", False): (2, 2),
        ("Dwarf", False): (2, 2),
    }

    # insert (Elf, 6, True): still 3 clusters, Elf grows to 4 rows
    v.execute(insert=[("Elf", 6, True)])
    assert v.fd_holds() is False
    assert v.get_num_error_clusters() == 3
    assert clusters()[("Elf", True)] == (4, 2)

    # delete rows 0, 4, 5 = (Ogre,9,False), (Elf,1,True), (Dwarf,9,False):
    # the FD now holds
    v.execute(delete=[("Ogre", 9, False), ("Elf", 1, True), ("Dwarf", 9, False)])
    assert v.fd_holds() is True

    # update rows 2, 3, 7 (all (Elf,6,True)) to Dragon 999/998/999:
    # one violating cluster (Dragon, True) with 3 rows, 2 distinct strengths
    v.execute(
        update=(
            [("Elf", 6, True), ("Elf", 6, True), ("Elf", 6, True)],
            [("Dragon", 999, True), ("Dragon", 998, True), ("Dragon", 999, True)],
        )
    )
    assert v.fd_holds() is False
    assert v.get_num_error_clusters() == 1
    assert clusters() == {("Dragon", True): (3, 2)}

    # multi-op batch: insert (Elf,7,True); delete rows 6, 7 = (Dwarf,6,False),
    # (Dragon,999,True); update row 1 (Ogre,6,False) -> (Elf,0,False).
    # Final table: (Elf,0,False), (Dragon,999), (Dragon,998), (Elf,7,True) —
    # one cluster (Dragon, True) of 2 rows.
    v.execute(
        insert=[("Elf", 7, True)],
        delete=[("Dwarf", 6, False), ("Dragon", 999, True)],
        update=([("Ogre", 6, False)], [("Elf", 0, False)]),
    )
    assert v.fd_holds() is False
    assert v.get_num_error_clusters() == 1
    assert clusters() == {("Dragon", True): (2, 2)}


def test_dynamic_afd_dnd_walkthrough_matches_snapshot(spark, tmp_path):
    """dynamic_verifying_afd: same DnD FD, AFD error tracked through one
    mixed insert/delete/update batch — published errors 0.19047619047619047
    (= 4/21) before and 0.2857142857142857 (= 2/7) after, with the single
    surviving (Elf, False) cluster of 5 rows / 2 distinct strengths."""
    from pyspark_validator.compat import DynamicFdVerifier

    dnd = _csv("DnD.csv")
    v = DynamicFdVerifier(spark, state_path=str(tmp_path / "state"))
    v.load_data(dnd, lhs_indices=[0, 2], rhs_indices=[1])
    v.execute()

    assert v.get_error() == pytest.approx(4 / 21, abs=1e-15)
    assert v.get_error() < 0.5 and not v.get_error() < 0.1
    assert v.get_num_error_clusters() == 3

    # insert 2x(Elf,2,False) + (Dragon,200,True); delete rows 2,4,6; update
    # rows 0,1,3,5 -> three (Elf,3,False) and one (Dragon,200,True)
    v.execute(
        insert=[("Elf", 2, False), ("Elf", 2, False), ("Dragon", 200, True)],
        delete=[("Elf", 6, True), ("Elf", 1, True), ("Dwarf", 6, False)],
        update=(
            [("Ogre", 9, False), ("Ogre", 6, False), ("Elf", 6, True),
             ("Dwarf", 9, False)],
            [("Elf", 3, False), ("Elf", 3, False), ("Dragon", 200, True),
             ("Elf", 3, False)],
        ),
    )
    assert v.get_error() == pytest.approx(2 / 7, abs=1e-15)
    assert v.get_error() < 0.5 and not v.get_error() < 0.1
    assert v.get_num_error_clusters() == 1
    (hl,) = v.get_highlights()
    assert tuple(hl["lhs_values"]) == ("Elf", False)
    assert hl["cluster_size"] == 5 and hl["num_distinct_rhs_values"] == 2
