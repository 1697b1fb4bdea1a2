"""AR mining goldens: mine_frequent_itemsets / mine_ars must reproduce the
reference's Apriori results verbatim (test_apriori.cpp) on its own
transactional fixtures, and the fpgrowth scale path must agree with the
apriori path exactly."""

import pandas as pd
import pytest

from pyspark_validator.discovery import mine_ars, mine_frequent_itemsets

_FIX = "/root/reference/test_input_data/transactional_data"


def _load_pairs(spark, name):
    pdf = pd.read_csv(f"{_FIX}/{name}", header=None, names=["tid", "item"])
    pdf = pdf.dropna()
    return spark.createDataFrame(pdf.astype({"tid": int, "item": str}))


def test_book_dataset_frequent_and_rules(spark):
    # test_apriori.cpp BookDataset: minsup 0.3, minconf 0.5
    df = _load_pairs(spark, "rules-book.csv")
    fi = mine_frequent_itemsets(df, minsup=0.3)
    expected_frequent = {
        frozenset(s)
        for s in [
            {"Bread"}, {"Milk"}, {"Eggs"}, {"Cheese"}, {"Yogurt"},
            {"Bread", "Milk"}, {"Eggs", "Milk"}, {"Cheese", "Milk"},
            {"Eggs", "Yogurt"}, {"Milk", "Yogurt"},
            {"Eggs", "Milk", "Yogurt"},
        ]
    }
    assert set(fi) == expected_frequent

    rules = mine_ars(df, minsup=0.3, minconf=0.5)
    got = {(frozenset(l), frozenset(r)) for l, r, _, _ in rules}
    expected_rules = {
        (frozenset(l), frozenset(r))
        for l, r in [
            ({"Bread"}, {"Milk"}), ({"Cheese"}, {"Milk"}),
            ({"Milk"}, {"Eggs"}), ({"Eggs"}, {"Milk"}),
            ({"Yogurt"}, {"Eggs"}), ({"Eggs"}, {"Yogurt"}),
            ({"Yogurt"}, {"Milk"}), ({"Milk"}, {"Yogurt"}),
            ({"Yogurt", "Milk"}, {"Eggs"}), ({"Yogurt", "Eggs"}, {"Milk"}),
            ({"Milk", "Eggs"}, {"Yogurt"}), ({"Yogurt"}, {"Milk", "Eggs"}),
            ({"Eggs"}, {"Yogurt", "Milk"}),
        ]
    }
    assert got == expected_rules


def test_book_support_and_confidence(spark):
    # test_apriori.cpp SupportAndConfidenceSingular: minsup 0.2, minconf 0.5
    df = _load_pairs(spark, "rules-book.csv")
    rules = {
        (frozenset(l), frozenset(r)): (s, c)
        for l, r, s, c in mine_ars(df, minsup=0.2, minconf=0.5)
    }
    cases = [
        ({"Eggs"}, {"Milk"}, 0.6, 1.0),
        ({"Bread"}, {"Eggs"}, 0.2, 0.5),
        ({"Yogurt"}, {"Milk"}, 0.6, 1.0),
        ({"Bread"}, {"Milk"}, 0.4, 1.0),
        ({"Cheese"}, {"Milk"}, 0.4, 1.0),
        ({"Milk", "Bread"}, {"Eggs"}, 0.2, 0.5),
    ]
    for l, r, sup, conf in cases:
        s, c = rules[(frozenset(l), frozenset(r))]
        assert s == pytest.approx(sup)
        assert c == pytest.approx(conf)


def test_presentation_datasets(spark):
    # test_apriori.cpp PresentationDataset (minsup 0.6, minconf 0): rules are
    # every split of every frequent pair
    df = _load_pairs(spark, "rules-presentation.csv")
    fi = mine_frequent_itemsets(df, minsup=0.6)
    assert set(fi) == {
        frozenset(s)
        for s in [
            {"Bread"}, {"Milk"}, {"Diaper"}, {"Beer"},
            {"Bread", "Milk"}, {"Diaper", "Beer"}, {"Milk", "Diaper"},
            {"Bread", "Diaper"},
        ]
    }
    rules = mine_ars(df, minsup=0.6, minconf=0.0)
    assert len(rules) == 8

    # PresentationExtendedDataset (minsup 0.6): two frequent triples appear
    df2 = _load_pairs(spark, "rules-presentation-extended.csv")
    fi2 = mine_frequent_itemsets(df2, minsup=0.6)
    assert frozenset({"Bread", "Diaper", "Beer"}) in fi2
    assert frozenset({"Milk", "Diaper", "Beer"}) in fi2
    assert len(fi2) == 12


def test_synthetic_pruning_no_rules(spark):
    # test_apriori.cpp SyntheticDatasetWithPruning: minsup 0.13, minconf 1 ->
    # a 4-itemset survives but NO rule reaches confidence 1
    df = _load_pairs(spark, "rules-synthetic-2.csv")
    fi = mine_frequent_itemsets(df, minsup=0.13)
    assert frozenset({"a", "c", "d", "f"}) in fi
    assert len(fi) == 19
    assert mine_ars(df, minsup=0.13, minconf=1.0) == []


def test_fpgrowth_path_agrees_with_apriori(spark):
    df = _load_pairs(spark, "rules-book.csv")
    a = mine_frequent_itemsets(df, minsup=0.2, method="apriori")
    f = mine_frequent_itemsets(df, minsup=0.2, method="fpgrowth")
    assert a == f
    ra = mine_ars(df, minsup=0.2, minconf=0.5, method="apriori")
    rf = mine_ars(df, minsup=0.2, minconf=0.5, method="fpgrowth")
    assert ra == rf


def test_mined_rule_agrees_with_ar_check(spark):
    # miner-vs-verifier cross-validation (the repo's standard pattern)
    from pyspark_validator.checks.ar import ar_check

    df = _load_pairs(spark, "rules-book.csv")
    for lhs, rhs, sup, conf in mine_ars(df, minsup=0.3, minconf=0.5)[:5]:
        s = ar_check(df, list(lhs), list(rhs)).summary().collect()[0]
        assert float(s["support"]) == pytest.approx(sup)
        assert float(s["confidence"]) == pytest.approx(conf)


def test_max_len_and_empty(spark):
    df = _load_pairs(spark, "rules-book.csv")
    fi = mine_frequent_itemsets(df, minsup=0.3, max_len=1)
    assert all(len(s) == 1 for s in fi)
    empty = spark.createDataFrame([], "tid int, item string")
    assert mine_frequent_itemsets(empty, minsup=0.3) == {}
    assert mine_ars(empty, minsup=0.3) == []
