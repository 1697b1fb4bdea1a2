"""CFD discovery goldens: mine_cfds must reproduce the reference FDFirst
output verbatim (test_cfd_algos.cpp) on its own fixtures, plus unit checks of
the emission semantics on constructed data."""

import pytest

from pyspark_validator.cfd_discovery import NULL_VALUE, CFDRule, mine_cfds

_FIX = "/root/reference/test_input_data/cfd_data"


def _canon(rule: CFDRule):
    items = frozenset(
        a if v is None else f"{a}={v}" for a, v in rule.lhs
    )
    rhs = (
        rule.rhs_attr
        if rule.rhs_const is None
        else f"{rule.rhs_attr}={rule.rhs_const}"
    )
    return (items, rhs)


def _parse(expected: str):
    lhs, rhs = expected.split(" => ")
    return (
        frozenset(x.strip() for x in lhs.strip("()").split(",")),
        rhs.strip(),
    )


# test_cfd_algos.cpp FullTennisDataset: minsup 8, minconf 0.85, max_lhs 3
TENNIS_EXPECTED = [
    "(windy, temp, outlook) => humidity",
    "(windy, humidity, outlook) => temp",
    "(windy, outlook) => play",
    "(outlook, windy=false) => play",
    "(windy, temp, outlook) => play",
    "(play, temp, outlook) => windy",
    "(temp, outlook, play=yes) => windy",
    "(play, windy, temp) => outlook",
    "(play, temp, windy=false) => outlook",
    "(humidity, outlook) => play",
    "(humidity, temp, outlook) => play",
    "(play, temp, outlook) => humidity",
    "(windy, humidity, outlook) => play",
]

# test_cfd_algos.cpp PartialMushroomDataset: minsup 4, minconf 0.9, max_lhs 4
MUSHROOM_EXPECTED = [
    "(edible=p) => cap-shape=x",
    "(cap-shape=b) => edible=e",
    "(cap-color=y) => edible=e",
    "(cap-color, edible=p) => cap-shape",
    "(edible=p, cap-color=n) => cap-shape=x",
    "(cap-surface=f) => edible=e",
    "(cap-color, cap-surface=s) => edible",
    "(cap-surface, edible=p) => cap-shape",
    "(edible=p, cap-surface=y) => cap-shape=x",
    "(cap-surface, cap-shape=f) => edible",
    "(cap-shape, edible=p, cap-surface=s) => cap-color",
    "(cap-color, edible, cap-shape=f) => cap-surface",
    "(cap-shape, edible=p, cap-color=w) => cap-surface",
    "(edible=p, cap-shape=x, cap-color=w) => cap-surface=y",
    "(cap-color, cap-surface, edible=p) => cap-shape",
    "(cap-color, cap-surface, cap-shape) => edible",
    "(cap-color, cap-shape, cap-surface=s) => edible",
    "(cap-color, cap-surface, cap-shape=x) => edible",
]


def test_tennis_reference_golden(spark):
    df = spark.read.csv(f"{_FIX}/tennis.csv", header=True)
    rules = mine_cfds(df, min_supp=8, min_conf=0.85, max_lhs=3)
    assert {_canon(r) for r in rules} == {_parse(s) for s in TENNIS_EXPECTED}
    by_canon = {_canon(r): r for r in rules}
    # spot-check the stats of the one mixed-pattern rule with a closed form:
    # windy=false matches 8 of 14 rows; within them outlook partitions
    # sunny{no,no,yes}/overcast{yes,yes}/rainy{yes,yes,no} -> best 2+2+2+1=7
    mixed = by_canon[(frozenset({"outlook", "windy=false"}), "play")]
    assert mixed.support == 8
    assert mixed.confidence == pytest.approx(7 / 8)


def test_mushroom_reference_golden(spark):
    df = spark.read.csv(f"{_FIX}/mushroom50.csv", header=True)
    rules = mine_cfds(df, min_supp=4, min_conf=0.9, max_lhs=4)
    assert {_canon(r) for r in rules} == {_parse(s) for s in MUSHROOM_EXPECTED}


def test_exact_general_rule_prunes_specializations(spark):
    # b is a function of a (exact FD) -> the FD (a) => b is emitted and every
    # pattern/superset specialization with the same variable RHS is pruned
    df = spark.createDataFrame(
        [("x", "1", "p"), ("x", "1", "q"), ("y", "2", "p"), ("y", "2", "q")],
        ["a", "b", "c"],
    )
    rules = mine_cfds(df, min_supp=1, min_conf=1.0, max_lhs=2)
    got = {_canon(r) for r in rules}
    assert (frozenset({"a"}), "b") in got
    assert (frozenset({"b"}), "a") in got
    # no (a, c) => b, no (a=x) => b=1 shadowed forms... constant rules keyed
    # by value are NOT pruned by the variable FD (reference rules_ keying)
    assert not any("a" in lhs and "c" in lhs and rhs == "b" for lhs, rhs in got)
    assert (frozenset({"a=x"}), "b=1") in got


def test_minsup_gates_patterns_not_fds(spark):
    # FD rules bypass minsup (support = n by construction, MineFD has no
    # minsup check); pattern rules respect it
    df = spark.createDataFrame(
        [("x", "1"), ("x", "1"), ("y", "2"), ("z", "3")], ["a", "b"]
    )
    rules = mine_cfds(df, min_supp=2, min_conf=1.0, max_lhs=1)
    got = {_canon(r) for r in rules}
    assert (frozenset({"a"}), "b") in got
    assert (frozenset({"a=x"}), "b=1") in got  # support 2 passes
    assert not any(
        rhs.startswith("b=") and lhs in ({"a=y"}, {"a=z"}) for lhs, rhs in got
    )


def test_variable_rule_skipped_when_rhs_constant(spark):
    # IsConstRule: rhs constant over the table -> no variable-RHS rule at all,
    # only the constant form (here pruned down to the most general generator)
    df = spark.createDataFrame([("x", "1"), ("y", "1")], ["a", "b"])
    rules = mine_cfds(df, min_supp=1, min_conf=1.0, max_lhs=1)
    got = {_canon(r) for r in rules}
    assert (frozenset({"a"}), "b") not in got
    assert (frozenset({"a=x"}), "b=1") in got


def test_nulls_are_values(spark):
    df = spark.createDataFrame(
        [(None, "1"), (None, "1"), ("y", "2")], ["a", "b"]
    )
    rules = mine_cfds(df, min_supp=2, min_conf=1.0, max_lhs=1)
    got = {(r.lhs, r.rhs_attr, r.rhs_const) for r in rules}
    assert ((("a", NULL_VALUE),), "b", "1") in got


def test_empty_input(spark):
    df = spark.createDataFrame([], "a string, b string")
    assert mine_cfds(df, min_supp=1, min_conf=1.0, max_lhs=1) == []


def test_guards(spark):
    df = spark.createDataFrame([("x", "1")], ["a", "b"])
    with pytest.raises(ValueError, match="at least two"):
        mine_cfds(df, columns=["a"])
    with pytest.raises(ValueError, match="min_supp"):
        mine_cfds(df, min_supp=0)
    with pytest.raises(ValueError, match="min_conf"):
        mine_cfds(df, min_conf=1.5)
    with pytest.raises(ValueError, match="max_patterns|qualifying"):
        mine_cfds(df, min_supp=1, max_lhs=1, max_patterns=0)


def test_to_string_format():
    rule = CFDRule(
        lhs=(("a", None), ("b", "x")),
        rhs_attr="c",
        rhs_const="1",
        support=5,
        confidence=1.0,
    )
    assert rule.to_string() == "(a, b=x) => c=1"


def test_fdfirst_facade(spark):
    from pyspark_validator import compat

    algo = compat.FDFirst(spark)
    df = spark.read.csv(f"{_FIX}/tennis.csv", header=True)
    algo.load_data(df)
    algo.execute(minsup=8, minconf=0.85, max_lhs=3)
    got = {_canon(r) for r in algo.get_rules()}
    assert got == {_parse(s) for s in TENNIS_EXPECTED}
    assert "(outlook, windy=false) => play" in algo.get_cfds()
