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


# --- property-based cross-validation vs a brute-force python oracle --------

from collections import Counter
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _brute_cfds(rows, cols, min_supp, min_conf, max_lhs):
    """Direct enumeration of the FDFirst closed form (module docstring of
    cfd_discovery.py) with the engine's deterministic tie-break."""
    recs = []
    D = {}
    for k in range(1, max_lhs + 1):
        for T in combinations(cols, k):
            D[frozenset(T)] = len(
                {tuple(r[cols.index(c)] for c in T) for r in rows}
            )

    def free(lhs):
        if len(lhs) == 1:
            return True
        return all(
            D[frozenset(s)] != D[frozenset(lhs)]
            for k in range(1, len(lhs))
            for s in combinations(lhs, k)
        )

    for size in range(2, max_lhs + 2):
        for S in combinations(cols, size):
            for rhs in S:
                lhs = tuple(c for c in S if c != rhs)
                groups = {}
                for r in rows:
                    key = tuple(r[cols.index(c)] for c in lhs)
                    groups.setdefault(key, []).append(r[cols.index(rhs)])
                gstats = []
                for key, ys in groups.items():
                    cnt = Counter(ys)
                    best = max(cnt.values())
                    bv = max(v for v, c in cnt.items() if c == best)
                    gstats.append(
                        (dict(zip(lhs, key)), len(ys), best, bv, min(ys), max(ys))
                    )
                for cs in range(0, len(lhs) + 1):
                    for C in combinations(lhs, cs):
                        pats = {}
                        for kv, sz, best, bv, mn, mx in gstats:
                            ck = tuple(kv[c] for c in C)
                            e = pats.setdefault(ck, [0, 0, None, None, None, -1])
                            e[0] += sz
                            e[1] += best
                            e[2] = mn if e[2] is None else min(e[2], mn)
                            e[3] = mx if e[3] is None else max(e[3], mx)
                            if best > e[5] or (best == e[5] and bv > e[4]):
                                e[4], e[5] = bv, best
                        for ck, (supp, sat, mn, mx, bv, _b) in pats.items():
                            conf = 1.0 - float(supp - sat) / float(supp)
                            if supp < min_supp or conf < min_conf:
                                continue
                            cd = dict(zip(C, ck))
                            if cs == len(lhs):
                                recs.append((lhs, cd, rhs, bv, supp, conf))
                            else:
                                if mn == mx:
                                    continue
                                if cs == 0 and not free(lhs):
                                    continue
                                recs.append((lhs, cd, rhs, None, supp, conf))
    exact = [r for r in recs if r[5] >= 1.0]

    def precedes(al, ac, bl, bc):
        if frozenset(al) == frozenset(bl) and ac == bc:
            return False
        if len(al) > len(bl):
            return False
        for attr in al:
            if attr in ac:
                if bc.get(attr) != ac[attr]:
                    return False
            elif attr not in bl:
                return False
        return True

    out = set()
    for lhs, C, rhs, rv, supp, conf in recs:
        pruned = any(
            precedes(el, ec, lhs, C)
            for el, ec, er, erv, _es, _ecf in exact
            if er == rhs
            and (rv is None) == (erv is None)
            and (rv is None or erv == rv)
        )
        if not pruned:
            items = frozenset(
                f"{a}={C[a]}" if a in C else a for a in lhs
            )
            out.add(
                (items, rhs if rv is None else f"{rhs}={rv}", supp, round(conf, 9))
            )
    return out


cfd_rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.sampled_from(["x", "y"]),
        st.sampled_from(["p", "q", "r"]),
    ),
    min_size=1,
    max_size=25,
)


@given(
    rows=cfd_rows_strategy,
    min_supp=st.sampled_from([1, 2, 4]),
    min_conf=st.sampled_from([0.7, 1.0]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mine_cfds_matches_brute_oracle(spark, rows, min_supp, min_conf):
    cols = ["u", "v", "w"]
    df = spark.createDataFrame(rows, cols)
    got = {
        (
            frozenset(a if c is None else f"{a}={c}" for a, c in r.lhs),
            r.rhs_attr if r.rhs_const is None else f"{r.rhs_attr}={r.rhs_const}",
            r.support,
            round(r.confidence, 9),
        )
        for r in mine_cfds(
            df, min_supp=min_supp, min_conf=min_conf, max_lhs=2
        )
    }
    assert got == _brute_cfds(rows, cols, min_supp, min_conf, max_lhs=2)
