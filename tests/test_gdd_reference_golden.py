"""GDD validation parity: every ValidatorCase of the reference's
src/tests/unit/test_gdd_validator.cpp (graphs + GDDs built verbatim from
tests/unit/test_gdd_utils.h), asserted on verdicts AND counterexample
existence. The homomorphism cases pin the non-injective / non-induced match
semantics; the parallel-edge cases pin per-pattern-edge label preservation;
the relation cases pin gdd.cpp SatisfiesRelationConstraint."""

import pytest

from pyspark_validator.graphs import (
    AttrToken,
    Gdd,
    GddConstraint,
    RelToken,
    gdd_check,
    gdd_violations,
    graph_frames,
    parse_dot,
)


def eq_str(pid, attr, value):
    # test_gdd_utils.h EqStrAttrToConst
    return GddConstraint(AttrToken(pid, attr), value, 0.0, "edit_distance", "eq")


def attr_attr(p1, a1, p2, a2, metric, op, thr):
    return GddConstraint(AttrToken(p1, a1), AttrToken(p2, a2), thr, metric, op)


def edit_le(p1, a1, p2, a2, thr):
    return attr_attr(p1, a1, p2, a2, "edit_distance", "le", thr)


def edit_le_const(pid, attr, value, thr):
    return GddConstraint(AttrToken(pid, attr), value, thr, "edit_distance", "le")


def absdiff_le_const(pid, attr, value, thr):
    return GddConstraint(AttrToken(pid, attr), value, thr, "abs_diff", "le")


def rel_to_const(pid, rel, target_id):
    return GddConstraint(RelToken(pid, rel), target_id, 0.0, "abs_diff", "eq")


def arrow(src_label, dst_label, edge_label):
    return parse_dot(
        f'digraph P {{ 0 [label = "{src_label}"]; 1 [label = "{dst_label}"]; '
        f'0 -> 1 [label = "{edge_label}"]; }}'
    )


PERSON_CITY = lambda e="lives_in": arrow("Person", "City", e)  # noqa: E731

LARGE_GOOD = """digraph G {
    1 [label="Person", name="Misha", age="25", email="m@x"];
    2 [label="Person", name="Bob",   age="31"];
    3 [label="Person", name="Alice", age="22"];
    101 [label="City", name="Amsterdam", population="821752"];
    102 [label="City", name="Riga",      population="605273"];
    103 [label="City", name="Paris"];
    201 [label="Country", name="Netherlands"];
    202 [label="Country", name="Latvia"];
    203 [label="Country", name="France"];
    1 -> 101 [label="lives_in"];
    2 -> 102 [label="lives_in"];
    3 -> 103 [label="lives_in"];
    101 -> 201 [label="in_country"];
    102 -> 202 [label="in_country"];
    103 -> 203 [label="in_country"];
    1 -> 2 [label="friend"];
    2 -> 3 [label="friend"];
    3 -> 1 [label="friend"];
    101 -> 102 [label="sister_city"];
    102 -> 103 [label="sister_city"];
}"""

LARGE_VIOLATION = LARGE_GOOD.replace(
    '1 -> 101 [label="lives_in"];',
    '1 -> 101 [label="lives_in"];\n    1 -> 102 [label="lives_in"];',
).replace(
    '101 -> 102 [label="sister_city"];\n    102 -> 103 [label="sister_city"];\n',
    "",
)

DBLP = """digraph G {
    1 [label="Author", name="Jiawei Han", canonical_author_id="author:han_jiawei"];
    2 [label="Author", name="J. Han",     canonical_author_id="author:han_jiawei"];
    3 [label="Author", name="Philip S. Yu", canonical_author_id="author:yu_philip"];
    4 [label="Author", name="Yi Zhang", canonical_author_id="author:zhang_yi"];
    5 [label="Author", name="Yu Zhang", canonical_author_id="author:zhang_yu"];
    101 [label="Paper", title="Mining Frequent Patterns",     year="2000"];
    102 [label="Paper", title="Mining Frequent Pattern Sets", year="2000"];
    103 [label="Paper", title="Scalable Pattern Search",      year="2023"];
    104 [label="Paper", title="Efficient Pattern Search",     year="2023"];
    201 [label="Venue", name="SIGMOD"];
    202 [label="Venue", name="KDD"];
    1 -> 101 [label="authored"];
    3 -> 101 [label="authored"];
    2 -> 102 [label="authored"];
    3 -> 102 [label="authored"];
    4 -> 103 [label="authored"];
    5 -> 104 [label="authored"];
    101 -> 201 [label="published_in"];
    102 -> 201 [label="published_in"];
    103 -> 202 [label="published_in"];
    104 -> 202 [label="published_in"];
}"""

DBLP_STRONG_PATTERN = parse_dot("""digraph P {
    0 [label="Author"]; 1 [label="Author"]; 2 [label="Paper"];
    3 [label="Paper"]; 4 [label="Author"]; 5 [label="Venue"];
    0 -> 2 [label="authored"]; 1 -> 3 [label="authored"];
    4 -> 2 [label="authored"]; 4 -> 3 [label="authored"];
    2 -> 5 [label="published_in"]; 3 -> 5 [label="published_in"];
}""")

DBLP_WEAK_PATTERN = parse_dot("""digraph P {
    0 [label="Author"]; 1 [label="Author"]; 2 [label="Paper"];
    3 [label="Paper"]; 4 [label="Venue"];
    0 -> 2 [label="authored"]; 1 -> 3 [label="authored"];
    2 -> 4 [label="published_in"]; 3 -> 4 [label="published_in"];
}""")


def gdd_misha():
    return Gdd(PERSON_CITY(), [eq_str(0, "name", "Misha")], [eq_str(1, "name", "Amsterdam")])


def gdd_riga():
    return Gdd(arrow("City", "Country", "in_country"), [eq_str(0, "name", "Riga")], [eq_str(1, "name", "Latvia")])


def gdd_vacuous():
    return Gdd(PERSON_CITY(), [eq_str(0, "name", "Nonexistent")], [eq_str(1, "name", "Nowhere")])


def gdd_age_relation():
    return Gdd(PERSON_CITY(), [absdiff_le_const(0, "age", 25, 0.0)], [rel_to_const(0, "lives_in", 101)])


def gdd_label_close():
    return Gdd(PERSON_CITY(), [eq_str(0, "name", "Misha")], [edit_le_const(1, "label", "Coty", 1.0)])


def gdd_company():
    return Gdd(arrow("Company", "City", "hq_in"), [], [eq_str(1, "name", "Amsterdam")])


def gdd_dblp_strong():
    return Gdd(
        DBLP_STRONG_PATTERN,
        [edit_le(0, "name", 1, "name", 8.0), edit_le(2, "year", 3, "year", 0.0)],
        [edit_le(0, "canonical_author_id", 1, "canonical_author_id", 0.0)],
    )


def gdd_dblp_weak():
    return Gdd(
        DBLP_WEAK_PATTERN,
        [edit_le(0, "name", 1, "name", 2.0), edit_le(2, "year", 3, "year", 0.0)],
        [edit_le(0, "canonical_author_id", 1, "canonical_author_id", 0.0)],
    )


CASES = [
    (
        "VertexLabelMatters",
        'digraph G { 1 [label = "Country", name = "France"]; }',
        [Gdd(parse_dot('digraph P { 0 [label = "City"]; }'), [], [eq_str(0, "name", "Impossible")])],
        [True],
    ),
    (
        "EdgeLabelMatters",
        'digraph G { 1 [label = "Person", name = "Misha"]; 2 [label = "City", name = "Amsterdam"]; 1 -> 2 [label = "works_in"]; }',
        [Gdd(PERSON_CITY(), [], [eq_str(1, "name", "Impossible")])],
        [True],
    ),
    (
        "DirectedEdgeOrientationMatters",
        'digraph G { 1 [label = "Person"]; 2 [label = "City"]; 2 -> 1 [label = "lives_in"]; }',
        [Gdd(PERSON_CITY(), [], [eq_str(1, "label", "Impossible")])],
        [True],
    ),
    (
        "HomomorphicMatchAllowsVertexMerging",
        'digraph G { 1 [label = "X"]; 1 -> 1 [label = "L"]; }',
        [Gdd(arrow("X", "X", "L"), [], [attr_attr(0, "id", 1, "id", "abs_diff", "gt", 0.0)])],
        [False],
    ),
    (
        "HomomorphicMatchSameTargetMatchExists",
        'digraph G { 1 [label = "City", name = "Paris"]; 101 [label = "Country", name = "France"]; 1 -> 101 [label = "capital_of"]; 1 -> 101 [label = "located_in"]; }',
        [
            Gdd(
                parse_dot('digraph P { 0 [label = "City"]; 1 [label = "Country"]; 2 [label = "Country"]; 0 -> 1 [label = "capital_of"]; 0 -> 2 [label = "located_in"]; }'),
                [],
                [eq_str(0, "name", "Impossible")],
            )
        ],
        [False],
    ),
    (
        "HomomorphicMatchSameTargetValid",
        'digraph G { 1 [label = "City", name = "Paris"]; 101 [label = "Country", name = "France"]; 1 -> 101 [label = "capital_of"]; 1 -> 101 [label = "located_in"]; }',
        [
            Gdd(
                parse_dot('digraph P { 0 [label = "City"]; 1 [label = "Country"]; 2 [label = "Country"]; 0 -> 1 [label = "capital_of"]; 0 -> 2 [label = "located_in"]; }'),
                [],
                [attr_attr(1, "name", 2, "name", "edit_distance", "eq", 0.0)],
            )
        ],
        [True],
    ),
    (
        "DisconnectedPatternIsolatedVerticesCanBeMatched",
        'digraph G { 10 [label = "A", name = "a"]; 11 [label = "B", name = "b"]; 12 [label = "C", name = "c"]; }',
        [
            Gdd(
                parse_dot('digraph P { 0 [label = "A"]; 1 [label = "B"]; 2 [label = "C"]; }'),
                [],
                [eq_str(0, "name", "Impossible")],
            )
        ],
        [False],
    ),
    (
        "ConnectedPatternCannotJumpAcrossGraphComponents",
        'digraph G { 1 [label = "A", name = "left"]; 2 [label = "B", name = "right"]; }',
        [Gdd(arrow("A", "B", "l"), [], [eq_str(1, "name", "Impossible")])],
        [True],
    ),
    (
        "ParallelEdgesDifferentLabelsPatternNeedsOne",
        'digraph G { 1 [label = "Person", name = "Misha"]; 2 [label = "City", name = "Amsterdam"]; 1 -> 2 [label = "works_in"]; 1 -> 2 [label = "lives_in"]; }',
        [Gdd(PERSON_CITY(), [], [eq_str(1, "name", "Impossible")])],
        [False],
    ),
    (
        "ParallelEdgesDifferentLabelsPatternNeedsBoth",
        'digraph G { 1 [label = "Person", name = "Misha"]; 2 [label = "City", name = "Amsterdam"]; 1 -> 2 [label = "works_in"]; 1 -> 2 [label = "lives_in"]; }',
        [
            Gdd(
                parse_dot('digraph P { 0 [label = "Person"]; 1 [label = "City"]; 0 -> 1 [label = "works_in"]; 0 -> 1 [label = "lives_in"]; }'),
                [],
                [eq_str(1, "name", "Impossible")],
            )
        ],
        [False],
    ),
    (
        "PatternHasTwoParallelEdgesGraphHasOne",
        'digraph G { 1 [label = "Person", name = "Misha"]; 2 [label = "City", name = "Amsterdam"]; 1 -> 2 [label = "lives_in"]; }',
        [
            Gdd(
                parse_dot('digraph P { 0 [label = "Person"]; 1 [label = "City"]; 0 -> 1 [label = "lives_in"]; 0 -> 1 [label = "works_in"]; }'),
                [],
                [eq_str(1, "name", "Impossible")],
            )
        ],
        [True],
    ),
    (
        "RootWithTwoSuccChildrenOneComponentViolates",
        'digraph G { 1 [label = "root", name = "v"]; 2 [label = "succ", name = "l"]; 3 [label = "succ", name = "r"]; 1 -> 2 [label = "edge"]; 1 -> 3 [label = "edge"]; 4 [label = "root", name = "u"]; 5 [label = "succ", name = "w"]; 4 -> 5 [label = "edge"]; }',
        [
            Gdd(
                parse_dot('digraph P { 1 [label = "root"]; 2 [label = "succ"]; 3 [label = "succ"]; 1 -> 2 [label = "edge"]; 1 -> 3 [label = "edge"]; }'),
                [],
                [attr_attr(2, "name", 3, "name", "edit_distance", "gt", 0.0)],
            )
        ],
        [False],
    ),
    (
        "LargeGraphAllSatisfied",
        LARGE_GOOD,
        [gdd_misha(), gdd_riga(), gdd_vacuous(), gdd_age_relation(), gdd_label_close()],
        [True, True, True, True, True],
    ),
    (
        "LargeGraphDetectsViolation",
        LARGE_VIOLATION,
        [gdd_misha(), gdd_riga(), gdd_vacuous(), gdd_age_relation(), gdd_label_close()],
        [False, True, True, True, True],
    ),
    (
        "UsesCustomAttributesAndLabel",
        LARGE_GOOD,
        [gdd_label_close()],
        [True],
    ),
    (
        "EmptyMatchSetIsSatisfied",
        'digraph G { 1 [label="Person", name="Misha"]; 2 [label="Person", name="Bob"]; 1 -> 2 [label="friend"]; }',
        [gdd_company()],
        [True],
    ),
    (
        "DblpStrongHoldsWeakFails",
        DBLP,
        [gdd_dblp_weak(), gdd_dblp_strong()],
        [False, True],
    ),
]


@pytest.mark.parametrize(
    "name,graph_dot,gdds,expected", CASES, ids=[c[0] for c in CASES]
)
def test_gdd_validator_cases(spark, name, graph_dot, gdds, expected):
    vertices, edges = graph_frames(spark, parse_dot(graph_dot))
    verdicts = [ok for _g, ok in gdd_check(vertices, edges, gdds)]
    assert verdicts == expected


def test_counterexample_rows_shape(spark):
    # LargeGraphDetectsViolation's bad GDD yields a counterexample whose
    # columns replay BuildCounterexample (sorted by pattern vertex id)
    vertices, edges = graph_frames(spark, parse_dot(LARGE_VIOLATION))
    rows = gdd_violations(vertices, edges, gdd_misha()).collect()
    assert len(rows) >= 1
    row = rows[0].asDict()
    assert row["pattern_id_0"] == 0 and row["pattern_id_1"] == 1
    assert row["graph_label_0"] == "Person"
    assert row["graph_attrs_0"]["name"] == "Misha"
    assert row["graph_label_1"] == "City"


def test_relation_rel_rel_constraint(spark):
    # gdd.cpp SatisfiesRelationConstraint branch 2: both tokens relations,
    # same label, intersecting target sets
    g = parse_dot(
        'digraph G { 1 [label="A"]; 2 [label="A"]; 9 [label="T"]; '
        '1 -> 9 [label="r"]; 2 -> 9 [label="r"]; }'
    )
    vertices, edges = graph_frames(spark, g)
    pattern = parse_dot(
        'digraph P { 0 [label="A"]; 1 [label="A"]; }'
    )
    shared = Gdd(
        pattern,
        [],
        [GddConstraint(RelToken(0, "r"), RelToken(1, "r"), 0.0, "abs_diff", "eq")],
    )
    # every pair of A-vertices shares the target 9 -> holds
    assert gdd_check(vertices, edges, [shared])[0][1]
    mismatched = Gdd(
        pattern,
        [],
        [GddConstraint(RelToken(0, "r"), RelToken(1, "s"), 0.0, "abs_diff", "eq")],
    )
    # different relation names can never match (LabelsMatch gate)
    assert not gdd_check(vertices, edges, [mismatched])[0][1]
