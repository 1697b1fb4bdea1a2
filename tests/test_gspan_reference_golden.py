"""gSpan parity against the reference's shipped fixtures and unit laws
(src/tests/unit/test_gspan.cpp; graphs under test_input_data/graph_data).

The reference's algorithm tests assert support laws and monotonicity (its
output IDs ride unordered_map iteration order, so it pins no exact listing);
this file adds an exact-set golden for the simple dataset derived by hand
from the gSpan semantics, plus parser-quirk pins mirroring GraphParserTest.
"""

import math

import pytest

from pyspark_validator.graphs import mine_gspan, parse_gspan_text
from pyspark_validator.graphs.io import read_gspan

GRAPH_DATA = "/root/reference/test_input_data/graph_data"


def _mine(spark, name, min_support, **kw):
    graphs = read_gspan(f"{GRAPH_DATA}/{name}")
    return graphs, mine_gspan(spark, graphs, min_support, **kw)


def test_parser_quirks():
    # GraphParserTest: ParseSingleGraph / ParseEmptyGraph /
    # ParseSingleVertexGraph / ParseMultipleGraphs / VertexLabels
    gs = parse_gspan_text("t # 0\nv 0 1\nv 1 2\ne 0 1 1\n")
    assert len(gs) == 1 and gs[0].labels == [1, 2] and gs[0].edges == [(0, 1, 1)]
    gs = parse_gspan_text("t # 0\n")
    assert len(gs) == 1 and gs[0].labels == [] and gs[0].edges == []
    gs = parse_gspan_text("t # 0\nv 0 42\n")
    assert gs[0].labels == [42] and gs[0].edges == []
    gs = parse_gspan_text(
        "t # 0\nv 0 1\nv 1 2\ne 0 1 1\nt # 1\nv 0 3\nv 1 4\nv 2 5\ne 0 1 2\ne 1 2 3\n"
    )
    assert [len(g.labels) for g in gs] == [2, 3]
    assert [len(g.edges) for g in gs] == [1, 2]
    # quirk: an e-line vertex never declared with v gets label 0
    gs = parse_gspan_text("t # 0\nv 0 7\ne 0 1 9\n")
    assert gs[0].labels == [7, 0]


def test_simple_dataset_exact_set(spark):
    # Hand-derived golden at min_support=0.6 (min_sup=3 over 5 graphs):
    # labels 1 and 2 are frequent everywhere; label 3 (graph 2 only) prunes;
    # the 1-1(e1) edge, the 1-2(e2) edge and the 1-1-2 chain are each in
    # graphs {0,1,2,4}; graph 3's lone 1-2(e1) edge is infrequent.
    _gs, pats = _mine(spark, "gspan_test_simple.txt", 0.6)
    got = {(p.dfs_code, p.support, p.graph_ids) for p in pats}
    assert got == {
        (((0, 1, 0, 1, -1),), 5, (0, 1, 2, 3, 4)),
        (((0, 2, 0, 2, -1),), 5, (0, 1, 2, 3, 4)),
        (((0, 1, 1, 1, 1),), 4, (0, 1, 2, 4)),
        (((0, 1, 1, 1, 1), (1, 1, 2, 2, 2)), 4, (0, 1, 2, 4)),
        (((0, 1, 1, 2, 2),), 4, (0, 1, 2, 4)),
    }


def test_high_minimum_support(spark):
    # GSpanTest.HighMinimumSupport: at 1.0 every pattern has support 5
    _gs, pats = _mine(spark, "gspan_test_simple.txt", 1.0)
    assert pats and all(p.support == 5 for p in pats)


def test_support_monotonicity(spark):
    # GSpanTest.LowMinimumSupport
    _gs, lo = _mine(spark, "gspan_test_simple.txt", 0.2)
    _gs, hi = _mine(spark, "gspan_test_simple.txt", 0.8)
    assert len(lo) >= len(hi)


def test_triangle_pattern_mining(spark):
    # GSpanTest.TrianglePatternMining: some pattern with support >= 4
    gs, pats = _mine(spark, "gspan_test_triangle.txt", 0.6)
    min_sup = math.ceil(0.6 * len(gs))
    assert pats and all(p.support >= min_sup for p in pats)
    assert any(p.support >= 4 for p in pats)


def test_chain_pattern_mining(spark):
    # GSpanTest.ChainPatternMining: every pattern support >= 3
    _gs, pats = _mine(spark, "gspan_test_chain.txt", 0.6)
    assert pats and all(p.support >= 3 for p in pats)


def test_max_edges_constraint(spark):
    # GSpanTest.MaxEdgesConstraint
    _gs, small = _mine(
        spark, "gspan_test_simple.txt", 0.4,
        output_single_vertices=False, max_edges=1,
    )
    _gs, large = _mine(
        spark, "gspan_test_simple.txt", 0.4,
        output_single_vertices=False, max_edges=10,
    )
    assert all(len(p.dfs_code) <= 1 for p in small)
    assert len(large) >= len(small)


def test_empty_and_single_vertex_databases(spark):
    # gspan_test_empty: empty transactions -> nothing mined;
    # gspan_test_single_vertex: degree-0 vertices never count toward label
    # support (FindAllOnlyOneVertex skips them), so nothing is frequent
    _gs, pats = _mine(spark, "gspan_test_empty.txt", 0.5)
    assert pats == []
    _gs, pats = _mine(spark, "gspan_test_single_vertex.txt", 0.5)
    assert pats == []


def test_bad_options_raise(spark):
    gs = read_gspan(f"{GRAPH_DATA}/gspan_test_simple.txt")
    with pytest.raises(ValueError):
        mine_gspan(spark, gs, 0.0)
    with pytest.raises(ValueError):
        mine_gspan(spark, gs, 1.5)
    with pytest.raises(ValueError):
        mine_gspan(spark, gs, 0.5, max_edges=0)


def test_to_string_format(spark):
    # FrequentSubgraph::ToString line shape (single-vertex sentinel + edge +
    # membership line)
    _gs, pats = _mine(spark, "gspan_test_simple.txt", 1.0)
    by_code = {p.dfs_code: p for p in pats}
    sv = by_code[((0, 1, 0, 1, -1),)]
    assert sv.to_string() == f"t # {sv.id} * 5\nv 0 1\nx 0 1 2 3 4\n"


def test_mutag_large_graph(spark):
    # GSpanTest.LargeGraph at 0.5: non-empty, every support >= min_sup
    gs, pats = _mine(spark, "gspan_mutag_graph.txt", 0.5)
    min_sup = math.ceil(0.5 * len(gs))
    assert len(pats) >= 1
    assert all(p.support >= min_sup for p in pats)
