"""Property tests for the graph-tier embedding semantics: random small
labeled graphs vs brute-force python oracles.

* GFD embeddings (graphs/gfd.py) must equal the set of INJECTIVE INDUCED
  label/edge-label-preserving maps (boost::vf2_subgraph_iso semantics):
  every pattern edge has a same-label graph edge between the images in
  either direction, and every non-adjacent pattern pair maps to a
  non-adjacent image pair.
* GDD matches (graphs/gdd.py) must equal the set of directed label-preserving
  HOMOMORPHISMS (naive_gdd_validator.cpp): per pattern edge a same-label
  same-direction graph edge, no injectivity, no induced check.

Cases are seeded (deterministic), cover disconnected patterns, self loops,
parallel edges and label collisions, and run as a handful of tiny Spark jobs.
"""

import itertools
import random

import pytest

from pyspark_validator.graphs import gdd_embeddings, gfd_embeddings, graph_frames
from pyspark_validator.graphs.io import GraphData, VertexData


def random_graph(rng, n_min, n_max, n_labels, n_elabels, p_edge, directed):
    n = rng.randint(n_min, n_max)
    g = GraphData(directed=directed)
    for i in range(n):
        lab = f"L{rng.randint(0, n_labels - 1)}"
        g.vertices.append(VertexData(node_id=i, attrs={"label": lab}))
    for u in range(n):
        for v in range(u, n):
            # allow self loops and (sometimes) parallel edges
            for _ in range(2):
                if rng.random() < p_edge:
                    el = f"e{rng.randint(0, n_elabels - 1)}"
                    if directed and rng.random() < 0.5:
                        g.edges.append((v, u, el))
                    else:
                        g.edges.append((u, v, el))
    return g


def brute_gfd_embeddings(pattern: GraphData, graph: GraphData):
    """All injective induced embeddings, enumerated naively."""
    np_, ng = len(pattern.vertices), len(graph.vertices)
    g_adj = {}
    for u, v, lab in graph.edges:
        g_adj.setdefault(frozenset((u, v)), set()).add(lab)

    def adjacent(a, b):
        return frozenset((a, b)) in g_adj

    out = set()
    for images in itertools.permutations(range(ng), np_):
        ok = True
        for i in range(np_):
            if (
                graph.vertices[images[i]].attrs.get("label")
                != pattern.vertices[i].attrs.get("label")
            ):
                ok = False
                break
        if not ok:
            continue
        for u, v, lab in pattern.edges:
            if lab not in g_adj.get(frozenset((images[u], images[v])), ()):
                ok = False
                break
        if not ok:
            continue
        adjacent_pairs = {
            frozenset((u, v)) for u, v, _ in pattern.edges if u != v
        }
        for i in range(np_):
            for j in range(i + 1, np_):
                if frozenset((i, j)) not in adjacent_pairs and adjacent(
                    images[i], images[j]
                ):
                    ok = False
                    break
            if not ok:
                break
        if ok:
            out.add(images)
    return out


def brute_gdd_matches(pattern: GraphData, graph: GraphData):
    """All directed homomorphisms (labels + per-edge label/direction)."""
    np_, ng = len(pattern.vertices), len(graph.vertices)
    g_edges = {}
    for u, v, lab in graph.edges:
        g_edges.setdefault((u, v), set()).add(lab)

    def plabel(i):
        v = pattern.vertices[i]
        return v.attrs.get("label", v.label)

    def glabel(i):
        v = graph.vertices[i]
        return v.attrs.get("label", v.label)

    out = set()
    for images in itertools.product(range(ng), repeat=np_):
        ok = all(glabel(images[i]) == plabel(i) for i in range(np_))
        if not ok:
            continue
        for u, v, lab in pattern.edges:
            if lab not in g_edges.get((images[u], images[v]), ()):
                ok = False
                break
        if ok:
            out.add(images)
    return out


@pytest.mark.parametrize("seed", range(8))
def test_gfd_embeddings_match_bruteforce(spark, seed):
    rng = random.Random(1000 + seed)
    pattern = random_graph(rng, 1, 3, 2, 2, 0.5, directed=False)
    graph = random_graph(rng, 2, 6, 2, 2, 0.4, directed=False)
    vertices, edges = graph_frames(spark, graph)
    n = len(pattern.vertices)
    got = {
        tuple(row[f"v{i}"] for i in range(n))
        for row in gfd_embeddings(vertices, edges, pattern).collect()
    }
    assert got == brute_gfd_embeddings(pattern, graph)


@pytest.mark.parametrize("seed", range(8))
def test_gdd_matches_match_bruteforce(spark, seed):
    rng = random.Random(2000 + seed)
    pattern = random_graph(rng, 1, 3, 2, 2, 0.5, directed=True)
    graph = random_graph(rng, 2, 6, 2, 2, 0.4, directed=True)
    vertices, edges = graph_frames(spark, graph)
    n = len(pattern.vertices)
    got = {
        tuple(row[f"v{i}"] for i in range(n))
        for row in gdd_embeddings(vertices, edges, pattern).collect()
    }
    assert got == brute_gdd_matches(pattern, graph)
