"""gSpan property test: on seeded random graph databases, every mined
pattern's support must equal an INDEPENDENT brute-force subgraph-containment
count (injective label/edge-label-preserving monomorphism -- the embedding
relation gspan.cpp SubgraphIsomorphisms realizes), and every frequent
normalized single-edge pattern must be mined. This cross-checks the DFS-code
kernel (extensions, canonicality, projected supports) against an oracle that
shares none of its machinery."""

import itertools
import math
import random

import pytest

from pyspark_validator.graphs import mine_gspan
from pyspark_validator.graphs.gspan import _DFSCode
from pyspark_validator.graphs.io import GspanGraph


def random_db(rng, n_graphs, n_labels=2, n_elabels=2):
    graphs = []
    for gid in range(n_graphs):
        n = rng.randint(2, 5)
        labels = [rng.randint(0, n_labels - 1) for _ in range(n)]
        edges = []
        for u in range(n):
            for v in range(u + 1, n):
                if rng.random() < 0.5:
                    edges.append((u, v, rng.randint(0, n_elabels - 1)))
        graphs.append(GspanGraph(graph_id=gid, labels=labels, edges=edges))
    return graphs


def code_to_graph(dfs_code):
    """DFS code -> (labels by dfs id, edge list)."""
    code = _DFSCode()
    for ee in dfs_code:
        code.add(ee)
    labels = code.vertex_labels()
    edges = [(e[0], e[2], e[4]) for e in dfs_code]
    return labels, edges


def brute_contains(p_labels, p_edges, g: GspanGraph) -> bool:
    """Any injective map preserving vertex labels and every pattern edge
    (undirected, same edge label)?"""
    g_adj = {}
    for u, v, el in g.edges:
        g_adj.setdefault(frozenset((u, v)), set()).add(el)
    n_p, n_g = len(p_labels), len(g.labels)
    if n_p > n_g:
        return False
    for images in itertools.permutations(range(n_g), n_p):
        if any(g.labels[images[i]] != p_labels[i] for i in range(n_p)):
            continue
        if all(
            el in g_adj.get(frozenset((images[u], images[v])), ())
            for u, v, el in p_edges
        ):
            return True
    return False


@pytest.mark.parametrize("seed", range(5))
def test_mined_supports_match_bruteforce(spark, seed):
    rng = random.Random(3000 + seed)
    db = random_db(rng, n_graphs=6)
    min_support = 0.5
    pats = mine_gspan(spark, db, min_support, output_single_vertices=True)
    min_sup = math.ceil(min_support * len(db))

    for p in pats:
        if p.dfs_code[0][4] == -1:  # single-vertex sentinel
            lab = p.dfs_code[0][1]
            # support = graphs with a DEGREE>0 vertex of this label
            expect = sorted(
                g.graph_id
                for g in db
                if any(
                    g.labels[i] == lab
                    and any(i in (u, v) for u, v, _ in g.edges)
                    for i in range(len(g.labels))
                )
            )
        else:
            labels, edges = code_to_graph(p.dfs_code)
            expect = sorted(
                g.graph_id for g in db if brute_contains(labels, edges, g)
            )
        assert list(p.graph_ids) == expect, p.dfs_code
        assert p.support == len(expect) >= min_sup

    # completeness at the seed level: every frequent normalized single edge
    # must be among the mined size-1 patterns
    seed_support = {}
    for g in db:
        seen = set()
        for u, v, el in g.edges:
            a, b = g.labels[u], g.labels[v]
            seen.add((min(a, b), max(a, b), el))
        for k in seen:
            seed_support[k] = seed_support.get(k, 0) + 1
    mined_seeds = {
        (p.dfs_code[0][1], p.dfs_code[0][3], p.dfs_code[0][4])
        for p in pats
        if len(p.dfs_code) == 1 and p.dfs_code[0][4] != -1
    }
    for (a, b, el), sup in seed_support.items():
        if sup >= min_sup:
            assert (a, b, el) in mined_seeds

    # no two mined patterns share a DFS code (canonicality dedups)
    codes = [p.dfs_code for p in pats]
    assert len(codes) == len(set(codes))
