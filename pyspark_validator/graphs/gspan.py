"""gSpan frequent-subgraph mining over a transactional graph database.

Reference semantics (fsm/gspan/gspan.cpp, dfscode.h, extended_edge.cpp),
replayed exactly:

  * min_sup = ceil(min_frequency * |raw database|) (ExecuteInternal).
  * Vertex-label census counts a label once per graph, only for vertices with
    degree > 0; infrequent labels are deleted from every graph; frequent ones
    optionally emit single-vertex patterns (FindAllOnlyOneVertex -- their DFS
    code is the sentinel edge <0,0,label,label,-1>).
  * Pair pruning: an (unordered label pair) and an edge label each count once
    per graph; edges whose pair or label is infrequent are removed, then
    isolated vertices (RemoveInfrequentVertexPairs).
  * The search walks canonical DFS codes: extensions come only from the
    rightmost path (backward from the rightmost child to path vertices that
    are not its DFS parent, forward from any path vertex), support is the
    number of database graphs admitting the extension, and a grown code is
    kept only if it is canonical -- the minimal DFS code of its own graph
    (GSpanDFS / EnumerateRightMostExtensions / IsCanonical, with the edge
    order of extended_edge.cpp::SmallerThan).
  * Embeddings are injective on vertices (SubgraphIsomorphisms keeps an
    inverse map for forward growth).

Spark-first design -- the database, not the pattern tree, is the big axis:

  1. label census, pair/edge-label censuses and the single-edge seed census
     are each ONE DataFrame aggregation over the exploded graph frame
     (bounded outputs: one row per label / label pair / seed code);
  2. label- and pair-pruning are a mapInPandas rewrite of the graph rows;
  3. each frequent canonical seed then mines its subtree over its PROJECTED
     database -- the classic distributed-gSpan split -- via one
     applyInPandas(groupBy(seed)) stage, so subtrees run in parallel across
     executors and each task only ever sees the graphs that contain its seed.

Deterministic ordering divergence (documented): the reference iterates
unordered_maps, so its output IDs are hash-order; this module orders
single-vertex patterns by label and DFS extensions by the DFS-code edge
order, making results reproducible. The mined SET (codes, supports, graph
ids) is identical; every shipped gSpan test asserts set/law properties only.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_validator.graphs.io import GspanGraph

# An extended edge is the tuple (v1_id, v1_label, v2_id, v2_label, edge_label)
EE = tuple[int, int, int, int, int]


def _pair_smaller(x1: int, x2: int, y1: int, y2: int) -> bool:
    """ExtendedEdge::PairSmallerThan (extended_edge.cpp:7-18)."""
    x_fwd, y_fwd = x1 < x2, y1 < y2
    if x_fwd and y_fwd:
        return x2 < y2 or (x2 == y2 and x1 > y1)
    if not x_fwd and not y_fwd:
        return x1 < y1 or (x1 == y1 and x2 < y2)
    if x_fwd:
        return x2 <= y1
    return x1 < y2


def _ee_smaller(a: EE, b: EE) -> bool:
    """ExtendedEdge::SmallerThan (extended_edge.cpp:20-27)."""
    if _pair_smaller(a[0], a[2], b[0], b[2]):
        return True
    if a[0] != b[0] or a[2] != b[2]:
        return False
    return (a[1], a[3], a[4]) < (b[1], b[3], b[4])


class _DFSCode:
    """dfscode.h DFSCode: edge list + rightmost path maintenance."""

    __slots__ = ("rightmost", "rightmost_path", "edges")

    def __init__(self):
        self.rightmost = -1
        self.rightmost_path: list[int] = []
        self.edges: list[EE] = []

    def copy(self) -> "_DFSCode":
        c = _DFSCode()
        c.rightmost = self.rightmost
        c.rightmost_path = list(self.rightmost_path)
        c.edges = list(self.edges)
        return c

    def add(self, ee: EE) -> None:
        if not self.edges:
            self.rightmost = 1
            self.rightmost_path = [0, 1]
        else:
            id1, id2 = ee[0], ee[2]
            if id1 < id2:
                self.rightmost = id2
                while self.rightmost_path and self.rightmost_path[-1] > id1:
                    self.rightmost_path.pop()
                self.rightmost_path.append(id2)
        self.edges.append(ee)

    def not_pre_of_rm(self, vertex: int) -> bool:
        if len(self.rightmost_path) <= 1:
            return True
        return vertex != self.rightmost_path[-2]

    def on_rm_path(self, vertex: int) -> bool:
        return vertex in self.rightmost_path

    def contains_edge(self, v1: int, v2: int) -> bool:
        return any(
            (e[0] == v1 and e[2] == v2) or (e[0] == v2 and e[2] == v1)
            for e in self.edges
        )

    def vertex_labels(self) -> list[int]:
        id_to_label: dict[int, int] = {}
        for e in self.edges:
            id_to_label[e[0]] = e[1]
            id_to_label[e[2]] = e[3]
        out, i = [], 0
        while i in id_to_label:
            out.append(id_to_label[i])
            i += 1
        return out


class _KGraph:
    """Adjacency-list kernel graph (the per-task projected-database unit)."""

    __slots__ = ("labels", "adj", "edge_labels", "label_to_vertices")

    def __init__(self, labels: list[int], edges: list[tuple[int, int, int]]):
        self.labels = labels
        self.adj: list[list[tuple[int, int]]] = [[] for _ in labels]
        self.edge_labels: dict[frozenset, set[int]] = {}
        for u, v, el in edges:
            self.adj[u].append((v, el))
            if v != u:
                self.adj[v].append((u, el))
            self.edge_labels.setdefault(frozenset((u, v)), set()).add(el)
        self.label_to_vertices: dict[int, list[int]] = {}
        for i, lab in enumerate(labels):
            self.label_to_vertices.setdefault(lab, []).append(i)

    def has_edge_label(self, u: int, v: int, el: int) -> bool:
        return el in self.edge_labels.get(frozenset((u, v)), ())


def _isomorphisms(code: _DFSCode, g: _KGraph) -> list[dict[int, int]]:
    """gspan.cpp SubgraphIsomorphisms: forward edges extend (injectively),
    backward edges filter."""
    start_label = code.edges[0][1]
    isos = [{0: v} for v in g.label_to_vertices.get(start_label, [])]
    for v1, _l1, v2, l2, el in code.edges:
        out = []
        for iso in isos:
            m1 = iso[v1]
            if v1 < v2:
                mapped = set(iso.values())
                for nbr, nel in g.adj[m1]:
                    if l2 == g.labels[nbr] and nbr not in mapped and el == nel:
                        t = dict(iso)
                        t[v2] = nbr
                        out.append(t)
            else:
                if g.has_edge_label(m1, iso[v2], el):
                    out.append(iso)
        isos = out
    return isos


def _extensions(code: _DFSCode, g: _KGraph) -> set[EE]:
    """gspan.cpp EnumerateRightMostExtensions over one graph."""
    out: set[EE] = set()
    if not code.edges:
        for v in range(len(g.labels)):
            for nbr, el in g.adj[v]:
                vl, nl = g.labels[v], g.labels[nbr]
                ee = (0, vl, 1, nl, el) if vl < nl else (0, nl, 1, vl, el)
                out.add(ee)
        return out
    rightmost = code.rightmost
    for iso in _isomorphisms(code, g):
        inv = {gv: did for did, gv in iso.items()}
        mr = iso[rightmost]
        mr_label = g.labels[mr]
        # backward from the rightmost child
        for nbr, el in g.adj[mr]:
            if nbr not in inv:
                continue
            inverted = inv[nbr]
            if (
                code.on_rm_path(inverted)
                and code.not_pre_of_rm(inverted)
                and not code.contains_edge(rightmost, inverted)
            ):
                out.add((rightmost, mr_label, inverted, g.labels[nbr], el))
        # forward from rightmost-path vertices
        for vertex in code.rightmost_path:
            mv = iso[vertex]
            mv_label = g.labels[mv]
            for nbr, el in g.adj[mv]:
                if nbr not in inv:
                    out.add((vertex, mv_label, rightmost + 1, g.labels[nbr], el))
    return out


def _graph_from_code(code: _DFSCode) -> _KGraph:
    labels = code.vertex_labels()
    edges = [(e[0], e[2], e[4]) for e in code.edges]
    return _KGraph(labels, edges)


def _is_canonical(code: _DFSCode) -> bool:
    """gspan.cpp IsCanonical: replay the minimal-extension construction on the
    code's own graph and demand it never undercut the candidate code."""
    canon = _DFSCode()
    canon_graph = _graph_from_code(code)
    for i in range(len(code.edges)):
        exts = _extensions(canon, canon_graph)
        if not exts:
            return False
        min_ee = None
        for ee in exts:
            if min_ee is None or _ee_smaller(ee, min_ee):
                min_ee = ee
        if _ee_smaller(min_ee, code.edges[i]):
            return False
        canon.add(min_ee)
    return True


def _mine_subtree(
    seed: EE,
    graphs: dict[int, _KGraph],
    min_sup: int,
    max_edges: int,
    out: list[tuple[list[EE], list[int]]],
) -> None:
    """The projected-database subtree under one canonical frequent seed
    (GSpanDFS restricted to codes extending the seed); extensions iterated in
    deterministic edge order."""
    code = _DFSCode()
    code.add(seed)

    def dfs(c: _DFSCode, ids: set[int]) -> None:
        if len(c.edges) == max_edges:
            return
        ext: dict[EE, set[int]] = {}
        for gid in ids:
            for ee in _extensions(c, graphs[gid]):
                ext.setdefault(ee, set()).add(gid)
        for ee in sorted(ext):
            new_ids = ext[ee]
            if len(new_ids) >= min_sup:
                nc = c.copy()
                nc.add(ee)
                if _is_canonical(nc):
                    out.append((list(nc.edges), sorted(new_ids)))
                    dfs(nc, new_ids)

    dfs(code, set(graphs))


@dataclass
class GspanPattern:
    """frequent_subgraph.h FrequentSubgraph."""

    id: int
    dfs_code: tuple[EE, ...]
    graph_ids: tuple[int, ...]  # original ids, sorted
    support: int

    def to_string(self) -> str:
        """FrequentSubgraph::ToString (the WriteGraphs line format)."""
        lines = [f"t # {self.id} * {self.support}"]
        if len(self.dfs_code) == 1:
            ee = self.dfs_code[0]
            if ee[4] == -1:
                lines.append(f"v 0 {ee[1]}")
            else:
                lines.append(f"v 0 {ee[1]}")
                lines.append(f"v 1 {ee[3]}")
                lines.append(f"e 0 1 {ee[4]}")
        else:
            code = _DFSCode()
            for ee in self.dfs_code:
                code.add(ee)
            for j, lab in enumerate(code.vertex_labels()):
                lines.append(f"v {j} {lab}")
            for ee in self.dfs_code:
                lines.append(f"e {ee[0]} {ee[2]} {ee[4]}")
        lines.append("x " + " ".join(str(i) for i in self.graph_ids))
        return "\n".join(lines) + "\n"


def gspan_edge_supports(edge_rows: DataFrame) -> DataFrame:
    """The seed census as a standalone DataFrame operator: input rows
    (graph_id, src_label, dst_label, edge_label), one per stored edge; output
    one row per normalized single-edge pattern (v1_label <= v2_label, the
    empty-code extension normalization of EnumerateRightMostExtensions) with
    its gSpan support = number of distinct graphs containing it. One shuffle,
    map-side combined."""
    return (
        edge_rows.select(
            "graph_id",
            F.least("src_label", "dst_label").alias("v1_label"),
            F.greatest("src_label", "dst_label").alias("v2_label"),
            "edge_label",
        )
        .groupBy("v1_label", "v2_label", "edge_label")
        .agg(F.count_distinct("graph_id").alias("support"))
    )


_GRAPH_SCHEMA = (
    "gidx long, original_id long, labels string, edges string"
)


def _graphs_to_frame(spark: SparkSession, graphs: list[GspanGraph]) -> DataFrame:
    rows = [
        (i, g.graph_id, json.dumps(g.labels), json.dumps(g.edges))
        for i, g in enumerate(graphs)
    ]
    return spark.createDataFrame(rows, _GRAPH_SCHEMA)


def mine_gspan(
    spark: SparkSession,
    graphs: list[GspanGraph],
    min_support: float,
    output_single_vertices: bool = True,
    max_edges: int | None = None,
) -> list[GspanPattern]:
    """GSpan::MineSubgraphs, Spark-staged as documented in the module
    docstring. ``min_support`` is the frequency in (0, 1] (kGSpanMinimumSupport);
    ``max_edges`` caps pattern size (kMaxNumberOfEdges)."""
    if not 0.0 < min_support <= 1.0:
        raise ValueError(
            "Minimum support must be a value between 0 (exclusive) and 1 "
            "(inclusive)."
        )
    if max_edges is not None and max_edges <= 0:
        raise ValueError("Maximum number of edges must be a positive integer.")
    max_edges = max_edges if max_edges is not None else (1 << 31) - 1
    min_sup = math.ceil(min_support * len(graphs))

    frame = _graphs_to_frame(spark, graphs)

    def explode_vertices(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for gidx, labels_s, edges_s in zip(
                pdf["gidx"], pdf["labels"], pdf["edges"]
            ):
                labels = json.loads(labels_s)
                edges = json.loads(edges_s)
                deg = [0] * len(labels)
                for u, v, _el in edges:
                    deg[u] += 1
                    deg[v] += 1
                seen = set()
                for i, lab in enumerate(labels):
                    if deg[i] != 0 and lab not in seen:
                        seen.add(lab)
                        rows.append((gidx, lab))
            yield pd.DataFrame(rows, columns=["gidx", "label"])

    # 1. vertex-label census (one aggregation; labels counted once per graph,
    #    degree-0 vertices excluded -- FindAllOnlyOneVertex)
    label_rows = (
        frame.mapInPandas(explode_vertices, "gidx long, label long")
        .groupBy("label")
        .agg(F.collect_set("gidx").alias("gidxs"))
        .collect()
    )
    label_support = {int(r["label"]): sorted(r["gidxs"]) for r in label_rows}
    frequent_labels = {
        lab for lab, ids in label_support.items() if len(ids) >= min_sup
    }

    patterns: list[GspanPattern] = []
    origin = {i: g.graph_id for i, g in enumerate(graphs)}
    if output_single_vertices:
        for lab in sorted(frequent_labels):
            ids = label_support[lab]
            patterns.append(
                GspanPattern(
                    id=len(patterns),
                    dfs_code=((0, lab, 0, lab, -1),),
                    graph_ids=tuple(sorted(origin[i] for i in ids)),
                    support=len(ids),
                )
            )
    if not frequent_labels:
        return patterns

    freq_bc = spark.sparkContext.broadcast(frequent_labels)

    def prune_labels(pdf_iter):
        keep = freq_bc.value
        for pdf in pdf_iter:
            rows = []
            for gidx, oid, labels_s, edges_s in zip(
                pdf["gidx"], pdf["original_id"], pdf["labels"], pdf["edges"]
            ):
                labels = json.loads(labels_s)
                edges = json.loads(edges_s)
                kept = [i for i, lab in enumerate(labels) if lab in keep]
                remap = {old: new for new, old in enumerate(kept)}
                labels2 = [labels[i] for i in kept]
                edges2 = [
                    (remap[u], remap[v], el)
                    for u, v, el in edges
                    if u in remap and v in remap
                ]
                rows.append(
                    (gidx, oid, json.dumps(labels2), json.dumps(edges2))
                )
            yield pd.DataFrame(
                rows, columns=["gidx", "original_id", "labels", "edges"]
            )

    pruned = frame.mapInPandas(prune_labels, _GRAPH_SCHEMA)
    pruned = pruned.persist()
    try:
        # 2. pair + edge-label censuses (one aggregation each, once per graph)
        def explode_pairs(pdf_iter):
            for pdf in pdf_iter:
                rows = []
                for gidx, labels_s, edges_s in zip(
                    pdf["gidx"], pdf["labels"], pdf["edges"]
                ):
                    labels = json.loads(labels_s)
                    pairs, elabels = set(), set()
                    for u, v, el in json.loads(edges_s):
                        pairs.add(
                            (min(labels[u], labels[v]), max(labels[u], labels[v]))
                        )
                        elabels.add(el)
                    for a, b in pairs:
                        rows.append((gidx, a, b, None))
                    for el in elabels:
                        rows.append((gidx, None, None, el))
                yield pd.DataFrame(
                    rows, columns=["gidx", "l1", "l2", "el"]
                )

        census = (
            pruned.mapInPandas(
                explode_pairs, "gidx long, l1 long, l2 long, el long"
            )
            .groupBy("l1", "l2", "el")
            .agg(F.count_distinct("gidx").alias("sup"))
            .collect()
        )
        pair_sup = {
            (int(r["l1"]), int(r["l2"])): int(r["sup"])
            for r in census
            if r["l1"] is not None
        }
        elabel_sup = {
            int(r["el"]): int(r["sup"]) for r in census if r["el"] is not None
        }
        good_pairs = {p for p, s in pair_sup.items() if s >= min_sup}
        good_elabels = {e for e, s in elabel_sup.items() if s >= min_sup}
        gp_bc = spark.sparkContext.broadcast((good_pairs, good_elabels))

        def prune_pairs(pdf_iter):
            pairs_ok, elabels_ok = gp_bc.value
            for pdf in pdf_iter:
                rows = []
                for gidx, oid, labels_s, edges_s in zip(
                    pdf["gidx"], pdf["original_id"], pdf["labels"], pdf["edges"]
                ):
                    labels = json.loads(labels_s)
                    edges = [
                        (u, v, el)
                        for u, v, el in json.loads(edges_s)
                        if (
                            min(labels[u], labels[v]),
                            max(labels[u], labels[v]),
                        )
                        in pairs_ok
                        and el in elabels_ok
                    ]
                    deg = [0] * len(labels)
                    for u, v, _el in edges:
                        deg[u] += 1
                        deg[v] += 1
                    kept = [i for i in range(len(labels)) if deg[i] > 0]
                    remap = {old: new for new, old in enumerate(kept)}
                    labels2 = [labels[i] for i in kept]
                    edges2 = [(remap[u], remap[v], el) for u, v, el in edges]
                    if labels2:
                        rows.append(
                            (gidx, oid, json.dumps(labels2), json.dumps(edges2))
                        )
                yield pd.DataFrame(
                    rows, columns=["gidx", "original_id", "labels", "edges"]
                )

        active = pruned.mapInPandas(prune_pairs, _GRAPH_SCHEMA).persist()
        try:
            # 3. seed census: the empty-code extensions, one row per
            #    normalized single-edge pattern per graph
            def explode_seeds(pdf_iter):
                for pdf in pdf_iter:
                    rows = []
                    for gidx, labels_s, edges_s in zip(
                        pdf["gidx"], pdf["labels"], pdf["edges"]
                    ):
                        labels = json.loads(labels_s)
                        seeds = set()
                        for u, v, el in json.loads(edges_s):
                            a, b = labels[u], labels[v]
                            seeds.add((min(a, b), max(a, b), el))
                        for a, b, el in seeds:
                            rows.append((gidx, a, b, el))
                    yield pd.DataFrame(
                        rows, columns=["gidx", "l1", "l2", "el"]
                    )

            seed_rows = (
                active.mapInPandas(
                    explode_seeds, "gidx long, l1 long, l2 long, el long"
                )
                .groupBy("l1", "l2", "el")
                .agg(F.collect_set("gidx").alias("gidxs"))
                .collect()
            )
            seeds = {
                (int(r["l1"]), int(r["l2"]), int(r["el"])): sorted(r["gidxs"])
                for r in seed_rows
                if len(r["gidxs"]) >= min_sup
            }
            # order seeds by the DFS-code edge order for determinism
            seed_list = sorted(seeds, key=_seed_sort_key)

            if not seed_list:
                return patterns

            # 4. projected mining: one applyInPandas group per seed
            seed_index = {s: i for i, s in enumerate(seed_list)}
            sm_bc = spark.sparkContext.broadcast(
                (seed_index, min_sup, max_edges)
            )

            def member_rows(pdf_iter):
                s_index, _ms, _me = sm_bc.value
                for pdf in pdf_iter:
                    rows = []
                    for gidx, oid, labels_s, edges_s in zip(
                        pdf["gidx"],
                        pdf["original_id"],
                        pdf["labels"],
                        pdf["edges"],
                    ):
                        labels = json.loads(labels_s)
                        present = set()
                        for u, v, el in json.loads(edges_s):
                            a, b = labels[u], labels[v]
                            key = (min(a, b), max(a, b), el)
                            if key in s_index:
                                present.add(s_index[key])
                        for sid in present:
                            rows.append((sid, gidx, oid, labels_s, edges_s))
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "seed_id",
                            "gidx",
                            "original_id",
                            "labels",
                            "edges",
                        ],
                    )

            member_schema = (
                "seed_id long, gidx long, original_id long, "
                "labels string, edges string"
            )
            members = active.mapInPandas(member_rows, member_schema)

            def mine_group(pdf: pd.DataFrame) -> pd.DataFrame:
                s_index, ms, me = sm_bc.value
                inv = {i: s for s, i in s_index.items()}
                sid = int(pdf["seed_id"].iloc[0])
                l1, l2, el = inv[sid]
                seed_ee: EE = (0, l1, 1, l2, el)
                kgraphs = {
                    int(g): _KGraph(json.loads(ls), [tuple(e) for e in json.loads(es)])
                    for g, ls, es in zip(
                        pdf["gidx"], pdf["labels"], pdf["edges"]
                    )
                }
                out: list[tuple[list[EE], list[int]]] = []
                if me > 1:
                    _mine_subtree(seed_ee, kgraphs, ms, me, out)
                rows = [
                    (
                        sid,
                        i,
                        json.dumps(code),
                        json.dumps(ids),
                        len(ids),
                    )
                    for i, (code, ids) in enumerate(out)
                ]
                return pd.DataFrame(
                    rows,
                    columns=["seed_id", "ord", "code", "gidxs", "support"],
                )

            mined = members.groupBy("seed_id").applyInPandas(
                mine_group,
                "seed_id long, ord long, code string, gidxs string, "
                "support long",
            )
            mined_rows = mined.collect()
        finally:
            active.unpersist()
    finally:
        pruned.unpersist()

    by_seed: dict[int, list] = {}
    for r in mined_rows:
        by_seed.setdefault(int(r["seed_id"]), []).append(r)
    for sid, (l1, l2, el) in enumerate(seed_list):
        ids = seeds[(l1, l2, el)]
        patterns.append(
            GspanPattern(
                id=len(patterns),
                dfs_code=((0, l1, 1, l2, el),),
                graph_ids=tuple(sorted(origin[i] for i in ids)),
                support=len(ids),
            )
        )
        for r in sorted(by_seed.get(sid, []), key=lambda r: int(r["ord"])):
            code = tuple(tuple(e) for e in json.loads(r["code"]))
            gidxs = json.loads(r["gidxs"])
            patterns.append(
                GspanPattern(
                    id=len(patterns),
                    dfs_code=code,
                    graph_ids=tuple(sorted(origin[i] for i in gidxs)),
                    support=int(r["support"]),
                )
            )
    return patterns


def _seed_sort_key(s: tuple[int, int, int]):
    return (s[0], s[1], s[2])
