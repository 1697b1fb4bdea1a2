"""GFD mining: the reference's frequent-pattern + literal-rule walk
(gfd/gfd_miner/gfd_miner.cpp, "Discovering Graph Functional Dependencies",
Fan et al., SIGMOD'18), replayed exactly -- including its load-bearing quirks:

  * Initialize (gfd_miner.cpp:668-717): one single-vertex pattern per distinct
    vertex label (first-appearance order), its embeddings = all vertices of
    that label; attrs_info collects per-label attribute value sets.
  * Support (gfd_miner.cpp:110-121): min over pattern vertices of the number
    of DISTINCT graph images; an embedding-less pattern falls back to |V|.
  * AddEdge (gfd_miner.cpp:233-276): each round adds an edge ONLY at the
    first vertex pair without one (pairs (i<j) in subset order, then self
    loops), once per known edge label; an embedding survives when ANY edge
    connects its images -- the reference does not re-check the label here.
  * AddVertex (gfd_miner.cpp:278-334): grow by (edge label x vertex label x
    attach point); a graph neighbour is skipped when it is already the image
    of a pattern NEIGHBOUR of the attach point (local, not global,
    injectivity), and the edge label is read off the FIRST graph edge
    between the pair.
  * TryAddPattern/UpdateExisted (gfd_miner.cpp:171-231): a new pattern
    label-isomorphic to an already-spawned one is dropped, its forbidden
    rules translated through the isomorphism and merged.
  * GenerateLiterals (gfd_miner.cpp:561-630): variable literals for vertex
    pairs whose attribute value sets intersect, constant literals per vertex
    attribute value; only literals satisfied by >= sigma embeddings survive
    (a missing attribute falsifies a literal).
  * GenerateRules (gfd_miner.cpp:495-550): breadth-first LHS-subset walk with
    three prunes -- forbidden rules inherited from ancestor patterns,
    reversed-rule subsumption (a found rule blocks superset LHSes for the
    same RHS), and deadlocks (a found rule's literal set, and any infrequent
    LHS, stops growth). A rule is valid when its LHS embeddings are a subset
    of the RHS's AND the LHS embedding set is sigma-frequent by Support.
  * AddCompacted (gfd_miner.cpp:432-451): rules sorted, same-LHS conclusions
    merged into one GFD; the merged rules become forbidden for descendants.

Scale note: the pattern/literal/rule lattice is bounded by k and the label
alphabet -- driver-sized. The data-sized object is the embedding table of
each pattern; this module keeps it as a numpy index matrix and evaluates
literal satisfaction vectorized per column. At corpus scale the same
embedding tables are exactly the join-chain frames of graphs/gfd.py
(one join per added edge/vertex) with literal columns as map lookups, and
Support becomes per-vertex approx_count_distinct -- the walk itself does not
change shape. Fixture parity is asserted against the reference's shipped
expected-GFD .dot files (test_gfd_miner.cpp goldens).
"""

from __future__ import annotations

from pyspark_validator.graphs.gfd import Gfd, Literal
from pyspark_validator.graphs.io import GraphData, VertexData


class _HostGraph:
    def __init__(self, g: GraphData):
        self.n = len(g.vertices)
        self.labels = [v.attrs.get("label", "") for v in g.vertices]
        self.attrs = [dict(v.attrs) for v in g.vertices]
        self.adj: list[set[int]] = [set() for _ in range(self.n)]
        self.first_label: dict[tuple[int, int], str] = {}
        for u, v, lab in g.edges:
            self.adj[u].add(v)
            self.adj[v].add(u)
            self.first_label.setdefault((u, v), lab)
            self.first_label.setdefault((v, u), lab)

    def has_edge(self, u: int, v: int) -> bool:
        return v in self.adj[u]

    def edge_first_label(self, u: int, v: int) -> str | None:
        return self.first_label.get((u, v))


class _Pattern:
    """Mirror of the miner's working pattern: vertices carry {'label': ...}
    attrs and node_id == index (Initialize/AddVertex construct them so)."""

    def __init__(self, labels: list[str], edges: list[tuple[int, int, str]]):
        self.labels = list(labels)
        self.edges = list(edges)

    def copy(self) -> "_Pattern":
        return _Pattern(self.labels, self.edges)

    @property
    def n(self) -> int:
        return len(self.labels)

    def has_edge(self, u: int, v: int) -> bool:
        return any(
            (a == u and b == v) or (a == v and b == u)
            for a, b, _ in self.edges
        )

    def neighbors(self, u: int) -> set[int]:
        out = set()
        for a, b, _ in self.edges:
            if a == u:
                out.add(b)
            if b == u:
                out.add(a)
        return out

    def to_graph_data(self) -> GraphData:
        g = GraphData(directed=False)
        for i, lab in enumerate(self.labels):
            g.vertices.append(VertexData(node_id=i, attrs={"label": lab}))
        g.edges = list(self.edges)
        return g


def _pattern_isomorphism(
    a: _Pattern, b: _Pattern
) -> dict[int, int] | None:
    """UpdateExisted's vf2_subgraph_iso(new, existed) with label vertex/edge
    compares: an induced label-preserving injection of a into b (patterns are
    tiny; plain backtracking)."""
    if a.n > b.n:
        return None
    b_adj: dict[tuple[int, int], set[str]] = {}
    for u, v, lab in b.edges:
        b_adj.setdefault((u, v), set()).add(lab)
        b_adj.setdefault((v, u), set()).add(lab)
    mapping: dict[int, int] = {}
    used: set[int] = set()

    def ok(i: int, cand: int) -> bool:
        if b.labels[cand] != a.labels[i]:
            return False
        for u, v, lab in a.edges:
            if u in mapping and v == i:
                if lab not in b_adj.get((mapping[u], cand), ()):
                    return False
            if v in mapping and u == i:
                if lab not in b_adj.get((mapping[v], cand), ()):
                    return False
        # induced: non-adjacent mapped pairs must stay non-adjacent
        for j, img in mapping.items():
            if not a.has_edge(i, j) and (img, cand) in b_adj:
                return False
        return True

    def rec(i: int) -> bool:
        if i == a.n:
            return True
        for cand in range(b.n):
            if cand in used or not ok(i, cand):
                continue
            mapping[i] = cand
            used.add(cand)
            if rec(i + 1):
                return True
            del mapping[i]
            used.remove(cand)
        return False

    return dict(mapping) if rec(0) else None


def _literal_eq(a: Literal, b: Literal) -> bool:
    """comparator.cpp CompareLiterals: equal or swapped."""
    return a == b or (a[0] == b[1] and a[1] == b[0])


def _contains_literal(literals: list[Literal], l: Literal) -> bool:
    return any(_literal_eq(x, l) for x in literals)


def _contains_literals(superset: list[Literal], subset: list[Literal]) -> bool:
    return all(_contains_literal(superset, l) for l in subset)


def _literal_sets_equal(a: list[Literal], b: list[Literal]) -> bool:
    return len(a) == len(b) and _contains_literals(b, a)


Rule = tuple[list[Literal], list[Literal]]


def _translate_literals(
    literals: list[Literal], iso: dict[int, int]
) -> list[Literal]:
    """UpdateRules/ChangeLiterals: vertex indices re-mapped through the
    isomorphism (existing-pattern node ids == indices by construction)."""
    out = []
    for (i1, n1), (i2, n2) in literals:
        j1 = iso[i1] if i1 != -1 else -1
        j2 = iso[i2] if i2 != -1 else -1
        out.append(((j1, n1), (j2, n2)))
    return out


class _MinerState:
    def __init__(self, graph: _HostGraph, k: int, sigma: int):
        self.graph = graph
        self.k = k
        self.sigma = sigma
        self.gfds: list[Gfd] = []
        # label alphabet + per-label attribute value sets (Initialize)
        self.vertex_labels: list[str] = []
        self.edge_labels: list[str] = []
        self.attrs_info: dict[str, dict[str, set[str]]] = {}

    # -- support --------------------------------------------------------

    def support(self, embeddings: list[tuple[int, ...]], n_vertices: int) -> int:
        if not embeddings:
            return self.graph.n
        mins = None
        for i in range(n_vertices):
            size = len({e[i] for e in embeddings})
            mins = size if mins is None else min(mins, size)
        return mins if mins is not None else self.graph.n

    # -- literal machinery ----------------------------------------------

    def literal_satisfied(
        self, lit: Literal, emb: tuple[int, ...]
    ) -> bool:
        def token(tok) -> str | None:
            idx, name = tok
            if idx == -1:
                return name
            return self.graph.attrs[emb[idx]].get(name)

        a, b = token(lit[0]), token(lit[1])
        return a is not None and b is not None and a == b

    def generate_literals(
        self, pattern: _Pattern, embeddings: list[tuple[int, ...]]
    ) -> tuple[list[Literal], dict[Literal, frozenset]]:
        literals: list[Literal] = []
        satisfied: dict[Literal, frozenset] = {}

        def try_add(lit: Literal) -> None:
            sat = frozenset(
                i
                for i, emb in enumerate(embeddings)
                if self.literal_satisfied(lit, emb)
            )
            if len(sat) >= self.sigma:
                satisfied[lit] = sat
                literals.append(lit)

        n = pattern.n
        for fst in range(n):
            for snd in range(fst + 1, n):
                li = self.attrs_info.get(pattern.labels[fst])
                lj = self.attrs_info.get(pattern.labels[snd])
                if li is None or lj is None:
                    continue
                for n1 in sorted(li):
                    for n2 in sorted(lj):
                        if li[n1] & lj[n2]:
                            try_add(((fst, n1), (snd, n2)))
        for i in range(n):
            info = self.attrs_info.get(pattern.labels[i])
            if info is None:
                continue
            for name in sorted(info):
                for value in sorted(info[name]):
                    try_add(((i, name), (-1, value)))
        return literals, satisfied

    # -- rule search (GenerateRules) ------------------------------------

    def generate_rules(
        self,
        literals: list[Literal],
        pattern: _Pattern,
        embeddings: list[tuple[int, ...]],
        forbidden_rules: list[Rule],
        satisfied: dict[Literal, frozenset],
    ) -> list[tuple[list[Literal], Literal]]:
        rules: list[tuple[list[Literal], Literal]] = []
        reversed_rules: dict[int, list[tuple[int, ...]]] = {}
        deadlocks: set[tuple[int, ...]] = set()
        lhs_set: set[tuple[int, ...]] = {()}
        all_idx = frozenset(range(len(embeddings)))

        def freq_of(indices: frozenset) -> bool:
            if not indices:
                # empty embedding set: vertex map empty -> fallback |V|
                return self.graph.n >= self.sigma
            mins = min(
                len({embeddings[i][v] for i in indices})
                for v in range(pattern.n)
            )
            return mins >= self.sigma

        while lhs_set:
            new_lhs_set: set[tuple[int, ...]] = set()
            for lhs_idx in sorted(lhs_set):
                lhs = [literals[i] for i in lhs_idx]
                lhs_sat = all_idx
                for i in lhs_idx:
                    lhs_sat = lhs_sat & satisfied[literals[i]]
                for rhs_i in range(len(literals)):
                    if rhs_i in lhs_idx:
                        continue
                    rhs = literals[rhs_i]
                    if any(
                        _literal_sets_equal(p, lhs)
                        and _contains_literal(c, rhs)
                        for p, c in forbidden_rules
                    ):
                        continue
                    if any(
                        _contains_literals(
                            lhs, [literals[i] for i in prem]
                        )
                        for prem in reversed_rules.get(rhs_i, ())
                    ):
                        continue
                    if satisfied[rhs] >= lhs_sat and freq_of(lhs_sat):
                        deadlock = tuple(sorted(lhs_idx + (rhs_i,)))
                        deadlocks.add(deadlock)
                        reversed_rules.setdefault(rhs_i, []).append(lhs_idx)
                        rules.append((lhs, rhs))
            for lhs_idx in sorted(lhs_set):
                start = (max(lhs_idx) + 1) if lhs_idx else 0
                for i in range(start, len(literals)):
                    cand = lhs_idx + (i,)
                    if any(set(d) <= set(cand) for d in deadlocks):
                        continue
                    sat = all_idx
                    for j in cand:
                        sat = sat & satisfied[literals[j]]
                    if len(sat) >= self.sigma:
                        new_lhs_set.add(cand)
                    else:
                        deadlocks.add(cand)
            lhs_set = new_lhs_set
        return rules

    def add_compacted(
        self,
        rules: list[tuple[list[Literal], Literal]],
        pattern: _Pattern,
        forbidden_rules: list[Rule],
    ) -> None:
        if not rules:
            return
        rules = sorted(rules, key=lambda r: (r[0], r[1]))
        prev = rules[0][0]
        conclusion: list[Literal] = []
        for premises, lit in rules:
            if premises != prev:
                self.gfds.append(
                    Gfd(pattern.to_graph_data(), list(prev), list(conclusion))
                )
                forbidden_rules.append((list(prev), list(conclusion)))
                prev = premises
                conclusion = [lit]
            else:
                conclusion.append(lit)
        self.gfds.append(
            Gfd(pattern.to_graph_data(), list(prev), list(conclusion))
        )
        forbidden_rules.append((list(prev), list(conclusion)))


def mine_gfds(graph: GraphData, k: int, sigma: int) -> list[Gfd]:
    """GfdMiner::MineGfds. ``k`` caps pattern vertices, ``sigma`` is the
    minimum frequency (kGfdK / kGfdSigma)."""
    host = _HostGraph(graph)
    state = _MinerState(host, k, sigma)

    # Initialize
    patterns: list[_Pattern] = []
    embeddings_set: list[list[tuple[int, ...]]] = []
    forbidden_set: list[list[Rule]] = []
    label_to_index: dict[str, int] = {}
    for v in range(host.n):
        label = host.labels[v]
        if label not in state.vertex_labels:
            state.vertex_labels.append(label)
        if label in label_to_index:
            embeddings_set[label_to_index[label]].append((v,))
        else:
            label_to_index[label] = len(patterns)
            patterns.append(_Pattern([label], []))
            embeddings_set.append([(v,)])
            forbidden_set.append([])
        for name, value in host.attrs[v].items():
            if name == "label":
                continue
            state.attrs_info.setdefault(label, {}).setdefault(
                name, set()
            ).add(value)
    for _u, _v, lab in graph.edges:
        if lab not in state.edge_labels:
            state.edge_labels.append(lab)
    state.vertex_labels = sorted(set(state.vertex_labels))
    state.edge_labels = sorted(set(state.edge_labels))

    def filter_supp():
        nonlocal patterns, embeddings_set, forbidden_set
        keep = [
            i
            for i in range(len(patterns))
            if state.support(embeddings_set[i], patterns[i].n) >= sigma
        ]
        patterns = [patterns[i] for i in keep]
        embeddings_set = [embeddings_set[i] for i in keep]
        forbidden_set = [forbidden_set[i] for i in keep]

    filter_supp()

    def try_add_pattern(
        new_pattern: _Pattern,
        new_embeddings: list[tuple[int, ...]],
        forbidden_rules: list[Rule],
        new_patterns: list[_Pattern],
        new_embeddings_set: list[list[tuple[int, ...]]],
        new_forbidden_set: list[list[Rule]],
    ) -> None:
        for idx, existed in enumerate(new_patterns):
            iso = _pattern_isomorphism(new_pattern, existed)
            if iso is not None:
                # merge translated forbidden rules into the existing pattern
                target = new_forbidden_set[idx]
                for prem, concl in forbidden_rules:
                    tp = _translate_literals(prem, iso)
                    tc = _translate_literals(concl, iso)
                    if not any(
                        _literal_sets_equal(tp, p)
                        and _literal_sets_equal(tc, c)
                        for p, c in target
                    ):
                        target.append((tp, tc))
                return
        if new_embeddings:
            new_patterns.append(new_pattern)
            new_embeddings_set.append(new_embeddings)
            new_forbidden_set.append(list(forbidden_rules))

    while patterns:
        # HorizontalSpawn: mine rules on the current patterns
        for i, pattern in enumerate(patterns):
            literals, satisfied = state.generate_literals(
                pattern, embeddings_set[i]
            )
            rules = state.generate_rules(
                literals,
                pattern,
                embeddings_set[i],
                forbidden_set[i],
                satisfied,
            )
            state.add_compacted(rules, pattern, forbidden_set[i])

        new_patterns: list[_Pattern] = []
        new_embeddings_set: list[list[tuple[int, ...]]] = []
        new_forbidden_set: list[list[Rule]] = []
        for i, pattern in enumerate(patterns):
            embeddings = embeddings_set[i]
            forbidden = forbidden_set[i]
            n = pattern.n
            # AddEdge at the FIRST free pair (i<j order, then self loops)
            max_edges = n * (n + 1) // 2 + n
            if len(pattern.edges) != max_edges:
                pairs = [
                    (a, b) for a in range(n) for b in range(a + 1, n)
                ] + [(j, j) for j in range(n)]
                free = next(
                    (p for p in pairs if not pattern.has_edge(*p)), None
                )
                if free is not None:
                    origin, finish = free
                    surviving = [
                        e
                        for e in embeddings
                        if host.has_edge(e[origin], e[finish])
                    ]
                    for lab in state.edge_labels:
                        np_ = pattern.copy()
                        np_.edges.append((origin, finish, lab))
                        try_add_pattern(
                            np_,
                            list(surviving),
                            forbidden,
                            new_patterns,
                            new_embeddings_set,
                            new_forbidden_set,
                        )
            # AddVertex
            if n >= k or n >= host.n:
                continue
            for elab in state.edge_labels:
                for vlab in state.vertex_labels:
                    for u in range(n):
                        new_embeddings = []
                        pat_nbrs = pattern.neighbors(u)
                        for emb in embeddings:
                            gu = emb[u]
                            for nbr in host.adj[gu]:
                                if any(
                                    emb[p] == nbr for p in pat_nbrs
                                ):
                                    continue
                                if host.labels[nbr] != vlab:
                                    continue
                                if host.edge_first_label(gu, nbr) != elab:
                                    continue
                                new_embeddings.append(emb + (nbr,))
                        np_ = pattern.copy()
                        np_.labels.append(vlab)
                        np_.edges.append((u, n, elab))
                        try_add_pattern(
                            np_,
                            new_embeddings,
                            forbidden,
                            new_patterns,
                            new_embeddings_set,
                            new_forbidden_set,
                        )
        patterns = new_patterns
        embeddings_set = new_embeddings_set
        forbidden_set = new_forbidden_set
        filter_supp()

    return state.gfds
