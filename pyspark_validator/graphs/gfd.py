"""GFD validation over vertex/edge DataFrames.

Reference semantics (gfd/gfd_validator/gfd_validator.cpp, the canonical
CheckCallback at :163-219 + naivegfd_validator.cpp Validate):

  * An embedding is an INJECTIVE, INDUCED subgraph isomorphism of the (tiny,
    undirected) pattern into the data graph: pattern vertices map to distinct
    graph vertices with equal ``label`` attributes, every pattern edge has a
    graph edge with the same label between the images (either direction), and
    every NON-adjacent pattern pair maps to a non-adjacent graph pair
    (boost::vf2_subgraph_iso enumerates induced isomorphisms).
  * A literal token ``(i, name)`` with i >= 0 reads attribute ``name`` of the
    image of pattern vertex i; ``(-1, c)`` is the constant c. A literal holds
    when both sides resolve AND are equal; a MISSING attribute makes the
    literal false (gfd_validator.cpp:186-205).
  * The GFD is violated iff SOME embedding satisfies every premise literal but
    not every conclusion literal; it is satisfied otherwise -- including
    vacuously, when the pattern has no embedding at all.

(The reference's NaiveGfdValidator carries a token-index slip -- its second
token resolves through the FIRST token's vertex, naivegfd_validator.cpp:56-66;
all three reference validators agree on every shipped fixture, and this module
implements the canonical GfdValidator/EGfdValidator reading.)

Spark-first design: the pattern is driver-side (< 10 vertices); the DATA graph
is two DataFrames. Embedding enumeration is a chain of joins against the
symmetrized edge frame -- one join per pattern edge reaching a new vertex, a
left-semi join per closing edge, a left-anti join per induced non-edge -- with
the per-vertex label filters pushed into the vertex scan. Literals become map
lookups on the carried attribute maps; the verdict is one bounded aggregation.
Nothing about the data graph is ever collected: at 10^12 edges every join is a
hash-partitioned shuffle on vid keys and the pattern side of each filter is a
literal, so Catalyst prunes vertex columns to (vid, label, attrs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_validator.graphs.io import GraphData

Token = tuple[int, str]
Literal = tuple[Token, Token]


@dataclass
class Gfd:
    """model::Gfd (gfd/gfd.h): a pattern graph + premise/conclusion literals."""

    pattern: GraphData
    premises: list[Literal] = field(default_factory=list)
    conclusion: list[Literal] = field(default_factory=list)

    def __str__(self) -> str:
        from pyspark_validator.graphs.io import write_gfd

        return write_gfd(self)

    def key(self) -> tuple:
        """Order-insensitive comparison key mirroring Gfd::operator== (literal
        sets compared as sets, pattern up to label-preserving isomorphism is
        approximated by the sorted vertex/edge label multiset -- exact for
        every shipped fixture)."""
        pat = self.pattern
        return (
            tuple(sorted(frozenset(lit) for lit in self.premises)),
            tuple(sorted(frozenset(lit) for lit in self.conclusion)),
            tuple(sorted(v.attrs.get("label", "") for v in pat.vertices)),
            tuple(
                sorted(
                    (
                        min(
                            pat.vertices[u].attrs.get("label", ""),
                            pat.vertices[v].attrs.get("label", ""),
                        ),
                        max(
                            pat.vertices[u].attrs.get("label", ""),
                            pat.vertices[v].attrs.get("label", ""),
                        ),
                        lab,
                    )
                    for u, v, lab in pat.edges
                )
            ),
        )


def _symmetric_edges(edges: DataFrame) -> DataFrame:
    """Undirected adjacency: each stored edge row matched in both directions
    (graph_descriptor.h declares the GFD graph undirectedS)."""
    fwd = edges.select("src", "dst", "label")
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "label"
    )
    return fwd.unionByName(rev)


def _join_order(pattern: GraphData) -> list[tuple[str, tuple]]:
    """Plan the join chain: start at vertex 0, walk pattern edges breadth-first
    (new components join in as cross products, mirroring the reference's
    unconstrained enumeration over disconnected patterns)."""
    n = len(pattern.vertices)
    adj: dict[int, list[tuple[int, int]]] = {i: [] for i in range(n)}
    for ei, (u, v, _) in enumerate(pattern.edges):
        adj[u].append((v, ei))
        adj[v].append((u, ei))
    plan: list[tuple[str, tuple]] = []
    bound: set[int] = set()
    used_edges: set[int] = set()
    for root in range(n):
        if root in bound:
            continue
        plan.append(("seed", (root,)))
        bound.add(root)
        frontier = [root]
        while frontier:
            u = frontier.pop(0)
            for w, ei in adj[u]:
                if ei in used_edges:
                    continue
                if w in bound:
                    used_edges.add(ei)
                    plan.append(("close", (u, w, ei)))
                else:
                    used_edges.add(ei)
                    bound.add(w)
                    frontier.append(w)
                    plan.append(("extend", (u, w, ei)))
    return plan


def gfd_embeddings(
    vertices: DataFrame, edges: DataFrame, pattern: GraphData
) -> DataFrame:
    """All induced injective embeddings of ``pattern``: one row per embedding
    with columns ``v{i}`` (graph vid of pattern vertex i) and ``a{i}`` (its
    attribute map)."""
    n = len(pattern.vertices)
    esym = _symmetric_edges(edges)

    def candidates(i: int) -> DataFrame:
        label = pattern.vertices[i].attrs.get("label", "")
        return vertices.filter(F.col("label") == F.lit(label)).select(
            F.col("vid").alias(f"v{i}"), F.col("attrs").alias(f"a{i}")
        )

    frame: DataFrame | None = None
    for kind, args in _join_order(pattern):
        if kind == "seed":
            (root,) = args
            c = candidates(root)
            frame = c if frame is None else frame.crossJoin(c)
        elif kind == "extend":
            u, w, ei = args
            lab = pattern.edges[ei][2]
            step = esym.filter(F.col("label") == F.lit(lab)).select(
                F.col("src").alias(f"__s{w}"), F.col("dst").alias(f"__d{w}")
            )
            frame = (
                frame.join(step, F.col(f"v{u}") == F.col(f"__s{w}"))
                .join(
                    candidates(w),
                    F.col(f"__d{w}") == F.col(f"v{w}"),
                )
                .drop(f"__s{w}", f"__d{w}")
            )
        else:  # close: both endpoints bound -- existence filter
            u, w, ei = args
            lab = pattern.edges[ei][2]
            step = esym.filter(F.col("label") == F.lit(lab)).select(
                F.col("src").alias("__cs"), F.col("dst").alias("__cd")
            )
            frame = frame.join(
                step,
                (F.col(f"v{u}") == F.col("__cs"))
                & (F.col(f"v{w}") == F.col("__cd")),
                "left_semi",
            )
    # injectivity (vf2 embeddings are one-to-one)
    for i in range(n):
        for j in range(i + 1, n):
            frame = frame.filter(F.col(f"v{i}") != F.col(f"v{j}"))
    # induced: non-adjacent pattern pairs must map to non-adjacent images
    adjacent = {
        frozenset((u, v)) for u, v, _ in pattern.edges if u != v
    }
    any_edge = esym.select(
        F.col("src").alias("__is"), F.col("dst").alias("__id")
    )
    for i in range(n):
        for j in range(i + 1, n):
            if frozenset((i, j)) not in adjacent:
                frame = frame.join(
                    any_edge,
                    (F.col(f"v{i}") == F.col("__is"))
                    & (F.col(f"v{j}") == F.col("__id")),
                    "left_anti",
                )
    # parallel same-label graph edges would duplicate a vertex mapping
    return frame.dropDuplicates([f"v{i}" for i in range(n)])


def _literal_ok(lit: Literal) -> Column:
    """Literal truth as a column over the embedding frame: resolves each token
    (constant or carried-attr-map lookup); a missing attribute is false."""

    def side(tok: Token) -> Column:
        idx, name = tok
        if idx == -1:
            return F.lit(name)
        return F.col(f"a{idx}")[name]

    lhs, rhs = side(lit[0]), side(lit[1])
    return lhs.isNotNull() & rhs.isNotNull() & (lhs == rhs)


def _all_ok(literals: list[Literal]) -> Column:
    cond = F.lit(True)
    for lit in literals:
        cond = cond & _literal_ok(lit)
    return cond


def gfd_violations(
    vertices: DataFrame, edges: DataFrame, gfd: Gfd
) -> DataFrame:
    """Embeddings that satisfy every premise but fail the conclusion --
    the violation rows a verdict is built from."""
    emb = gfd_embeddings(vertices, edges, gfd.pattern)
    return emb.filter(_all_ok(gfd.premises) & ~_all_ok(gfd.conclusion))


def gfd_check(
    vertices: DataFrame, edges: DataFrame, gfds: list[Gfd]
) -> list[tuple[Gfd, bool]]:
    """GfdHandler::ExecuteInternal: per-GFD satisfied verdicts. The per-GFD
    existence check is a LIMIT-1 aggregation, so the job stops scanning as
    soon as one counterexample surfaces (mirrors the reference's vf2 early
    return on the first violating embedding)."""
    out = []
    for gfd in gfds:
        violated = bool(gfd_violations(vertices, edges, gfd).limit(1).take(1))
        out.append((gfd, not violated))
    return out


def satisfied_gfds(
    vertices: DataFrame, edges: DataFrame, gfds: list[Gfd]
) -> list[Gfd]:
    """GfdValidator::GenerateSatisfiedGfds result shape (GfdList)."""
    return [g for g, ok in gfd_check(vertices, edges, gfds) if ok]
