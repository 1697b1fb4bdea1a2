"""GDD (graph differential dependency) validation over vertex/edge DataFrames.

Reference semantics (gdd/gdd.cpp + gdd/gdd_validator/naive_gdd_validator.cpp):

  * The pattern is a DIRECTED graph (gdd_graph_description.h bidirectionalS);
    a match is a label-preserving HOMOMORPHISM: pattern vertices map to
    label-equal graph vertices (possibly the SAME graph vertex for different
    pattern vertices -- naive_gdd_validator.cpp never checks injectivity) and
    every pattern edge must have a same-label graph edge between the images in
    the same direction (AllPatternEdgesArePreserved). Non-edges are NOT
    checked (not induced).
  * Constraints (gdd.h DistanceConstraint) relate two operands -- a constant
    (int/double/string) or a token (pattern-vertex id + attribute name or
    relation name) -- under a metric (absolute numeric difference or
    Levenshtein edit distance), a comparison op and a threshold. Attribute
    name ``id`` resolves to the graph vertex id, ``label`` to its label;
    a missing attribute makes the constraint false (gdd.cpp ResolveScalar).
  * A relation-token LHS switches to relation semantics (gdd.cpp
    SatisfiesRelationConstraint): const RHS -> some out-edge with that label
    ends at the vertex with that id; relation-token RHS -> same label name
    required and the two target sets intersect.
  * Equality compares |dist - threshold| <= machine epsilon (CompareDistance).
  * The GDD HOLDS iff no full match satisfies every LHS constraint while
    failing some RHS constraint; the validator reports a counterexample match
    otherwise (Gdd::Satisfies + NaiveGddValidator::Holds).

Divergence note (documented, fixture-neutral): the reference's kAbsDiff parses
strings with std::stod and THROWS on non-numeric text; this module uses
``try_cast(double)`` so a non-numeric value makes the constraint false instead
of killing the job -- the engine-grade behavior for dirty corpora.

Spark-first design mirrors gfd.py: a join chain over the directed edge frame
(homomorphism makes it strictly simpler -- no injectivity filters, no
anti-joins), constraints compiled to column expressions over the carried
attribute maps, relation constraints as per-vertex target-set joins built from
ONE groupBy over the label-filtered edge frame each.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_validator.graphs.io import GraphData

_EPS = 2.220446049250313e-16


@dataclass(frozen=True)
class AttrToken:
    """gdd.h GddToken with an AttrTag field: pattern vertex id + attribute."""

    pattern_vertex_id: int
    name: str


@dataclass(frozen=True)
class RelToken:
    """gdd.h GddToken with a RelTag field: pattern vertex id + edge label."""

    pattern_vertex_id: int
    name: str


Operand = Union[AttrToken, RelToken, int, float, str]


@dataclass(frozen=True)
class GddConstraint:
    """gdd.h DistanceConstraint."""

    lhs: Operand
    rhs: Operand
    threshold: float = 0.0
    metric: str = "abs_diff"  # 'abs_diff' | 'edit_distance'
    op: str = "le"  # le ge lt gt eq ne

    def __post_init__(self):
        if self.metric not in ("abs_diff", "edit_distance"):
            raise ValueError(f"unknown metric {self.metric!r}")
        if self.op not in ("le", "ge", "lt", "gt", "eq", "ne"):
            raise ValueError(f"unknown op {self.op!r}")


@dataclass
class Gdd:
    """model::Gdd: directed pattern + LHS/RHS constraint lists."""

    pattern: GraphData
    lhs: list[GddConstraint] = field(default_factory=list)
    rhs: list[GddConstraint] = field(default_factory=list)


def _pattern_label(pattern: GraphData, i: int) -> str:
    v = pattern.vertices[i]
    return v.attrs.get("label", v.label)


def gdd_embeddings(
    vertices: DataFrame, edges: DataFrame, pattern: GraphData
) -> DataFrame:
    """All homomorphic matches: one row per match with, for each pattern
    vertex index i, columns ``v{i}`` (vid), ``n{i}`` (graph node id),
    ``l{i}`` (label) and ``a{i}`` (attribute map)."""
    from pyspark_validator.graphs.gfd import _join_order

    def candidates(i: int) -> DataFrame:
        label = _pattern_label(pattern, i)
        return vertices.filter(F.col("label").eqNullSafe(F.lit(label))).select(
            F.col("vid").alias(f"v{i}"),
            F.col("node_id").alias(f"n{i}"),
            F.col("label").alias(f"l{i}"),
            F.col("attrs").alias(f"a{i}"),
        )

    frame: DataFrame | None = None
    # the undirected walk plans which joins bind which vertex; direction is
    # re-imposed per edge below (a pattern edge u->w may be walked from w)
    for kind, args in _join_order(pattern):
        if kind == "seed":
            (root,) = args
            c = candidates(root)
            frame = c if frame is None else frame.crossJoin(c)
        elif kind == "extend":
            u, w, ei = args
            a, b, lab = pattern.edges[ei]
            forward = (a, b) == (u, w)  # the walk may traverse u<-w
            step = edges.filter(F.col("label").eqNullSafe(F.lit(lab))).select(
                F.col("src" if forward else "dst").alias(f"__s{w}"),
                F.col("dst" if forward else "src").alias(f"__d{w}"),
            )
            frame = (
                frame.join(step, F.col(f"v{u}") == F.col(f"__s{w}"))
                .join(candidates(w), F.col(f"__d{w}") == F.col(f"v{w}"))
                .drop(f"__s{w}", f"__d{w}")
            )
        else:  # close
            u, w, ei = args
            a, b, lab = pattern.edges[ei]
            forward = (a, b) == (u, w)
            step = edges.filter(F.col("label").eqNullSafe(F.lit(lab))).select(
                F.col("src" if forward else "dst").alias("__cs"),
                F.col("dst" if forward else "src").alias("__cd"),
            )
            frame = frame.join(
                step,
                (F.col(f"v{u}") == F.col("__cs"))
                & (F.col(f"v{w}") == F.col("__cd")),
                "left_semi",
            )
    n = len(pattern.vertices)
    return frame.dropDuplicates([f"v{i}" for i in range(n)])


class _ConstraintCompiler:
    """Compiles GddConstraints into columns over the embedding frame, joining
    in per-vertex relation-target sets on demand (one groupBy per distinct
    relation label, reused across constraints)."""

    def __init__(
        self, vertices: DataFrame, edges: DataFrame, pattern: GraphData
    ):
        self.vertices = vertices
        self.edges = edges
        self.pattern = pattern
        self.pid_to_index = {
            v.node_id: i for i, v in enumerate(pattern.vertices)
        }
        self._target_frames: dict[str, DataFrame] = {}
        self.joins: list[tuple[DataFrame, str, str]] = []
        self._next = 0

    def _targets(self, rel_label: str) -> DataFrame:
        """Per-vid out-neighbour (vid, node_id) target sets for one edge
        label: ONE groupBy over the label-filtered edge frame."""
        if rel_label not in self._target_frames:
            joined = (
                self.edges.filter(F.col("label").eqNullSafe(F.lit(rel_label)))
                .join(
                    self.vertices.select(
                        F.col("vid").alias("dst"),
                        F.col("node_id").alias("__tnid"),
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(
                    F.collect_set("dst").alias("__tvids"),
                    F.collect_set("__tnid").alias("__tnids"),
                )
            )
            self._target_frames[rel_label] = joined
        return self._target_frames[rel_label]

    def _join_targets(self, pid: int, rel_label: str) -> tuple[str, str] | None:
        """Schedule a left join of the rel-label target sets onto the match
        frame keyed by pattern vertex pid; returns the two set column names."""
        idx = self.pid_to_index.get(pid)
        if idx is None:
            return None
        tag = f"__t{self._next}"
        self._next += 1
        tf = self._targets(rel_label).select(
            F.col("src").alias(f"{tag}k"),
            F.col("__tvids").alias(f"{tag}v"),
            F.col("__tnids").alias(f"{tag}n"),
        )
        self.joins.append((tf, f"{tag}k", f"v{idx}"))
        return f"{tag}v", f"{tag}n"

    def _scalar(self, op: Operand) -> Column | None:
        """gdd.cpp ResolveScalar as a column; None = statically unresolvable
        (unknown pattern vertex id -> constraint false)."""
        if isinstance(op, (int, float)):
            return F.lit(op)
        if isinstance(op, str):
            return F.lit(op)
        if isinstance(op, AttrToken):
            idx = self.pid_to_index.get(op.pattern_vertex_id)
            if idx is None:
                return None
            if op.name == "id":
                return F.col(f"n{idx}")
            if op.name == "label":
                return F.col(f"l{idx}")
            return F.col(f"a{idx}")[op.name]
        raise TypeError(f"not a scalar operand: {op!r}")

    def _compare(self, dist: Column, op: str, threshold: float) -> Column:
        t = F.lit(float(threshold))
        if op == "le":
            return dist <= t
        if op == "ge":
            return dist >= t
        if op == "lt":
            return dist < t
        if op == "gt":
            return dist > t
        if op == "eq":
            return F.abs(dist - t) <= F.lit(_EPS)
        return F.abs(dist - t) > F.lit(_EPS)  # ne

    def compile(self, c: GddConstraint) -> Column:
        if isinstance(c.lhs, RelToken):
            return self._compile_relation(c)
        if isinstance(c.rhs, RelToken):
            # gdd.cpp SatisfiesAttributeConstraint would fail to resolve a
            # RelTag scalar; TokenAsRelation only fires on the LHS
            return F.lit(False)
        lhs = self._scalar(c.lhs)
        rhs = self._scalar(c.rhs)
        if lhs is None or rhs is None:
            return F.lit(False)
        if c.metric == "edit_distance":
            if isinstance(c.lhs, (int, float)) or isinstance(
                c.rhs, (int, float)
            ):
                raise ValueError(
                    "Expected string operands for edit distance metric"
                )
            if (isinstance(c.lhs, AttrToken) and c.lhs.name == "id") or (
                isinstance(c.rhs, AttrToken) and c.rhs.name == "id"
            ):
                raise ValueError(
                    "Expected string operands for edit distance metric"
                )
            dist = F.levenshtein(lhs, rhs).cast("double")
            ok = lhs.isNotNull() & rhs.isNotNull()
        else:
            ln = lhs.cast("string").try_cast("double")
            rn = rhs.cast("string").try_cast("double")
            dist = F.abs(ln - rn)
            ok = ln.isNotNull() & rn.isNotNull()
        return ok & self._compare(dist, c.op, c.threshold)

    def _compile_relation(self, c: GddConstraint) -> Column:
        rel: RelToken = c.lhs
        cols = self._join_targets(rel.pattern_vertex_id, rel.name)
        if cols is None:
            return F.lit(False)
        vids_col, nids_col = cols
        if isinstance(c.rhs, RelToken):
            if rel.name != c.rhs.name:
                return F.lit(False)
            other = self._join_targets(c.rhs.pattern_vertex_id, c.rhs.name)
            if other is None:
                return F.lit(False)
            o_vids, _ = other
            return (
                F.col(vids_col).isNotNull()
                & F.col(o_vids).isNotNull()
                & F.arrays_overlap(F.col(vids_col), F.col(o_vids))
            )
        if isinstance(c.rhs, bool) or not isinstance(c.rhs, int):
            raise ValueError("Invalid vertex id (unsuitable type)")
        if c.rhs < 0:
            raise ValueError("Invalid vertex id (negative number)")
        return F.col(nids_col).isNotNull() & F.array_contains(
            F.col(nids_col), F.lit(int(c.rhs))
        )


def gdd_violations(
    vertices: DataFrame, edges: DataFrame, gdd: Gdd
) -> DataFrame:
    """Matches that satisfy every LHS constraint but fail some RHS constraint
    (the counterexamples of NaiveGddValidator::ExistsCounterexample), with the
    match columns ordered by pattern vertex id (BuildCounterexample sort)."""
    emb = gdd_embeddings(vertices, edges, gdd.pattern)
    comp = _ConstraintCompiler(vertices, edges, gdd.pattern)
    lhs_ok = F.lit(True)
    for c in gdd.lhs:
        lhs_ok = lhs_ok & comp.compile(c)
    rhs_ok = F.lit(True)
    for c in gdd.rhs:
        rhs_ok = rhs_ok & comp.compile(c)
    frame = emb
    for tf, key, match_col in comp.joins:
        frame = frame.join(
            tf, F.col(key) == F.col(match_col), "left"
        ).drop(key)
    frame = frame.filter(lhs_ok & ~rhs_ok)
    order = sorted(
        range(len(gdd.pattern.vertices)),
        key=lambda i: gdd.pattern.vertices[i].node_id,
    )
    cols = []
    for i in order:
        pid = gdd.pattern.vertices[i].node_id
        cols += [
            F.lit(pid).alias(f"pattern_id_{pid}"),
            F.col(f"n{i}").alias(f"graph_id_{pid}"),
            F.col(f"l{i}").alias(f"graph_label_{pid}"),
            F.col(f"a{i}").alias(f"graph_attrs_{pid}"),
        ]
    return frame.select(cols)


def gdd_check(
    vertices: DataFrame, edges: DataFrame, gdds: list[Gdd]
) -> list[tuple[Gdd, bool]]:
    """GddValidator verdicts: (gdd, holds) per input; holds when no
    counterexample match exists (LIMIT-1 existence probe per GDD)."""
    out = []
    for gdd in gdds:
        violated = bool(gdd_violations(vertices, edges, gdd).limit(1).take(1))
        out.append((gdd, not violated))
    return out
