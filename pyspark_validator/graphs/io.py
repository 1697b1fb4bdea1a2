"""Graph / sequence sources: the DOT subset the reference's graph parsers read,
the gSpan transactional graph format, and the timed event-sequence format.

Reference parity (all public, shipped with the reference):
  * DOT graphs + GFD files: src/core/parser/graph_parser/gfd_graph_parser.cpp
    (boost read_graphviz with a dynamic attribute map; vertex 'node_id' is the
    DOT node name, every other a-list entry lands in Vertex::attributes) and
    gdd_graph_parser.cpp (same, but 'label' is hoisted out of the attribute
    map into VertexProperties::label and node_id must parse as an integer).
  * GFD file layout: line 1 = premise literals, line 2 = conclusion literals,
    rest = DOT pattern (graph_parser.h ReadGfd). A literal token is
    ``<vertex>.<name>`` or a bare constant; tokens are joined by '='
    (gfd_graph_parser.cpp ParseLiterals).
  * gSpan transactional format: ``t # <id>`` / ``v <id> <label>`` /
    ``e <u> <v> <label>`` blocks (fsm/gspan/graph_parser.cpp ReadGraphs --
    including its quirks: vertices first seen on an ``e`` line get label 0,
    and a ``t`` block with no lines is an empty graph).
  * Sequence files: one event set per line, events space-separated, optional
    ``|timestamp`` suffix; implicit timestamps are 0-based line numbers and
    mixing the two styles raises (parser/sequence_parser/file_sequence_parser.cpp).

Scale note: parse_* work on strings (patterns, GFD files and test fixtures are
tiny); `read_*` wrap them for paths. `graph_frames` lifts a parsed graph into
(vertices, edges) DataFrames -- the scale-bearing representation every check in
this subpackage operates on. A trillion-edge deployment would land vertices and
edges directly as parquet/Iceberg tables of exactly that shape and never go
through the DOT text path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class VertexData:
    node_id: int
    attrs: dict[str, str] = field(default_factory=dict)
    #: gdd-style hoisted label (gdd_graph_parser.cpp:74-80); for gfd-style
    #: graphs the label stays inside ``attrs['label']`` and this mirrors it.
    label: str = ""


@dataclass
class GraphData:
    directed: bool = False
    vertices: list[VertexData] = field(default_factory=list)
    #: (src_index, dst_index, label) -- indices into ``vertices`` in first
    #: appearance order (boost vecS vertex descriptors).
    edges: list[tuple[int, int, str]] = field(default_factory=list)

    def vertex_index(self, name: int) -> int:
        for i, v in enumerate(self.vertices):
            if v.node_id == name:
                return i
        raise KeyError(name)


_IDENT = r'"[^"]*"|[A-Za-z0-9_.\-]+'
_EDGE_RE = re.compile(
    rf"^\s*({_IDENT})\s*(--|->)\s*({_IDENT})\s*(?:\[(.*)\])?\s*$", re.S
)
_VERTEX_RE = re.compile(rf"^\s*({_IDENT})\s*(?:\[(.*)\])?\s*$", re.S)
_ATTR_RE = re.compile(rf'\s*([A-Za-z0-9_]+)\s*=\s*("[^"]*"|[^,\s\]]+)\s*,?')


def _unquote(tok: str) -> str:
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] == '"' and tok[-1] == '"':
        return tok[1:-1]
    return tok


def _parse_attrs(text: str | None) -> dict[str, str]:
    if not text:
        return {}
    return {m.group(1): _unquote(m.group(2)) for m in _ATTR_RE.finditer(text)}


def parse_dot(text: str) -> GraphData:
    """Parse the DOT subset every shipped reference graph uses: a single
    (di)graph block of one-statement-per-';' vertex/edge lines with optional
    ``[k=v, ...]`` attribute lists (quoted or bare values, commas optional)."""
    head, _, body = text.partition("{")
    if not _:
        raise ValueError("not a DOT graph: missing '{'")
    directed = "digraph" in head
    body = body[: body.rfind("}")]
    g = GraphData(directed=directed)
    index: dict[int, int] = {}

    def intern(name_tok: str) -> int:
        name = int(_unquote(name_tok))
        if name not in index:
            index[name] = len(g.vertices)
            g.vertices.append(VertexData(node_id=name))
        return index[name]

    for stmt in body.split(";"):
        stmt = stmt.strip()
        if not stmt:
            continue
        em = _EDGE_RE.match(stmt)
        if em:
            u = intern(em.group(1))
            v = intern(em.group(3))
            attrs = _parse_attrs(em.group(4))
            g.edges.append((u, v, attrs.get("label", "")))
            continue
        vm = _VERTEX_RE.match(stmt)
        if vm:
            i = intern(vm.group(1))
            g.vertices[i].attrs.update(_parse_attrs(vm.group(2)))
            continue
        raise ValueError(f"unparseable DOT statement: {stmt!r}")
    for v in g.vertices:
        v.label = v.attrs.get("label", "")
    return g


def _quote(tok: str) -> str:
    """boost write_graphviz quoting: bare only for simple identifiers/numbers."""
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*|-?(\.[0-9]+|[0-9]+(\.[0-9]*)?)", tok):
        return tok
    return '"' + tok.replace('"', '\\"') + '"'


def write_dot(g: GraphData) -> str:
    """Serialize in the reference's WriteGraph shape (attributes_writer +
    label_writer): ``<i>[k=v ...];`` vertex lines then ``i--j [label=x];``."""
    lines = ["digraph G {" if g.directed else "graph G {"]
    arrow = "->" if g.directed else "--"
    for i, v in enumerate(g.vertices):
        attrs = " ".join(f"{k}={_quote(val)}" for k, val in sorted(v.attrs.items()))
        lines.append(f"{i}[{attrs}];" if attrs else f"{i};")
    for u, v, label in g.edges:
        lines.append(f"{u}{arrow}{v} [label={_quote(label)}];")
    lines.append("}")
    return "\n".join(lines) + "\n"


# --------------------------------------------------------------------------
# GFD files (literals header + DOT pattern)
# --------------------------------------------------------------------------


def _parse_literal_line(line: str) -> list[tuple[tuple[int, str], tuple[int, str]]]:
    """gfd_graph_parser.cpp ParseLiterals: space-separated ``lhs=rhs`` tokens;
    each side is ``<vertex>.<name>`` (vertex index) or a bare constant
    (index -1, the constant IS the name slot)."""
    out = []
    for token in line.strip().split():
        lhs_s, _, rhs_s = token.partition("=")

        def tok(s: str) -> tuple[int, str]:
            head, dot, tail = s.partition(".")
            if dot and head.lstrip("-").isdigit():
                return (int(head), tail)
            return (-1, s)

        out.append((tok(lhs_s), tok(rhs_s)))
    return out


def parse_gfd_text(text: str):
    from pyspark_validator.graphs.gfd import Gfd

    first, _, rest = text.partition("\n")
    second, _, graph_text = rest.partition("\n")
    return Gfd(
        pattern=parse_dot(graph_text),
        premises=_parse_literal_line(first),
        conclusion=_parse_literal_line(second),
    )


def _literal_line(literals) -> str:
    parts = []
    for (i1, n1), (i2, n2) in literals:
        lhs = n1 if i1 == -1 else f"{i1}.{n1}"
        rhs = n2 if i2 == -1 else f"{i2}.{n2}"
        parts.append(f"{lhs}={rhs}")
    return " ".join(parts) + (" " if parts else "")


def write_gfd(gfd) -> str:
    """graph_parser.h WriteGfd: premises line, conclusion line, DOT pattern."""
    return (
        _literal_line(gfd.premises).rstrip() + "\n"
        + _literal_line(gfd.conclusion).rstrip() + "\n"
        + write_dot(gfd.pattern)
    )


# --------------------------------------------------------------------------
# gSpan transactional graphs
# --------------------------------------------------------------------------


@dataclass
class GspanGraph:
    graph_id: int
    #: vertex labels in first-appearance order; -1-free ints
    labels: list[int] = field(default_factory=list)
    #: (u_index, v_index, label)
    edges: list[tuple[int, int, int]] = field(default_factory=list)


def parse_gspan_text(text: str) -> list[GspanGraph]:
    """fsm/gspan/graph_parser.cpp ReadGraphs, quirks preserved: a vertex first
    seen on an ``e`` line is created with label 0; ``v`` lines may re-define an
    id; a bare ``t`` block is an empty graph."""
    graphs: list[GspanGraph] = []
    current: GspanGraph | None = None
    index: dict[int, int] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("t"):
            parts = line.split()
            current = GspanGraph(graph_id=int(parts[2]))
            graphs.append(current)
            index = {}
        elif line.startswith("v") and current is not None:
            _, vid_s, label_s = line.split()[:3]
            vid = int(vid_s)
            if vid not in index:
                index[vid] = len(current.labels)
                current.labels.append(int(label_s))
            else:
                current.labels[index[vid]] = int(label_s)
        elif line.startswith("e") and current is not None:
            _, u_s, v_s, el_s = line.split()[:4]
            for vid in (int(u_s), int(v_s)):
                if vid not in index:
                    index[vid] = len(current.labels)
                    current.labels.append(0)
            current.edges.append((index[int(u_s)], index[int(v_s)], int(el_s)))
    return graphs


# --------------------------------------------------------------------------
# Timed event sequences
# --------------------------------------------------------------------------


def parse_sequence_text(text: str) -> list[tuple[int, list[int]]]:
    """file_sequence_parser.cpp + fem_algorithm.cpp LoadDataInternal: one event
    set per non-blank line, optional ``|ts`` suffix (all-or-nothing across the
    file), events sorted-unique within a line, timestamps strictly increasing;
    implicit timestamps are 0-based NON-BLANK line ordinals. Blank-only lines
    are skipped; empty event sets are dropped AFTER consuming their ordinal."""
    records: list[tuple[int, list[int]]] = []
    explicit: bool | None = None
    line_no = 0
    last_ts: int | None = None
    for raw in text.splitlines():
        if not raw.strip():
            continue
        has_ts = "|" in raw
        if explicit is None:
            explicit = has_ts
        elif explicit != has_ts:
            raise ValueError(
                "Inconsistent sequence data in file: mixed explicit and "
                "implicit timestamps."
            )
        if has_ts:
            events_part, _, ts_part = raw.partition("|")
            ts = int(ts_part)
        else:
            events_part, ts = raw, line_no
        line_no += 1
        events = [int(t) for t in events_part.split()]
        if not events:
            continue
        if any(b <= a for a, b in zip(events, events[1:])):
            raise ValueError(
                "Events in a transaction are not sorted or contain duplicates."
            )
        if last_ts is not None and ts <= last_ts:
            raise ValueError(
                "Sequence data is not sorted by timestamp or contains duplicates."
            )
        last_ts = ts
        records.append((ts, events))
    return records


# --------------------------------------------------------------------------
# file wrappers + DataFrame lift
# --------------------------------------------------------------------------


def _read(path) -> str:
    with open(path, "r", encoding="utf-8") as f:
        return f.read()


def read_dot(path) -> GraphData:
    return parse_dot(_read(path))


def read_gfd(path):
    return parse_gfd_text(_read(path))


def read_gspan(path) -> list[GspanGraph]:
    return parse_gspan_text(_read(path))


def read_sequence(path) -> list[tuple[int, list[int]]]:
    return parse_sequence_text(_read(path))


_VERTEX_SCHEMA = T.StructType(
    [
        T.StructField("vid", T.LongType(), False),
        T.StructField("node_id", T.LongType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("label", T.StringType(), True),
    ]
)


def graph_frames(
    spark: SparkSession, g: GraphData
) -> tuple[DataFrame, DataFrame]:
    """Lift a parsed graph into the engine's scale representation: a vertices
    DataFrame (vid, node_id, label, attrs map) and an edges DataFrame
    (src, dst, label) keyed by vid. At deployment scale these two tables come
    straight from parquet/Iceberg; every validator below only ever sees the
    frames, never the parsed object."""
    v_rows = [
        (i, int(v.node_id), v.attrs.get("label", v.label), dict(v.attrs))
        for i, v in enumerate(g.vertices)
    ]
    e_rows = [(int(u), int(v), lab) for u, v, lab in g.edges]
    vertices = spark.createDataFrame(v_rows, _VERTEX_SCHEMA)
    edges = spark.createDataFrame(e_rows, _EDGE_SCHEMA)
    return vertices, edges
