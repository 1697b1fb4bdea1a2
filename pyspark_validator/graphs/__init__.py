"""Graph + sequence tier: the reference's GFD/GDD validation, GFD mining,
gSpan frequent-subgraph mining and MaxFEM episode mining, re-expressed
Spark-first over vertex/edge DataFrames (SURVEY.md section 2 items 4, 5, 46).

Reference scope covered (cited per-module by file:line):
  * graph sources: DOT subset + GFD files + gSpan transactional format +
    event-sequence files  (src/core/parser/graph_parser/, fsm/gspan/graph_parser.cpp,
    parser/sequence_parser/file_sequence_parser.cpp)
  * GFD validation  (gfd/gfd_validator/gfd_validator.cpp)
  * GFD mining      (gfd/gfd_miner/gfd_miner.cpp)
  * GDD validation  (gdd/gdd_validator/naive_gdd_validator.cpp, gdd/gdd.cpp)
  * gSpan           (fsm/gspan/gspan.cpp)
  * MaxFEM          (fem/maxfem/maxfem.cpp)
"""

from pyspark_validator.graphs.io import (
    GraphData,
    VertexData,
    parse_dot,
    parse_gfd_text,
    parse_gspan_text,
    parse_sequence_text,
    read_dot,
    read_gfd,
    read_gspan,
    read_sequence,
    write_dot,
    write_gfd,
    graph_frames,
)
from pyspark_validator.graphs.gfd import Gfd, gfd_check, gfd_embeddings
from pyspark_validator.graphs.gdd import (
    AttrToken,
    Gdd,
    GddConstraint,
    RelToken,
    gdd_check,
    gdd_embeddings,
    gdd_violations,
)
from pyspark_validator.graphs.gfd import gfd_violations, satisfied_gfds
from pyspark_validator.graphs.gfd_miner import mine_gfds
from pyspark_validator.graphs.gspan import (
    GspanPattern,
    gspan_edge_supports,
    mine_gspan,
)
from pyspark_validator.graphs.maxfem import (
    event_location_lists,
    mine_max_episodes,
    parallel_episode_supports,
)

__all__ = [
    "GraphData",
    "VertexData",
    "parse_dot",
    "parse_gfd_text",
    "parse_gspan_text",
    "parse_sequence_text",
    "read_dot",
    "read_gfd",
    "read_gspan",
    "read_sequence",
    "write_dot",
    "write_gfd",
    "graph_frames",
    "Gfd",
    "gfd_check",
    "gfd_embeddings",
    "AttrToken",
    "RelToken",
    "GddConstraint",
    "Gdd",
    "gdd_check",
    "gdd_embeddings",
    "gdd_violations",
    "gfd_violations",
    "satisfied_gfds",
    "mine_gfds",
    "GspanPattern",
    "gspan_edge_supports",
    "mine_gspan",
    "event_location_lists",
    "mine_max_episodes",
    "parallel_episode_supports",
]
