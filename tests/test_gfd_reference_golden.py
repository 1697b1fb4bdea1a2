"""GFD validation + mining parity against the reference's shipped fixtures.

Sources of truth (all public, shipped with /root/reference):
  * unit goldens: src/tests/unit/test_gfd_validator.cpp (quadrangle satisfied,
    directors violated -- asserted for ALL THREE reference validators, so the
    single canonical semantics here must reproduce both) and
    test_gfd_miner.cpp (six (graph, k, sigma) configs with expected mined
    GFDs shipped as .dot files, compared in order);
  * example-snapshot goldens: examples/test_examples/snapshots pins the
    verifying_gfd1/2/3 holds/does-not-hold verdicts and the exact DOT text of
    the two mined example GFDs (papers k=3 sigma=2, study k=2 sigma=3).
"""

import pytest

from pyspark_validator.graphs import (
    Gfd,
    gfd_check,
    gfd_embeddings,
    graph_frames,
    mine_gfds,
    read_dot,
    read_gfd,
    write_gfd,
)

GRAPH_DATA = "/root/reference/test_input_data/graph_data"
EXAMPLES = "/root/reference/examples/datasets"


def _verdict(spark, graph_path, gfd_path):
    g = read_dot(graph_path)
    gfd = read_gfd(gfd_path)
    vertices, edges = graph_frames(spark, g)
    return gfd_check(vertices, edges, [gfd])[0][1]


def test_trivially_satisfied_quadrangle(spark):
    # test_gfd_validator.cpp TestTrivially: expected GfdList size 1
    assert _verdict(
        spark,
        f"{GRAPH_DATA}/quadrangle.dot",
        f"{GRAPH_DATA}/quadrangle_gfd.dot",
    )


def test_existing_matches_directors(spark):
    # test_gfd_validator.cpp TestExistingMatches: expected GfdList size 0
    assert not _verdict(
        spark,
        f"{GRAPH_DATA}/directors.dot",
        f"{GRAPH_DATA}/directors_gfd.dot",
    )


@pytest.mark.parametrize(
    "graph_file,gfd_file,expected",
    [
        # verifying_gfd1: "GFD holds." then "GFD does not hold."
        ("blogs_graph.dot", "correct_author_gfd.dot", True),
        ("incorrect_author_blogs_graph.dot", "correct_author_gfd.dot", False),
        # verifying_gfd2
        ("blogs_graph.dot", "one_author_gfd.dot", True),
        ("two_authors_blogs_graph.dot", "one_author_gfd.dot", False),
        # verifying_gfd3: "GFD does not hold."
        ("channels_graph.dot", "entertainment_viewer_gfd.dot", False),
    ],
)
def test_verifying_example_snapshots(spark, graph_file, gfd_file, expected):
    assert (
        _verdict(
            spark,
            f"{EXAMPLES}/verifying_gfd/graphs/{graph_file}",
            f"{EXAMPLES}/verifying_gfd/gfds/{gfd_file}",
        )
        is expected
    )


def test_embeddings_are_injective_and_induced(spark):
    # one_author_gfd's two-account pattern must not map both accounts to the
    # same graph account (injectivity); a triangle pattern must not embed
    # into a path (induced non-edge check)
    g = read_dot(f"{EXAMPLES}/verifying_gfd/graphs/blogs_graph.dot")
    vertices, edges = graph_frames(spark, g)
    gfd = read_gfd(f"{EXAMPLES}/verifying_gfd/gfds/one_author_gfd.dot")
    emb = gfd_embeddings(vertices, edges, gfd.pattern).collect()
    n = len(gfd.pattern.vertices)
    for row in emb:
        vids = [row[f"v{i}"] for i in range(n)]
        assert len(set(vids)) == n


@pytest.mark.parametrize(
    "graph_file,k,sigma,expected_files",
    [
        ("blogs_graph.dot", 2, 3, ["blogs_gfd.dot"]),
        ("blogs_graph.dot", 3, 3, ["blogs_gfd.dot"]),
        ("channels_graph.dot", 2, 3, ["channels_gfd.dot"]),
        ("movies_graph.dot", 4, 2, []),
        ("symbols_graph.dot", 2, 5, ["symbols_gfd1.dot", "symbols_gfd2.dot"]),
        ("shapes_graph.dot", 3, 10, ["shapes_gfd1.dot", "shapes_gfd2.dot"]),
    ],
)
def test_gfd_miner_golden(graph_file, k, sigma, expected_files):
    # test_gfd_miner.cpp GfdMinerTestSuite: ElementsAreArray over the shipped
    # expected-GFD files, compared in order via the semantic key
    g = read_dot(f"{GRAPH_DATA}/{graph_file}")
    mined = mine_gfds(g, k, sigma)
    expected = [read_gfd(f"{GRAPH_DATA}/{f}") for f in expected_files]
    assert [m.key() for m in mined] == [e.key() for e in expected]


def test_mining_example_snapshot_papers():
    # mining_gfd1 snapshot: exactly one GFD, printed in DOT with the quoted
    # "*" edge labels -- pinned byte-for-byte below
    mined = mine_gfds(
        read_dot(f"{EXAMPLES}/mining_gfd/papers_graph.dot"), 3, 2
    )
    assert len(mined) == 1
    assert write_gfd(mined[0]) == (
        "\n"
        "1.role=teacher\n"
        "graph G {\n"
        "0[label=article];\n"
        "1[label=person];\n"
        "2[label=article];\n"
        '0--1 [label="*"];\n'
        '1--2 [label="*"];\n'
        "}\n"
    )


def test_mining_example_snapshot_study():
    # mining_gfd2 snapshot
    mined = mine_gfds(
        read_dot(f"{EXAMPLES}/mining_gfd/study_graph.dot"), 2, 3
    )
    assert len(mined) == 1
    assert write_gfd(mined[0]) == (
        "0.difficulty=hard\n"
        "1.degree=master 1.year=2\n"
        "graph G {\n"
        "0[label=task];\n"
        "1[label=student];\n"
        "0--1 [label=performs];\n"
        "}\n"
    )


def test_gfd_roundtrip_and_model():
    gfd = read_gfd(f"{GRAPH_DATA}/channels_gfd.dot")
    assert gfd.premises == [((0, "difficulty"), (-1, "hard"))]
    assert gfd.conclusion == [
        ((1, "degree"), (-1, "master")),
        ((1, "year"), (-1, "2")),
    ]
    # write -> parse roundtrip preserves the semantic key
    from pyspark_validator.graphs import parse_gfd_text

    assert parse_gfd_text(write_gfd(gfd)).key() == gfd.key()
    assert isinstance(gfd, Gfd)
