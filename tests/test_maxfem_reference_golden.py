"""MaxFEM parity: the four shipped sequence fixtures with the reference's
exact expected maximal episodes (src/tests/unit/test_maxfem_algorithm.cpp,
UnorderedElementsAre), plus the sequence-parser error contracts
(parser/sequence_parser/file_sequence_parser.cpp) and the Spark-side
parallel-episode census laws."""

import pytest

from pyspark_validator.graphs import (
    event_location_lists,
    mine_max_episodes,
    parallel_episode_supports,
    parse_sequence_text,
)
from pyspark_validator.graphs.io import read_sequence

SEQ = "/root/reference/test_input_data/sequence_data"


def _run(name, minsup, window):
    records = read_sequence(f"{SEQ}/{name}")
    res = mine_max_episodes(records, minsup, window)
    return {
        (tuple(tuple(s) for s in seq), sup) for seq, sup in res
    }


def test_baseline():
    assert _run("maxfem_baseline.txt", 2, 2) == {
        (((3,),), 2),
        (((1,), (1, 2)), 2),
    }


def test_window():
    assert _run("maxfem_window.txt", 2, 3) == {
        (((10,), (11,), (12,)), 2),
    }


def test_parallel():
    assert _run("maxfem_parallel.txt", 2, 5) == {
        (((10, 11), (12,), (10, 11)), 2),
        (((12,), (10, 11), (12,)), 2),
    }


def test_pruning():
    assert _run("maxfem_pruning.txt", 2, 5) == {
        (((20,), (21,), (22,)), 2),
        (((22,), (10,)), 2),
        (((10,), (11,), (12,), (10,), (11,)), 2),
        (((11,), (12,), (10,), (11,), (12,)), 2),
    }


def test_parser_contracts():
    # implicit timestamps = non-blank 0-based line ordinals
    assert parse_sequence_text("1 3\n\n2 5\n") == [(0, [1, 3]), (1, [2, 5])]
    # explicit
    assert parse_sequence_text("1 3|1\n2|4\n") == [(1, [1, 3]), (4, [2])]
    with pytest.raises(ValueError, match="mixed explicit"):
        parse_sequence_text("1 2|1\n3 4\n")
    with pytest.raises(ValueError, match="not sorted by timestamp"):
        parse_sequence_text("1|5\n2|5\n")
    with pytest.raises(ValueError, match="transaction"):
        parse_sequence_text("2 1|1\n")
    with pytest.raises(ValueError, match="transaction"):
        parse_sequence_text("1 1|1\n")


def test_parallel_episode_supports_matches_miner_census(spark):
    # the DataFrame census must agree with the exact location-list
    # intersections on a shipped fixture
    records = read_sequence(f"{SEQ}/maxfem_baseline.txt")
    rows = [(ts, e) for ts, events in records for e in events]
    df = spark.createDataFrame(rows, "ts long, event long")
    got = {
        (r["event_a"], r["event_b"], r["support"])
        for r in parallel_episode_supports(df, min_support=2).collect()
    }
    # singles: 1 appears in sets at ts 1,2,3,6,7 (5); 2 at 3,7,9 (3); 3 at 1,8 (2)
    assert (1, None, 5) in got
    assert (2, None, 3) in got
    assert (3, None, 2) in got
    # pair (1,2) co-occurs at ts 3 and 7
    assert (1, 2, 2) in got
    # 4 appears once -> filtered by min_support=2
    assert not any(a == 4 and b is None for a, b, _s in got)

    locs = {
        int(r["event"]): list(r["locations"])
        for r in event_location_lists(df, "ts", "event").collect()
    }
    assert locs[1] == [1, 2, 3, 6, 7]
    assert locs[3] == [1, 8]


def test_empty_and_infrequent():
    assert mine_max_episodes([], 2, 5) == []
    # a single frequent event is itself the maximal episode
    res = mine_max_episodes([(1, [7]), (2, [7])], 2, 3)
    assert [(seq, sup) for seq, sup in res] == [([[7]], 2)]
