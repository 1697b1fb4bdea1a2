"""Driver-window rotation: _driver_green derives from the committed
CORRECTNESS_r*.json files at call time, so the validation window can never
go stale between rounds (the round-3 failure mode: a hand-maintained
frozenset kept fronting an already-green window)."""

import json

import __spark_entry__ as entry


def test_driver_green_matches_committed_files():
    g = entry._driver_green()
    # r3-window names are green; r1's hash-mismatched names are NOT (the old
    # static set over-claimed them -- they must re-front until a 3-green row
    # lands on file)
    assert "zipf_docs" in g and "discovery_ods_lineitem" in g
    assert "ucc_lineitem_pk" in g  # r1 green
    for never_green_on_file in ("aod_ofd_orders", "cfd_orders_priority"):
        assert never_green_on_file not in g


def test_queries_fronts_never_green_and_backs_judge_checked():
    q = list(entry.queries())
    g = entry._driver_green()
    never = [n for n in q if n not in g]
    # ordering: ALL never-green names precede ALL green names
    assert q[: len(never)] == never
    # judge-independently-checked names sort last within the never-green block
    flags = [n in entry._JUDGE_CHECKED for n in never]
    assert flags == sorted(flags)
    # contract completeness: every query has an oracle (aod_oc included)
    osql = entry.oracle_sql()
    assert set(q) == set(osql)


def test_regression_refronts_a_query(tmp_path, monkeypatch):
    """A later CORRECTNESS file recording a non-green row for a previously
    green query must pull it back into the front window."""
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "q_good": {"rows_match": True, "schema_match": True, "hash_match": True},
                "q_flaky": {"rows_match": True, "schema_match": True, "hash_match": True},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {"q_flaky": {"rows_match": True, "schema_match": True, "hash_match": False}}
        )
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text("not json at all")  # ignored
    monkeypatch.setattr(entry, "__file__", str(tmp_path / "__spark_entry__.py"))
    g = entry._driver_green()
    assert g == frozenset({"q_good"})
