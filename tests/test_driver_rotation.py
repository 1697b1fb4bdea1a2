"""Driver-window rotation: _driver_green derives from the committed
CORRECTNESS_r*.json files at call time, so the validation window can never
go stale between rounds (the round-3 failure mode: a hand-maintained
frozenset kept fronting an already-green window).

Round-5 fix (VERDICT r4 "What's wrong" #1): the expected green set is now
DERIVED inside the tests from the same committed files, never hardcoded —
a later driver run landing a new CORRECTNESS file can flip individual
queries green without breaking the suite.  Production-tree assertions are
limited to invariants that hold for ANY file state (latest-row-wins,
ordering, contract completeness).
"""

import glob
import json
import os
import re

import __spark_entry__ as entry


def _expected_green_from_files(dirname):
    """Independent re-derivation of the latest-row-wins green set, ordered
    by parsed round number (the contract _driver_green must match)."""

    def round_no(p):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return (int(m.group(1)) if m else -1, p)

    green = set()
    n_read = 0
    for path in sorted(
        glob.glob(os.path.join(dirname, "CORRECTNESS_r*.json")), key=round_no
    ):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        n_read += 1
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                green.add(name)
            else:
                green.discard(name)
    return (green, n_read)


def test_driver_green_matches_committed_files():
    """_driver_green() == an independent latest-row-wins parse of whatever
    CORRECTNESS files are actually on disk — no query names pinned, so new
    driver rounds can never falsify this test."""
    here = os.path.dirname(os.path.abspath(entry.__file__))
    expected, n_read = _expected_green_from_files(here)
    g = entry._driver_green()
    if n_read == 0:
        assert g == entry._GREEN_FALLBACK
    else:
        assert g == frozenset(expected)
        # sanity: the derived set is non-trivial on a real tree and every
        # green name is a registered contract query
        assert len(g) > 0
        assert g <= set(entry.oracle_sql()) | set(entry.queries())


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


def test_later_round_flips_query_green(tmp_path, monkeypatch):
    """The symmetric case (VERDICT r4 done-criterion): a hypothetical later
    round recording a 3-green row for a never-green query promotes it — the
    exact event that broke the old hardcoded test."""
    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps(
            {"q_late": {"rows_match": True, "schema_match": True, "hash_match": False}}
        )
    )
    monkeypatch.setattr(entry, "__file__", str(tmp_path / "__spark_entry__.py"))
    assert "q_late" not in entry._driver_green()
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps(
            {"q_late": {"rows_match": True, "schema_match": True, "hash_match": True}}
        )
    )
    assert entry._driver_green() == frozenset({"q_late"})


def test_round_order_is_numeric_not_lexicographic(tmp_path, monkeypatch):
    """ADVICE r4: r10 must override r9 (lexicographically 'r10' < 'r9'),
    and an unpadded round number must still sort chronologically."""
    (tmp_path / "CORRECTNESS_r9.json").write_text(
        json.dumps(
            {"q_x": {"rows_match": True, "schema_match": True, "hash_match": True}}
        )
    )
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps(
            {"q_x": {"rows_match": True, "schema_match": True, "hash_match": False}}
        )
    )
    monkeypatch.setattr(entry, "__file__", str(tmp_path / "__spark_entry__.py"))
    # latest round (10) recorded a regression: q_x must NOT be green
    assert entry._driver_green() == frozenset()
