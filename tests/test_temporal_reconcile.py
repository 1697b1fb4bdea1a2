"""Interval-overlap, event-precedence and cross-table reconciliation checks
vs python first-principles oracles."""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.checks.reconcile import reconciliation_check
from pyspark_validator.checks.temporal import (
    interval_overlap_check,
    interval_overlap_violations,
    precedence_check,
    precedence_violations,
)


# ---------------------------------------------------------------------------
# interval overlap


def test_interval_overlap_counts(spark):
    rows = [
        (1, 0.0, 10.0),   # base
        (1, 5.0, 12.0),   # overlaps (5 < 10)
        (1, 12.0, 15.0),  # touches 12 == 12 -> OK when allow_touching
        (2, 0.0, 3.0),
        (2, 4.0, 5.0),    # clean
        (2, 2.0, 1.0),    # bad bounds (end < start)
    ]
    df = spark.createDataFrame(rows, "k int, s double, e double")
    r = interval_overlap_check(df, ["k"], "s", "e").collect()[0]
    assert r["n_intervals"] == 6 and r["n_keys"] == 2
    assert r["n_overlaps"] == 1 and r["n_bad_bounds"] == 1
    assert not r["holds"]
    # touching becomes a violation when not allowed
    r2 = interval_overlap_check(df, ["k"], "s", "e", allow_touching=False).collect()[0]
    assert r2["n_overlaps"] == 2


def test_interval_overlap_violation_rows(spark):
    rows = [(1, 0.0, 10.0), (1, 5.0, 12.0), (1, 20.0, 30.0), (1, 25.0, 26.0)]
    df = spark.createDataFrame(rows, "k int, s double, e double")
    v = interval_overlap_violations(df, ["k"], "s", "e").collect()
    got = {(r["start"], r["end"]): r["prev_end"] for r in v}
    assert got == {(5.0, 12.0): 10.0, (25.0, 26.0): 30.0}


def test_interval_overlap_bad_bounds_excluded_from_running_max(spark):
    # the inverted interval (10, 1) must NOT poison prev_end for later rows
    rows = [(1, 0.0, 2.0), (1, 3.0, 1.0), (1, 4.0, 5.0)]
    df = spark.createDataFrame(rows, "k int, s double, e double")
    r = interval_overlap_check(df, ["k"], "s", "e").collect()[0]
    assert r["n_overlaps"] == 0 and r["n_bad_bounds"] == 1


def test_interval_overlap_python_oracle(spark):
    import random

    rng = random.Random(7)
    rows = []
    for k in range(6):
        for _ in range(40):
            s = rng.randrange(0, 500)
            rows.append((k, float(s), float(s + rng.randrange(0, 30))))
    df = spark.createDataFrame(rows, "k int, s double, e double")
    r = interval_overlap_check(df, ["k"], "s", "e").collect()[0]

    n_overlaps = 0
    by_k = {}
    for k, s, e in rows:
        by_k.setdefault(k, []).append((s, e))
    for ivs in by_k.values():
        ivs.sort()
        running = None
        for s, e in ivs:
            if running is not None and s < running:
                n_overlaps += 1
            running = e if running is None else max(running, e)
    assert r["n_overlaps"] == n_overlaps


# ---------------------------------------------------------------------------
# precedence


def test_precedence_basic(spark):
    rows = [
        (1, 1, "click"), (1, 2, "purchase"),        # ok
        (2, 1, "purchase"),                          # unpreceded
        (3, 1, "view"), (3, 2, "purchase"),          # unpreceded
        (4, 1, "click"), (4, 2, "purchase"), (4, 3, "purchase"),  # both ok
    ]
    df = spark.createDataFrame(rows, "u int, ts int, et string")
    r = precedence_check(
        df, ["u"], "ts", F.col("et") == "click", F.col("et") == "purchase"
    ).collect()[0]
    assert r["n_consequents"] == 5
    assert r["n_unpreceded"] == 2
    assert r["n_keys_violating"] == 2
    assert not r["holds"]
    v = precedence_violations(
        df, ["u"], "ts", F.col("et") == "click", F.col("et") == "purchase"
    ).collect()
    assert {(r["u"], r["ts"]) for r in v} == {(2, 1), (3, 2)}


def test_precedence_strictness(spark):
    # antecedent at the SAME timestamp: strict says unpreceded, lax says ok
    rows = [(1, 5, "click"), (1, 5, "purchase")]
    df = spark.createDataFrame(rows, "u int, ts int, et string")
    ante, cons = F.col("et") == "click", F.col("et") == "purchase"
    strict = precedence_check(df, ["u"], "ts", ante, cons, strict=True).collect()[0]
    lax = precedence_check(df, ["u"], "ts", ante, cons, strict=False).collect()[0]
    assert strict["n_unpreceded"] == 1 and lax["n_unpreceded"] == 0


def test_precedence_holds_clean(spark):
    rows = [(1, 1, "open"), (1, 2, "close"), (2, 1, "open"), (2, 9, "close")]
    df = spark.createDataFrame(rows, "u int, ts int, et string")
    r = precedence_check(
        df, ["u"], "ts", F.col("et") == "open", F.col("et") == "close"
    ).collect()[0]
    assert r["holds"] and r["n_unpreceded"] == 0


# ---------------------------------------------------------------------------
# reconciliation


@pytest.fixture()
def ledger(spark):
    parent = spark.createDataFrame(
        [(1, 60.0), (2, 10.0), (3, 99.0), (4, 0.0)],
        "acct int, balance double",
    )
    child = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0),   # sums to 60 -> matched
         (2, 10.0), (2, 5.0),               # sums to 15 -> mismatched
         (9, 7.0)],                          # orphan (no parent 9)
        "acct int, amount double",
    )
    return parent, child


def test_reconciliation_statuses(spark, ledger):
    parent, child = ledger
    rc = reconciliation_check(
        parent, child, ["acct"], ["acct"],
        F.col("balance"), F.sum("amount"),
    )
    got = {r["acct"]: r["status"] for r in rc.compared.collect()}
    assert got == {
        1: "matched", 2: "mismatched", 3: "missing_child",
        4: "missing_child", 9: "orphan_child",
    }
    s = rc.summary().collect()[0]
    assert s["n_matched"] == 1 and s["n_mismatched"] == 1
    assert s["n_orphan_child"] == 1 and s["n_missing_child"] == 2
    assert s["n_parent_keys"] == 4 and s["n_child_keys"] == 3
    assert s["max_abs_diff"] == pytest.approx(5.0)
    assert not s["holds"]


def test_reconciliation_tolerances(spark, ledger):
    parent, child = ledger
    # abs_tol 5 accepts the acct-2 gap; expect_children=False forgives 3 and 4
    s = reconciliation_check(
        parent, child, ["acct"], ["acct"],
        F.col("balance"), F.sum("amount"),
        abs_tol=5.0, expect_children=False,
    ).summary().collect()[0]
    assert s["n_mismatched"] == 0
    assert not s["holds"]  # orphan_child still violates
    # rel_tol path: 50% of 10 covers the gap too
    s2 = reconciliation_check(
        parent, child.filter(F.col("acct") != 9), ["acct"], ["acct"],
        F.col("balance"), F.sum("amount"),
        rel_tol=0.5, expect_children=False,
    ).summary().collect()[0]
    assert s2["n_mismatched"] == 0 and s2["holds"]


def test_reconciliation_violations_order(spark, ledger):
    parent, child = ledger
    v = reconciliation_check(
        parent, child, ["acct"], ["acct"],
        F.col("balance"), F.sum("amount"),
    ).violations(cap=10).collect()
    # worst abs diff first; null-diff rows (missing/orphan) after, key asc
    assert [r["acct"] for r in v] == [2, 3, 4, 9]
    statuses = [r["status"] for r in v]
    assert statuses.count("matched") == 0 and len(v) == 4
