"""SDVerifier optimal-DP goldens replicated from the reference's
src/tests/unit/test_sd_verifier.cpp fixtures: expected minimum ops,
confidence, and (where the reference checks them) the exact deletion /
insertion violation sets of the optimal repair path."""

import math

import pytest

from pyspark_validator.checks.sd import sd_check

# X,Y rows of the generated fixture; id = original row index
BASE = [(0, 1, 0), (1, 2, 5), (2, 3, 10), (3, 4, 20), (4, 5, 40),
        (5, 6, 45), (6, 7, 55), (7, 8, 65), (8, 9, 70)]
COLS = ["rid", "x", "y"]


def _run(spark, rows, g1, g2, subset=None):
    if subset is not None:
        rows = [r for r in rows if r[0] in subset]
    df = spark.createDataFrame(rows, COLS)
    r = sd_check(df, "x", "y", g1=g1, g2=g2).optimal(id_col="rid").collect()[0]
    return r


CASES = [  # (name, g1, g2, subset, ops, conf, dels or None, ins or None)
    ("BasicViolation", 0.0, 10.0, None, 1, 0.888888, [], [(3, 4)]),
    ("NegativeG2MeansNoConstraint", 0.0, math.inf, None, 0, 1.0, [], []),
    ("HighGapWithDeletions", 4.0, 5.0, None, 6, 0.333333, None, None),
    ("EqualG1G2Strict", 4.0, 4.0, None, 8, 0.111111, None, None),
    ("IndicesSubset", 0.0, 10.0, {0, 1, 2}, 0, 1.0, [], []),
    ("IndicesSubsetWithViolation", 0.0, 10.0, {3, 4}, 1, 0.5, [], [(3, 4)]),
    ("VeryHighGap", 15.0, 25.0, None, 4, 0.555555, [0, 2, 5, 7], []),
    ("MixedDeletionsAndInsertions", 10.0, 15.0, None, 4, 0.555555, [1, 4, 7], [(3, 5)]),
    ("SingleRowDataset", 0.0, 10.0, {0}, 0, 1.0, [], []),
    ("NegativeYValues", 0.0, 10.0, None, 0, 1.0, [], []),
    ("AllSameYValues", 0.0, 10.0, None, 0, 1.0, [], []),
    ("NegativeAndPositiveYValues", 0.0, 20.0, None, 0, 1.0, [], []),
    ("LargeGapValues", 500.0, 1500.0, None, 0, 1.0, [], []),
    ("ExactGapG1EqualsG2", 10.0, 10.0, None, 0, 1.0, [], []),
]

ALT_ROWS = {
    "NegativeYValues": [(i, i + 1, y) for i, y in enumerate([-10, -5, 0, 10, 20])],
    "AllSameYValues": [(i, i + 1, 10) for i in range(4)],
    "NegativeAndPositiveYValues": [(i, i + 1, y) for i, y in enumerate([-20, -10, 5, 15, 25])],
    "LargeGapValues": [(i, i + 1, y) for i, y in enumerate([0, 1000, 2000, 3000])],
    "ExactGapG1EqualsG2": [(i, i + 1, y) for i, y in enumerate([-15, -5, 5, 15])],
}


@pytest.mark.parametrize("name,g1,g2,subset,ops,conf,dels,ins", CASES, ids=[c[0] for c in CASES])
def test_sd_optimal_reference_golden(spark, name, g1, g2, subset, ops, conf, dels, ins):
    rows = ALT_ROWS.get(name, BASE)
    r = _run(spark, rows, g1, g2, subset)
    assert r.ops == ops
    assert math.isclose(r.confidence, conf, abs_tol=1e-5)
    assert r.holds == (ops == 0)
    if dels is not None:
        assert sorted(r.deletions) == dels
    if ins is not None:
        assert sorted((i.left_id, i.right_id) for i in r.insertions) == ins


def test_sd_optimal_unsorted_by_x(spark):
    """UnsortedByX: rows are sorted by (x, y) before the DP; the reported gap
    ids are the original row ids (4, 0)."""
    rows = [(0, 5, 40), (1, 1, 0), (2, 3, 10), (3, 2, 5), (4, 4, 20)]
    r = _run(spark, rows, 0.0, 10.0)
    assert r.ops == 1 and math.isclose(r.confidence, 0.8, abs_tol=1e-5)
    assert [(i.left_id, i.right_id) for i in r.insertions] == [(4, 0)]
    assert r.deletions == []


def test_sd_optimal_invalid_params(spark):
    df = spark.createDataFrame(BASE[:3], COLS)
    with pytest.raises(ValueError, match="g2 must be >= g1"):
        sd_check(df, "x", "y", g1=5.0, g2=1.0).optimal()
    with pytest.raises(ValueError, match="cannot both be zero"):
        sd_check(df, "x", "y", g1=0.0, g2=0.0).optimal()


def test_sd_optimal_beats_greedy_on_merged_gaps(spark):
    """The case the greedy upper bound overcounts: deleting one row can fix
    two adjacent bad gaps at once; optimal() finds the cheaper repair."""
    rows = [(i, i + 1, y) for i, y in enumerate([0, 10, 11, 20, 30])]
    df = spark.createDataFrame(rows, COLS)
    c = sd_check(df, "x", "y", g1=5.0, g2=10.0)
    greedy_ops = c.summary().collect()[0].ops
    opt = c.optimal(id_col="rid").collect()[0]
    assert opt.ops == 1
    assert opt.deletions in ([1], [2])
    assert opt.ops <= greedy_ops


def test_sd_optimal_grouped(spark):
    """Per-group DP: one sequence per key via by=[...]."""
    rows = [("a", i, i * 10.0) for i in range(5)] + [
        ("b", 0, 0.0), ("b", 1, 5.0), ("b", 2, 100.0)
    ]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = {
        r.grp: r
        for r in sd_check(df, "x", "y", g1=0.0, g2=10.0)
        .optimal(by=["grp"])
        .collect()
    }
    assert out["a"].ops == 0 and out["a"].holds
    assert out["b"].ops == 1 and not out["b"].holds


def test_cascading_deletion_counterexample():
    """[1,4,0,1] under [1,3]: the per-gap score is 1 (one gap < g1) but no
    single deletion yields a valid sequence (removing the 0 merges -4 and +1
    into -3, still < g1); the exact minimum is 2. Found by the 60-example
    hypothesis fuzz -- pinned here so the documented score/minimum divergence
    stays characterized."""
    from pyspark_validator.checks.sd import _optimal_ops

    ops, dels, ins = _optimal_ops([1.0, 4.0, 0.0, 1.0], 1.0, 3.0)
    assert ops == 2 and ins == []
