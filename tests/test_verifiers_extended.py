"""Golden tests for the extended verifier family: MFD, SD, AOD, CFD, AR, DD, DC,
CIND. Expectations are hand-computed on tiny deterministic tables (reference test
style: src/tests/unit/test_*_verifier.cpp parameterized golden values)."""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.checks.ar import ar_check
from pyspark_validator.checks.cfd import cfd_check
from pyspark_validator.checks.cind import cind_check
from pyspark_validator.checks.dc import dc_check
from pyspark_validator.checks.dd import dd_check
from pyspark_validator.checks.mfd import mfd_check
from pyspark_validator.checks.od import aod_check
from pyspark_validator.checks.sd import sd_check


def _row(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# ---------------------------------------------------------------------------
# MFD


def test_mfd_euclidean_1d(spark):
    # clusters: a -> {1.0, 3.0} diameter 2; b -> {5.0} diameter 0
    df = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 5.0)], ["x", "y"])
    s = _row(mfd_check(df, ["x"], ["y"], metric="euclidean", parameter=2.0).summary())
    assert s.holds and s.n_clusters == 2 and s.max_diameter == 2.0
    s2 = _row(mfd_check(df, ["x"], ["y"], metric="euclidean", parameter=1.9).summary())
    assert not s2.holds and s2.n_violating_clusters == 1 and s2.n_violating_rows == 2


def test_mfd_euclidean_2d(spark):
    # cluster a: points (0,0), (3,4) -> diameter 5
    df = spark.createDataFrame(
        [("a", 0.0, 0.0), ("a", 3.0, 4.0), ("b", 1.0, 1.0)], ["x", "p", "q"]
    )
    s = _row(mfd_check(df, ["x"], ["p", "q"], parameter=5.0).summary())
    assert s.holds and s.max_diameter == 5.0
    assert not _row(mfd_check(df, ["x"], ["p", "q"], parameter=4.99).summary()).holds


def test_mfd_levenshtein(spark):
    df = spark.createDataFrame(
        [("a", "kitten"), ("a", "sitten"), ("a", "sittin"), ("b", "x")], ["x", "y"]
    )
    # pairwise distances: kitten-sitten 1, sitten-sittin 1, kitten-sittin 2
    s = _row(mfd_check(df, ["x"], ["y"], metric="levenshtein", parameter=2).summary())
    assert s.holds and s.max_diameter == 2.0
    assert not _row(
        mfd_check(df, ["x"], ["y"], metric="levenshtein", parameter=1).summary()
    ).holds


def test_mfd_cosine_qgram(spark):
    df = spark.createDataFrame([("a", "abcd"), ("a", "abcd"), ("a", "zzzz")], ["x", "y"])
    # identical strings distance 0; abcd vs zzzz share no 2-grams -> distance 1
    s = _row(mfd_check(df, ["x"], ["y"], metric="cosine", parameter=0.5, q=2).summary())
    assert not s.holds and s.max_diameter == pytest.approx(1.0)
    hl = mfd_check(df, ["x"], ["y"], metric="cosine", parameter=0.5, q=2).highlights()
    assert hl.count() == 1


def test_mfd_cluster_cap(spark):
    df = spark.createDataFrame([("a", "v%d" % i) for i in range(10)], ["x", "y"])
    # default auto: the over-cap cluster is resolved by the 2-approximation
    # (pivot radius <= 2, 2r <= 9 -> holds), not refused
    s = _row(
        mfd_check(df, ["x"], ["y"], metric="levenshtein", parameter=9, cluster_cap=5).summary()
    )
    assert s.n_oversized == 1 and s.n_approx_clusters == 1 and s.holds
    # brute mode keeps the refusal semantics
    b = _row(
        mfd_check(
            df, ["x"], ["y"], metric="levenshtein", parameter=9, cluster_cap=5,
            algo="brute",
        ).summary()
    )
    assert b.n_oversized == 1 and not b.holds


# ---------------------------------------------------------------------------
# SD


def test_sd_gaps(spark):
    # ordered values 1, 2, 4, 9 with [g1,g2]=[1,2]: gaps 1,2,5 -> one insertion
    # gap (5 needs ceil(5/2)-1=2 insertions); no deletions
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 4.0), (4, 9.0)], ["o", "v"]
    )
    c = sd_check(df, "o", "v", g1=1.0, g2=2.0, num_partitions=2)
    s = _row(c.summary())
    assert not s.holds
    assert s.n_gaps == 3 and s.n_deletions == 0 and s.n_insertion_gaps == 1
    assert s.ops == 2
    assert s.confidence == pytest.approx((4 - 2) / 4)
    v = c.violations().collect()
    assert len(v) == 1 and v[0].kind == "insertion"
    assert v[0].min_insertions == 2 and v[0].max_insertions == 4  # floor(5/1)-1


def test_sd_deletion_and_hold(spark):
    # gaps: 0.5 (<g1 -> deletion), 1.0, 1.5 (ok)
    df = spark.createDataFrame(
        [(1, 0.0), (2, 0.5), (3, 1.5), (4, 3.0)], ["o", "v"]
    )
    s = _row(sd_check(df, "o", "v", g1=1.0, g2=2.0).summary())
    assert s.n_deletions == 1 and s.ops == 1
    ok = spark.createDataFrame([(1, 0.0), (2, 1.0), (3, 3.0)], ["o", "v"])
    assert _row(sd_check(ok, "o", "v", g1=1.0, g2=2.0).summary()).holds


def test_sd_partition_boundaries(spark):
    """Gaps must be identical regardless of partition count (boundary exchange)."""
    rows = [(i, float(i) * 2) for i in range(100)]
    rows[50] = (50, 200.0)  # one wild value -> 2 violating gaps around it
    df = spark.createDataFrame(rows, ["o", "v"])
    s1 = _row(sd_check(df, "o", "v", g1=0.0, g2=2.0, num_partitions=1).summary())
    s8 = _row(sd_check(df, "o", "v", g1=0.0, g2=2.0, num_partitions=8).summary())
    assert (s1.n_gaps, s1.ops, s1.n_insertion_gaps) == (s8.n_gaps, s8.ops, s8.n_insertion_gaps)
    assert s1.n_gaps == 99


# ---------------------------------------------------------------------------
# AOD


def test_aod_ofd(spark):
    # context g: group 1 has right constant; group 2 has values {a:2, b:1} -> 1 removal
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "a"), (2, "b")], ["g", "r"]
    )
    s = _row(aod_check(df, ["g"], ofd_right="r").summary())
    assert s.check == "ofd" and not s.holds
    assert s.n_removals == 1 and s.n_violating_groups == 1
    assert s.error == pytest.approx(1 / 5)


def test_aod_oc(spark):
    # group 1: sorted by l -> r = [1, 3, 2]: LNDS = 2 -> 1 removal
    # group 2: r already non-decreasing -> 0 removals
    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 3.0), (1, 3, 2.0), (2, 1, 5.0), (2, 2, 5.0)],
        ["g", "l", "r"],
    )
    s = _row(aod_check(df, ["g"], oc=("l", "r")).summary())
    assert s.check == "oc" and not s.holds
    assert s.n_removals == 1 and s.error == pytest.approx(1 / 5)
    # descending left ordering reverses the scan: r = [2, 3, 1] -> LNDS=2 -> 1
    s_desc = _row(
        aod_check(df, ["g"], oc=("l", "r"), ordering="descending").summary()
    )
    assert s_desc.n_removals == 1


def test_aod_oc_ties_use_best_arrangement(spark):
    # equal l values may be reordered freely: r = [2, 1] with same l -> holds
    df = spark.createDataFrame([(1, 1, 2.0), (1, 1, 1.0)], ["g", "l", "r"])
    s = _row(aod_check(df, ["g"], oc=("l", "r")).summary())
    assert s.holds and s.n_removals == 0


# ---------------------------------------------------------------------------
# CFD


def test_cfd_constant_rhs(spark):
    # pattern: (city=NYC) -> zip=10001; 3 NYC rows, one has zip 10002
    df = spark.createDataFrame(
        [("NYC", "10001"), ("NYC", "10001"), ("NYC", "10002"), ("LA", "90001")],
        ["city", "zip"],
    )
    c = cfd_check(df, [("city", "NYC")], ("zip", "10001"), minsup=3, minconf=0.6)
    s = _row(c.summary())
    assert s.support == 3 and s.confidence == pytest.approx(2 / 3)
    assert s.n_violating_rows == 1 and s.n_violating_clusters == 1
    assert s.holds  # 3 >= minsup, 0.667 >= 0.6
    assert not _row(
        cfd_check(df, [("city", "NYC")], ("zip", "10001"), minsup=3, minconf=0.7).summary()
    ).holds


def test_cfd_wildcard_rhs(spark):
    # wildcard RHS: each lhs group judged against its own most frequent rhs
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")], ["l", "r"]
    )
    s = _row(cfd_check(df, [("l", None)], ("r", None), minsup=1, minconf=0.7).summary())
    assert s.support == 4 and s.n_violating_rows == 1
    assert s.confidence == pytest.approx(3 / 4)
    hl = cfd_check(df, [("l", None)], ("r", None)).highlights().collect()
    assert len(hl) == 1 and hl[0].most_frequent_rhs == "x" and hl[0].violations == 1


# ---------------------------------------------------------------------------
# AR


def test_ar_support_confidence(spark):
    # transactions: {bread, milk}, {bread}, {bread, milk, eggs}, {eggs}
    rows = [
        (1, "bread"), (1, "milk"),
        (2, "bread"),
        (3, "bread"), (3, "milk"), (3, "eggs"),
        (4, "eggs"),
    ]
    df = spark.createDataFrame(rows, ["tid", "item"])
    c = ar_check(df, ["bread"], ["milk"], minsup=0.5, minconf=0.6)
    s = _row(c.summary())
    assert s.n_transactions == 4 and s.n_satisfying == 2
    assert s.support == pytest.approx(2 / 4)
    assert s.confidence == pytest.approx(2 / 3)  # 3 transactions have bread
    assert s.holds
    clusters = {r.priority: r.n_transactions for r in c.clusters().collect()}
    assert clusters == {"full_left_no_right": 1}  # tid 2
    assert s.n_violating == 1


def test_ar_multi_item_rule(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a")]
    df = spark.createDataFrame(rows, ["tid", "item"])
    s = _row(ar_check(df, ["a", "b"], ["c"]).summary())
    assert s.support == pytest.approx(1 / 3)
    assert s.confidence == pytest.approx(1 / 2)  # 2 transactions have {a,b}
    assert s.n_violating == 2  # tids 2 (full-left-no-right) and 3 (partial-left)


# ---------------------------------------------------------------------------
# DD


def test_dd_pairs(spark):
    # rows with price 1, 2, 3, 10 and qty 1, 1, 5, 1
    # LHS: |d_price| in [0, 2] -> pairs (1,2), (1,3), (2,3)   [by rid]
    # RHS: |d_qty| in [0, 1]: pair (1,3): |1-5|=4 bad; (2,3): 4 bad; (1,2): 0 ok
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 1.0), (3, 3.0, 5.0), (4, 10.0, 1.0)],
        ["rid", "price", "qty"],
    )
    c = dd_check(df, {"price": (0, 2)}, {"qty": (0, 1)}, row_ref="rid")
    s = _row(c.summary())
    assert s.n_lhs_pairs == 3 and s.n_violating_pairs == 2
    assert s.error == pytest.approx(2 / 3)
    assert not s.holds
    hl = c.highlights().collect()
    assert [(h.rid_a, h.rid_b) for h in hl] == [(1, 3), (2, 3)]


def test_dd_holds_with_min_distance(spark):
    # lhs range [1, 2]: excludes identical pairs
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 1.0, 9.0), (3, 2.0, 1.5)], ["rid", "a", "b"]
    )
    s = _row(dd_check(df, {"a": (1, 2)}, {"b": (0, 1)}, row_ref="rid").summary())
    # pairs with |d_a| in [1,2]: (1,3) d_b=.5 ok; (2,3) d_b=7.5 bad
    assert s.n_lhs_pairs == 2 and s.n_violating_pairs == 1


# ---------------------------------------------------------------------------
# DC


def test_dc_same_department_salary_inversion(spark):
    # classic DC: no pair in same dept where s has higher rank but lower salary
    df = spark.createDataFrame(
        [
            (1, "eng", 3, 300.0),
            (2, "eng", 2, 250.0),
            (3, "eng", 1, 275.0),  # rank 1 paid more than rank 2 -> violation
            (4, "hr", 1, 100.0),
        ],
        ["rid", "dept", "rank", "salary"],
    )
    c = dc_check(
        df,
        [("s.dept", "==", "t.dept"), ("s.rank", "<", "t.rank"), ("s.salary", ">", "t.salary")],
        row_ref="rid",
    )
    s = _row(c.summary())
    assert not s.holds and s.n_violating_pairs == 1
    hl = c.highlights().collect()
    assert (hl[0].rid_s, hl[0].rid_t) == (3, 2)


def test_dc_single_tuple_predicates(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0, 10.0), (2, "a", 20.0, 10.0)], ["rid", "k", "lo", "hi"]
    )
    # DC: !(s.lo > s.hi & s.k == t.k) -> only rows violating lo<=hi pair up
    c = dc_check(
        df, [("s.lo", ">", "s.hi"), ("s.k", "==", "t.k")], row_ref="rid"
    )
    s = _row(c.summary())
    assert s.n_violating_pairs == 1  # (2, 1): row 2 has lo>hi, pairs with row 1


def test_dc_requires_equality_or_optin(spark):
    df = spark.createDataFrame([(1, 2.0)], ["rid", "v"])
    with pytest.raises(ValueError, match="cross join"):
        dc_check(df, [("s.v", "<", "t.v")], row_ref="rid").summary()


# ---------------------------------------------------------------------------
# CIND


def test_cind_condition_restricts_ind(spark):
    lhs = spark.createDataFrame(
        [("gold", 1), ("gold", 2), ("base", 99)], ["tier", "k"]
    )
    rhs = spark.createDataFrame([(1,), (2,), (3,)], ["r"])
    # unconditional IND fails (99 missing)...
    s_all = _row(cind_check(lhs, ["k"], rhs, ["r"]).summary())
    assert not s_all.holds
    # ...but conditioned on tier='gold' it holds, support = 2 rows
    s = _row(
        cind_check(lhs, ["k"], rhs, ["r"], lhs_condition=F.col("tier") == "gold").summary()
    )
    assert s.holds and s.support == 2 and s.total_lhs_rows == 3
    # string condition form
    s2 = _row(
        cind_check(lhs, ["k"], rhs, ["r"], lhs_condition="tier = 'gold'").summary()
    )
    assert s2.holds


def test_ar_reference_rules_book_golden(spark):
    """AR goldens from the reference (test_ar_verifier.cpp ARVerifierTestSingular
    on transactional_data/rules-book.csv) -- all four rules hold, with exact
    support/confidence values pinned."""
    rows = [
        (1, "Bread"), (1, "Butter"), (1, "Milk"),
        (2, "Eggs"), (2, "Milk"), (2, "Yogurt"),
        (3, "Cheese"), (3, "Bread"), (3, "Eggs"), (3, "Milk"),
        (4, "Eggs"), (4, "Milk"), (4, "Yogurt"),
        (5, "Cheese"), (5, "Milk"), (5, "Yogurt"),
    ]
    df = spark.createDataFrame(rows, ["tid", "item"])
    cases = [
        (["Bread"], ["Milk"], 0.2, 0.1, 2 / 5, 1.0),
        (["Eggs"], ["Milk"], 0.3, 0.1, 3 / 5, 1.0),
        (["Yogurt"], ["Eggs"], 0.2, 0.1, 2 / 5, 2 / 3),
        (["Yogurt"], ["Milk"], 0.2, 0.1, 3 / 5, 1.0),
    ]
    for left, right, msup, mconf, sup, conf in cases:
        s = _row(ar_check(df, left, right, minsup=msup, minconf=mconf).summary())
        assert s.holds, (left, right)
        assert float(s.support) == pytest.approx(sup)
        assert float(s.confidence) == pytest.approx(conf)


def test_sd_reference_golden_cases(spark):
    """SD goldens from the reference (test_sd_verifier.cpp SDVerifierScenarios,
    inline X,Y data). Our single-scan gap semantics equals the reference's
    optimal-DP ops for isolated violations (BasicViolation, NegativeG2,
    HighGapWithDeletions); for overlapping violations the scan upper-bounds the
    optimum (divergence documented in checks/sd.py) -- asserted as >=."""
    rows = list(zip(range(1, 10), [0.0, 5.0, 10.0, 20.0, 40.0, 45.0, 55.0, 65.0, 70.0]))
    df = spark.createDataFrame(rows, ["x", "y"])

    # BasicViolation: g1=0 g2=10 -> ops 1, confidence 8/9
    s = _row(sd_check(df, "x", "y", g1=0.0, g2=10.0).summary())
    assert s.ops == 1 and float(s.confidence) == pytest.approx(8 / 9)

    # NegativeG2MeansNoConstraint: unbounded g2 -> holds, confidence 1
    s2 = _row(sd_check(df, "x", "y", g1=0.0, g2=float("inf")).summary())
    assert s2.holds and float(s2.confidence) == 1.0

    # HighGapWithDeletions: g1=4 g2=5 -> ops 6, confidence 3/9
    s3 = _row(sd_check(df, "x", "y", g1=4.0, g2=5.0).summary())
    assert s3.ops == 6 and float(s3.confidence) == pytest.approx(3 / 9)

    # EqualG1G2Strict: reference optimal DP reaches ops=8 by merging gaps via
    # deletions; the single-scan count is an upper bound
    s4 = _row(sd_check(df, "x", "y", g1=4.0, g2=4.0).summary())
    assert s4.ops >= 8 and not s4.holds


def test_aod_oc_group_cap(spark):
    """Context groups above group_cap are excluded from the LNDS pass and
    surfaced as oversized (holds=False) instead of funneling into one task."""
    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(100)] + [(2, 1, 2.0), (2, 2, 1.0)],
        ["g", "l", "r"],
    )
    s = {r.check: r for r in aod_check(df, ["g"], oc=("l", "r"), group_cap=50).summary().collect()}
    assert s["oc"].n_oversized == 1
    assert not s["oc"].holds
    # group 2 still evaluated: r decreasing -> 1 removal
    assert s["oc"].n_removals == 1
