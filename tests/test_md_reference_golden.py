"""MDVerifier goldens replicated from the reference's
src/tests/unit/test_md_verification.cpp over its animals_beverages.csv /
md_trivial.csv fixtures (test_input_data/): expected (holds,
true_rhs_decision_boundary) per MD, plus the highlight pair set of the
failing case. Record ids are 0-based row numbers, as in the reference."""

import math

import pytest

from pyspark_validator.checks.md import ColumnMatch, md_check

EPS = 2.220446049250313e-16  # std::numeric_limits<double>::epsilon()

ROWS = [  # animals_beverages.csv: name, zoo, animal, diet
    (0, "Simba", "berlin", "lion", "meat"),
    (1, "Clarence", "london", "lion", "mead"),
    (2, "Baloo", "berlin", "bear", "fish"),
    (3, "Pooh", "london", "beer", "fish"),
]
COLS = ["id", "name", "zoo", "animal", "diet"]


@pytest.fixture(scope="module")
def animals(spark):
    return spark.createDataFrame(ROWS, COLS).cache()


@pytest.fixture(scope="module")
def trivial(spark):
    return spark.createDataFrame(ROWS[:1], COLS).cache()


def lev(col, b, right=None):
    return ColumnMatch("levenshtein", col, right if right else col, b)


CASES = [  # (lhs, rhs, expected_holds, expected_true_boundary)
    ([lev("animal", 0.75)], lev("diet", 0.75), True, 0.75),
    ([lev("name", 0.125), lev("diet", 0.75)], lev("diet", 1 / 5.0), True, 1 / 5.0),
    ([lev("name", 0.125), lev("animal", 0.75)], lev("name", 0.5), False, 1 / 5.0),
    ([lev("animal", 0.75 + EPS)], lev("diet", 0.75), True, 0.75),
    ([lev("animal", 0.75)], lev("diet", 0.75 + EPS), False, 0.75),
]


@pytest.mark.parametrize("lhs,rhs,holds,boundary", CASES)
def test_md_animals_beverages(animals, lhs, rhs, holds, boundary):
    s = md_check(animals, lhs, rhs).summary().collect()[0]
    assert s.holds == holds
    assert math.isclose(s.true_rhs_boundary, boundary, abs_tol=1e-12)


def test_md_trivial_holds(trivial):
    s = md_check(trivial, [lev("animal", 1.0)], lev("diet", 1.0)).summary().collect()[0]
    assert s.holds is True
    assert s.true_rhs_boundary == 1.0
    assert s.n_matching_pairs == 1  # the reflexive pair is part of the space


def test_md_trivial_cross_column_rhs_fails(trivial):
    # rhs levenshtein(animal, diet) >= 1.0 on the single record: lion vs meat
    s = (
        md_check(trivial, [lev("animal", 1.0)], lev("animal", 1.0, right="diet"))
        .summary()
        .collect()[0]
    )
    assert s.holds is False
    assert s.true_rhs_boundary == 0.0


def test_md_highlights_golden(animals):
    """test_md_verification.cpp highlights case: rows (2, 3) and (3, 2) have
    name similarity 0.2 against levenshtein(name, name) >= 0.5."""
    c = md_check(
        animals, [lev("name", 0.125), lev("animal", 0.75)], lev("name", 0.5)
    )
    h = sorted(
        (r.left_id, r.right_id, round(r.similarity, 9), r.column_match_name)
        for r in c.highlights().collect()
    )
    assert h == [(2, 3, 0.2, "levenshtein"), (3, 2, 0.2, "levenshtein")]


def test_md_suggestion(animals):
    c = md_check(
        animals, [lev("name", 0.125), lev("animal", 0.75)], lev("name", 0.5)
    )
    s = c.suggestion()
    assert s["holds"] is False
    assert s["rhs"] == ("levenshtein(name, name)", 0.2)


def test_md_jaccard_and_equality(spark):
    df = spark.createDataFrame(
        [
            (0, "red apple pie", "A"),
            (1, "apple pie red", "A"),   # same token set as 0
            (2, "green pear tart", "B"),
            (3, "", "C"),
            (4, "", "D"),
        ],
        ["id", "txt", "grp"],
    )
    # jaccard(txt) >= 1.0 -> equality(grp) >= 1.0. Matched pairs are those
    # with equal token SETS: (0,1)/(1,0) [same grp A, fine], (3,4)/(4,3)
    # [both empty -> jaccard 1, per jaccard.h; grp C vs D violates], plus the
    # 5 reflexive pairs.
    s = (
        md_check(
            df,
            [ColumnMatch("jaccard", "txt", "txt", 1.0)],
            ColumnMatch("equality", "grp", "grp", 1.0),
        )
        .summary()
        .collect()[0]
    )
    assert s.holds is False
    assert s.n_matching_pairs == 9
    assert s.n_violating_pairs == 2
    assert s.true_rhs_boundary == 0.0


def test_md_number_difference(spark):
    """lv_normalized.h CalcFor semantics: sim(l, r) = (maxd_l - |l-r|)/maxd_l
    with maxd_l the max distance from l to ANY right value."""
    df = spark.createDataFrame([(0, 0.0), (1, 5.0), (2, 10.0)], ["id", "v"])
    c = md_check(
        df,
        [ColumnMatch("number_difference", "v", "v", 0.6)],
        ColumnMatch("equality", "id", "id", 1.0),
        allow_cross_join=False,
    )
    m = {
        (r.lid, r.rid): r.rhs_sim for r in c._matched().collect()
    }
    # maxd for l=0 is 10, l=5 is 5, l=10 is 10.
    # sim(0,5)=0.5<0.6 excluded; sim(5,0)=0.0 excluded; sim(5,5)=1;
    # sim(0,0)=1; sim(10,10)=1; sim(0,10)=0; sim(10,5)=0.5 excluded.
    assert set(m) == {(0, 0), (1, 1), (2, 2)}


def test_md_cross_join_guard(spark):
    df = spark.createDataFrame([(0, "a")], ["id", "s"])
    with pytest.raises(ValueError, match="allow_cross_join"):
        md_check(
            df, [ColumnMatch("levenshtein", "s", "s", 0.0)],
            ColumnMatch("equality", "s", "s", 1.0),
        ).summary()


def test_md_two_tables(spark):
    left = spark.createDataFrame([(0, 10, "x"), (1, 20, "y")], ["lid0", "k", "s"])
    right = spark.createDataFrame([(7, 10, "x"), (8, 20, "z")], ["rid0", "k", "s"])
    s = (
        md_check(
            left,
            [ColumnMatch("equality", "k", "k", 1.0)],
            ColumnMatch("equality", "s", "s", 1.0),
            right=right,
            left_id="lid0",
            right_id="rid0",
        )
        .summary()
        .collect()[0]
    )
    assert s.n_matching_pairs == 2
    assert s.n_violating_pairs == 1  # (1, 8): y vs z
    assert s.holds is False


# ---------------------------------------------------------------------------
# MD-tier similarity kernels (md/hymd/preprocessing/column_matches/)


def test_md_similarity_kernels():
    from pyspark_validator.checks.md import _lcs_sim, _monge_elkan_sim, _swg_sim

    # lcs.cpp:30-40
    assert _lcs_sim("abcd", "abd") == 3 / 4
    assert _lcs_sim("", "") == 1.0 and _lcs_sim("a", "") == 0.0
    assert _lcs_sim("abc", "abc") == 1.0
    # smith_waterman_gotoh.cpp: identical -> 1; "ab" vs "ba" -> best local
    # score 1.0 over min_len 2
    assert _swg_sim("abc", "abc") == 1.0
    assert _swg_sim("ab", "ba") == 0.5
    assert _swg_sim("", "") == 1.0 and _swg_sim("x", "") == 0.0
    # monge_elkan.h:11-35: directed means 1 and 0.5 -> sqrt(0.5)
    assert abs(_monge_elkan_sim("aa", "aa cc") - 0.5**0.5) < 1e-12
    assert _monge_elkan_sim("aa bb", "bb aa") == 1.0


def test_md_lcs_classifier_blocks_and_verifies(spark):
    from pyspark_validator.checks.md import ColumnMatch, md_check

    df = spark.createDataFrame(
        [(0, "abcd", "g1"), (1, "abd", "g1"), (2, "zzzz", "g2"), (3, "abcd", "g2")],
        ["id", "s", "g"],
    )
    # lcs(s) >= 0.75 -> equality(g): matching pairs are (0,1) [0.75, g1/g1 ok],
    # (0,3) [1.0, g1 vs g2], (1,3) [0.75, g1 vs g2], each in both orders, plus
    # 4 reflexive -> 10 matching, 4 violating.
    s = (
        md_check(
            df,
            [ColumnMatch("lcs", "s", "s", 0.75)],
            ColumnMatch("equality", "g", "g", 1.0),
        )
        .summary()
        .collect()[0]
    )
    assert s.n_matching_pairs == 10
    assert s.n_violating_pairs == 4 and not s.holds


def test_md_swg_requires_cross_join_guard(spark):
    import pytest as _pytest

    from pyspark_validator.checks.md import ColumnMatch, md_check

    df = spark.createDataFrame([(0, "ab", "x")], ["id", "s", "g"])
    with _pytest.raises(ValueError, match="allow_cross_join"):
        md_check(
            df,
            [ColumnMatch("smith_waterman_gotoh", "s", "s", 0.9)],
            ColumnMatch("equality", "g", "g", 1.0),
        ).summary()
    # allowed: verify runs via the pandas kernel
    r = (
        md_check(
            df,
            [ColumnMatch("smith_waterman_gotoh", "s", "s", 0.9)],
            ColumnMatch("equality", "g", "g", 1.0),
            allow_cross_join=True,
        )
        .summary()
        .collect()[0]
    )
    assert r.holds and r.n_matching_pairs == 1


def test_hymd_metric_goldens_lcs_monge_elkan():
    """Every LCS and Monge-Elkan expectation from test_hymd_metrics.cpp
    (the reference's dedicated similarity-metric suite), at its 1e-3
    tolerance. Lcs there returns the RAW common-subsequence length."""
    from pyspark_validator.checks.md import _lcs_len, _monge_elkan_sim

    assert _lcs_len("", "") == 0
    assert _lcs_len("hello", "") == 0
    assert _lcs_len("", "world") == 0
    assert _lcs_len("kitten", "sitting") == 4
    assert _lcs_len("abcdef", "xyabdxe") == 4
    assert _lcs_len("abcdef", "xyz") == 0
    assert _lcs_len("aaa", "aaa") == 3

    cases = [
        ("", "", 1.0),
        ("abc", "", 0.0),
        ("", "abc", 0.0),
        ("abc def xyz", "def xyz abc", 1.0),
        ("hello word", "world helo", 7.0 / 8.0),
        ("abc", "xyz", 0.0),
        ("abc def", "abc", 0.5**0.5),
        ("abc", "abc def", 0.5**0.5),
        ("abc", "abc abc", 1.0),
        ("word1 word2", "Word2 Word1", 4.0 / 5.0),
    ]
    for a, b, exp in cases:
        assert abs(_monge_elkan_sim(a, b) - exp) < 1e-3, (a, b)


def test_hymd_metric_goldens_jaccard(spark):
    """The StringJaccardIndex expectations from test_hymd_metrics.cpp,
    evaluated through the ENGINE's JVM expression (checks/md.py
    jaccard_sim -- the same expression every MD check compiles)."""
    from pyspark.sql import functions as F

    from pyspark_validator.checks.md import jaccard_sim

    cases = [
        ("", "", 1.0),
        ("hello", "", 0.0),
        ("", "world", 0.0),
        ("abc cde", "abc", 0.5),
        ("abc cde", "abc def", 1.0 / 3.0),
        ("word1", "word2", 0.0),
        ("word", "word", 1.0),
    ]
    df = spark.createDataFrame(
        [(a, b, exp) for a, b, exp in cases], ["a", "b", "exp"]
    )
    rows = df.select(
        jaccard_sim(F.col("a"), F.col("b")).alias("sim"), "exp"
    ).collect()
    for r in rows:
        assert abs(r["sim"] - r["exp"]) < 1e-3
