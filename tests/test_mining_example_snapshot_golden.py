"""Mining walkthroughs pinned to the reference's example snapshots
(examples/test_examples/snapshots/snap_test_examples_pytest.py: mining_fd /
mining_ucc / mining_ind / mining_aind / mining_pfd / mining_fd_approximate /
mining_ar / mining_list_od / mining_set_od_1 / mining_dd / mining_md outputs).

Each expected set below is the verbatim published result list: the 7
university FDs, the 8 employee UCCs, the 5 department INDs, the single
project-assignment AIND at error 0.25, the per_value-only [Y] -> X pFD, the
8 medical FDs EulerFD and AID-FD both print, the rules-book AR counts
24/32/13/4 with the final four rules, the 3 shipping list-ODs, the salary
set-OD family (2 ascending + 4 simple, 0 descending), the 3 flight DDs from
the shipped difference table, and the carrier-merger MD lattice at the
default / 6 / 18 support levels."""

import csv

import pandas as pd
import pytest

from pyspark_validator.dd_discovery import mine_dds
from pyspark_validator.discovery import (
    mine_ainds,
    mine_ars,
    mine_fds,
    mine_uccs,
    mine_unary_inds_exact,
)
from pyspark_validator.io import cast_inferred, read_reference_csv
from pyspark_validator.md_discovery import ColumnMatch, mine_mds
from pyspark_validator.od_discovery import mine_set_ods
from pyspark_validator.order_discovery import mine_list_ods
from pyspark_validator.pfd_discovery import mine_pfds

DATASETS = "/root/reference/examples/datasets"


def _csv_df(spark, path, typed=False):
    df = read_reference_csv(spark, f"{DATASETS}/{path}")
    return cast_inferred(df) if typed else df


# ------------------------------------------------------------- mining_fd --


def test_mining_fd_university_matches_snapshot(spark):
    df = _csv_df(spark, "university_fd.csv")
    got = set(mine_fds(df, df.columns, max_lhs=3))
    assert got == {
        (("Professor",), "Course"),
        (("Professor", "Semester"), "Classroom"),
        (("Classroom", "Semester"), "Course"),
        (("Classroom", "Semester"), "Professor"),
        (("Course", "Semester"), "Classroom"),
        (("Course", "Semester"), "Professor"),
        (("Course", "Classroom"), "Professor"),
    }


# ------------------------------------------------------------ mining_ucc --


def test_mining_ucc_employees_matches_snapshot(spark):
    df = _csv_df(spark, "ucc_datasets/ucc.csv")
    got = {tuple(sorted(u)) for u in mine_uccs(df, max_arity=3)}
    assert got == {
        ("First_name", "Last_name"),
        ("First_name", "Grade"),
        ("Grade", "Last_name"),
        ("Grade", "Salary"),
        ("First_name", "Work_experience"),
        ("Last_name", "Work_experience"),
        ("Grade", "Work_experience"),
        ("Salary", "Work_experience"),
    }


# ------------------------------------------------- mining_ind / mining_aind --


def test_mining_ind_university_matches_snapshot(spark):
    tables = {
        name: _csv_df(spark, f"ind_datasets/{name}.csv")
        for name in ["course", "department", "instructor", "student", "teaches"]
    }
    got = set(mine_unary_inds_exact(tables))
    assert got == {
        ("course.Department name", "department.Department name"),
        ("instructor.Department name", "department.Department name"),
        ("student.Department name", "department.Department name"),
        ("teaches.Instructor ID", "instructor.ID"),
        ("teaches.Course ID", "course.Course ID"),
    }


def test_mining_aind_assignments_matches_snapshot(spark):
    tables = {
        name: _csv_df(spark, f"ind_datasets/{name}.csv")
        for name in ["employee", "project_assignments"]
    }
    got = [
        (a, b, e)
        for a, b, e in mine_ainds(tables, max_error=0.3)
        if not a.split(".")[0] == b.split(".")[0]  # cross-table, like Mind
    ]
    assert got == [
        ("project_assignments.employee_name", "employee.name", pytest.approx(0.25))
    ]


# ------------------------------------------------------------ mining_pfd --


def test_mining_pfd_matches_snapshot(spark):
    df = _csv_df(spark, "pfd.csv")
    per_value = mine_pfds(
        df, df.columns, max_error=0.02777777778, error_measure="per_value"
    )
    assert per_value == [(("Y",), "X")]
    per_tuple = mine_pfds(
        df, df.columns, max_error=0.02777777778, error_measure="per_tuple"
    )
    assert per_tuple == []


# ------------------------------------------------- mining_fd_approximate --


def test_mining_fd_approximate_medical_matches_snapshot(spark):
    """EulerFD and AID-FD print identical sets on medical.csv -- i.e. the
    exact minimal-FD answer; pinned against the exact TANE walk (the alias
    facades route here too)."""
    df = _csv_df(spark, "medical.csv")
    got = {(tuple(sorted(l)), r) for l, r in mine_fds(df, df.columns, max_lhs=4)}
    assert got == {
        (("name",), "age"),
        (("name",), "blood"),
        (("name",), "gender"),
        (("name",), "medicine"),
        (("age", "medicine"), "blood"),
        (("age", "blood"), "medicine"),
        (("age", "gender", "medicine"), "name"),
        (("age", "blood", "gender"), "name"),
    }


# ------------------------------------------------------------- mining_ar --


def test_mining_ar_rules_book_matches_snapshot(spark):
    rows = list(csv.reader(open(f"{DATASETS}/rules_book_rows.csv")))
    tx = [
        (i, item) for i, row in enumerate(rows) for item in row if item.strip()
    ]
    df = spark.createDataFrame(tx, ["tid", "item"])

    # published counts: 24 @ (0, 1.0), 32 @ (0, 0.6), 13 @ (0.4, 0.6),
    # 4 @ (0.6, 0.6); every itemset here has support >= 0.2
    assert len(mine_ars(df, minsup=0.2, minconf=1.0)) == 24
    assert len(mine_ars(df, minsup=0.2, minconf=0.6)) == 32
    assert len(mine_ars(df, minsup=0.4, minconf=0.6)) == 13
    final = mine_ars(df, minsup=0.6, minconf=0.6)
    got = {
        (tuple(sorted(l)), tuple(sorted(r)), round(s, 9), round(c, 9))
        for l, r, s, c in final
    }
    assert got == {
        (("Eggs",), ("Milk",), 0.6, 1.0),
        (("Milk",), ("Eggs",), 0.6, 0.6),
        (("Yogurt",), ("Milk",), 0.6, 1.0),
        (("Milk",), ("Yogurt",), 0.6, 0.6),
    }


# -------------------------------------------------------- mining_list_od --


def test_mining_list_od_shipping_matches_snapshot(spark):
    df = _csv_df(spark, "shipping.csv", typed=True)
    res = mine_list_ods(df)
    # columns: weight=0, shipping cost=1, days=2
    assert set(res.list_ods()) == {
        ((1,), (0, 2)),
        ((0, 2), (1,)),
        ((0,), (1,)),
    }


# ------------------------------------------------------- mining_set_od_1 --


def test_mining_set_od_salary_matches_snapshot(spark):
    df = _csv_df(spark, "salary.csv", typed=True)
    res = mine_set_ods(df, df.columns)
    # attribute symbols: year=0, employee_grade=1, avg_salary=2 (0-based)
    assert res.desc == []
    assert {(frozenset(c), a, b) for c, a, b in res.asc} == {
        (frozenset({0}), 1, 2),
        (frozenset({0}), 2, 1),
    }
    assert {(frozenset(c), a) for c, a in res.simple} == {
        (frozenset({1}), 0),
        (frozenset({2}), 0),
        (frozenset({2}), 1),
        (frozenset({1}), 2),
    }


# ------------------------------------------------------------- mining_dd --


def test_mining_dd_flights_matches_snapshot(spark):
    df = _csv_df(spark, "flights_dd.csv", typed=True)
    dif = read_reference_csv(spark, f"{DATASETS}/flights_dd_dif_table.csv")
    dds = mine_dds(df, df.columns, difference_table=dif)
    assert {str(d) for d in dds} == {
        "Departure [0, 0] ; Arrival [0, 0] -> Distance [0, 50]",
        "Distance [0, 50] -> Duration [0, 15]",
        "Departure [0, 3] ; Arrival [0, 3] -> Duration [0, 15]",
    }


# ------------------------------------------------------------- mining_md --


def test_mining_md_carrier_merger_matches_snapshot(spark):
    pdf = pd.read_csv(f"{DATASETS}/carrier_merger.csv")
    df = spark.createDataFrame(pdf)
    max_distance = int(pdf["Distance (km)"].max())  # 1417

    def symbol_jaccard(a, b):
        s1, s2 = set(str(a)), set(str(b))
        inter = len(s1 & s2)
        return inter / (len(s1) + len(s2) - inter)

    def norm_dist(a, b):
        return 1 - abs(int(a) - int(b)) / max_distance

    cms = [
        ColumnMatch("id", "id", "equality"),
        ColumnMatch("Source", "Source", "equality"),
        ColumnMatch("From", "From", "custom", func=symbol_jaccard, measure_name="jaccard"),
        ColumnMatch("To", "To", "custom", func=symbol_jaccard, measure_name="jaccard"),
        ColumnMatch("To", "From", "custom", func=symbol_jaccard, measure_name="jaccard"),
        ColumnMatch("From", "To", "custom", func=symbol_jaccard, measure_name="jaccard"),
        ColumnMatch(
            "Distance (km)", "Distance (km)", "custom",
            func=norm_dist, measure_name="normalized_distance",
        ),
    ]

    def pairs(mds):
        return {
            (tuple(round(b, 6) for b in r.lhs_bounds), r.rhs_index, round(r.rhs_bound, 6))
            for r in mds
        }

    jac = round(10 / 13, 6)  # 0.769231
    nd = lambda k: round(1 - k / max_distance, 6)  # noqa: E731

    # default run: min_support = n + 1 = 13 -> the published 8 MDs
    got = pairs(mine_mds(df, cms, min_support=13))
    assert got == {
        ((0, 0, 0, jac, 0, 0, nd(12)), 1, 1.0),
        ((0, 0, jac, 0, 0, 0, nd(12)), 1, 1.0),
        ((0, 0, jac, jac, 0, 0, 0), 6, nd(32)),
        ((0, 0, jac, 1.0, 0, 0, 0), 6, nd(14)),
        ((0, 0, 1.0, 0, 0, 0, nd(14)), 1, 1.0),
        ((0, 0, 1.0, 1.0, 0, 0, 0), 1, 1.0),
        ((0, 0, 1.0, 1.0, 0, 0, 0), 6, nd(12)),
        ((0, 1.0, jac, jac, 0, 0, 0), 6, nd(12)),
    }

    # min_support = 6: 19 MDs, now including the id-driven ones
    got6 = pairs(mine_mds(df, cms, min_support=6))
    assert len(got6) == 19
    assert got6 > got  # strictly more results at lower support
    for rhs_ix, bound in [(1, 1.0), (2, 1.0), (3, 1.0), (6, 1.0)]:
        assert ((1.0, 0, 0, 0, 0, 0, 0), rhs_ix, bound) in got6
    assert ((0, 0, 0, 0, jac, jac, 0), 6, nd(20)) in got6

    # min_support = round(n * 1.5) = 18: only the strongest MD survives
    got18 = pairs(mine_mds(df, cms, min_support=18))
    assert got18 == {((0, 0, jac, jac, 0, 0, 0), 6, nd(32))}


# ------------------------------------------------------- mining_set_od_2 --


def test_mining_set_od_positions_matches_snapshot(spark):
    df = _csv_df(spark, "position_distribution.csv")
    res = mine_set_ods(df, df.columns)
    # attribute symbols: year=0, position=1, percent=2 (0-based)
    assert res.desc == []
    assert {(frozenset(c), a, b) for c, a, b in res.asc} == {
        (frozenset(), 2, 1),
        (frozenset(), 1, 2),
    }
    assert {(frozenset(c), a) for c, a in res.simple} == {
        (frozenset({2}), 1),
        (frozenset({0, 1}), 2),
    }


# ------------------------------------------------------------ mining_cfd --


def test_mining_cfd_tennis_first_five_match_snapshot(spark):
    """The snapshot's first five displayed CFDs (minsup 8, minconf 0.7,
    max_lhs 3) with their published support / confidence digits. Column
    symbols: 0 Outlook, 1 Temperature, 2 Humidity, 3 Windy, 4 Play."""
    from pyspark_validator.cfd_discovery import mine_cfds

    df = _csv_df(spark, "play_tennis.csv")
    rules = mine_cfds(df, min_supp=8, min_conf=0.7, max_lhs=3)
    got = {
        (
            tuple(sorted(r.lhs)),
            r.rhs_attr,
            r.rhs_const,
            r.support,
            round(r.confidence, 4),
        )
        for r in rules
    }
    assert ((("Windy", "FALSE"),), "Play", "TRUE", 8, 0.75) in got
    assert ((("Humidity", None),), "Play", None, 14, 0.7143) in got
    assert ((("Play", None),), "Humidity", None, 14, 0.7143) in got
    assert (
        (("Humidity", None), ("Windy", None)), "Play", None, 14, 0.7143,
    ) in got
    five = (("Humidity", None), ("Windy", "FALSE"))
    assert any(t[0] == five and t[3] == 8 for t in got)
