"""HyMD with CUSTOM python column matches pinned to the reference's
md_semantic_checks example snapshot (examples/test_examples/snapshots/
snap_test_examples_pytest.py, md_semantic_checks_output): the flight
dataset walkthrough -- symbol-Jaccard on city names and a user lambda for
normalized distance (the pybind Custom match, bind_md.cpp:265-290,
evaluated here as an Arrow-batched pandas UDF over deduplicated combos).
Stages: the initial MD, the stale-max_distance [0,1] validation error, the
empty result with the erroneous row 18, the recovered MD after the fix,
the empty result after adding cross-region flights, and the final 5-MD
lattice once Region joins the match list."""

import pandas as pd
import pytest

from pyspark_validator.md_discovery import ColumnMatch, mine_mds

P = "/root/reference/examples/datasets"
SUPPORT_MULTIPLIER = 1.7


def matches(max_distance, with_region=False):
    # local defs pickle by VALUE (cloudpickle), so executors never import
    # this test module
    def symbol_jaccard(s1, s2):
        a, b = set(s1), set(s2)
        i = len(a & b)
        return i / (len(a) + len(b) - i)

    cms = [
        ColumnMatch("id", "id", kind="equality", measure_name="equality"),
        ColumnMatch("Source", "Source", kind="equality", measure_name="equality"),
        ColumnMatch("From", "From", kind="custom", func=symbol_jaccard,
                    measure_name="jaccard"),
        ColumnMatch("To", "To", kind="custom", func=symbol_jaccard,
                    measure_name="jaccard"),
        ColumnMatch(
            "Distance (km)", "Distance (km)", kind="custom",
            func=lambda d1, d2: 1 - abs(int(d1) - int(d2)) / max_distance,
            measure_name="normalized_distance",
        ),
    ]
    if with_region:
        cms.append(
            ColumnMatch("Region", "Region", kind="equality",
                        measure_name="equality")
        )
    return cms


def run(spark, pdf, cms):
    df = spark.createDataFrame(pdf)
    mds = mine_mds(df, cms, min_support=round(len(pdf) * SUPPORT_MULTIPLIER))
    return sorted(m.to_string() for m in mds)


@pytest.fixture(scope="module")
def frames():
    base = pd.read_csv(f"{P}/carrier_merger.csv")
    merged = pd.concat(
        [base, pd.read_csv(f"{P}/carrier3.csv")], ignore_index=True
    )
    return base, merged


def test_initial_md(spark, frames):
    base, _ = frames
    got = run(spark, base, matches(int(base["Distance (km)"].max())))
    assert got == [
        "[jaccard(From, From)>=0.769231 ∧ jaccard(To, To)>=0.769231] -> "
        "normalized_distance(Distance (km), Distance (km))>=0.977417"
    ]


def test_stale_max_distance_fails_validation(spark, frames):
    base, merged = frames
    with pytest.raises(Exception, match="must be in the \\[0.0, 1.0\\] range"):
        run(spark, merged, matches(int(base["Distance (km)"].max())))


def test_erroneous_row_empties_then_fix_recovers(spark, frames):
    _, merged = frames
    md = int(merged["Distance (km)"].max())
    assert run(spark, merged, matches(md)) == []
    fixed = merged.copy()
    fixed.at[17, "Distance (km)"] = 1913
    assert run(spark, fixed, matches(md)) == [
        "[jaccard(From, From)>=0.769231 ∧ jaccard(To, To)>=0.769231] -> "
        "normalized_distance(Distance (km), Distance (km))>=0.982759"
    ]


def test_cross_region_flights_then_region_match(spark, frames):
    _, merged = frames
    fixed = merged.copy()
    fixed.at[17, "Distance (km)"] = 1913
    full = pd.concat(
        [fixed, pd.read_csv(f"{P}/carrier4.csv")], ignore_index=True
    )
    md = int(full["Distance (km)"].max())
    assert run(spark, full, matches(md)) == []
    with_region = full.copy()
    with_region["Region"] = ["non-US"] * 18 + ["US"] * 3
    got = run(spark, with_region, matches(md, with_region=True))
    nd = "normalized_distance(Distance (km), Distance (km))"
    assert got == sorted(
        [
            f"[{nd}>=0.990939] -> equality(Region, Region)>=1",
            "[equality(Source, Source)>=1] -> equality(Region, Region)>=1",
            f"[jaccard(To, To)>=0.769231 ∧ {nd}>=0.703185] -> "
            "equality(Region, Region)>=1",
            f"[jaccard(From, From)>=0.769231 ∧ {nd}>=0.940143] -> "
            "equality(Region, Region)>=1",
            "[jaccard(From, From)>=0.769231 ∧ jaccard(To, To)>=0.769231 ∧ "
            f"equality(Region, Region)>=1] -> {nd}>=0.990939",
        ]
    )
