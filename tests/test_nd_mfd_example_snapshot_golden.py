"""ND and MFD verification pinned to the reference's example snapshots
(examples/test_examples/snapshots/snap_test_examples_pytest.py:
verifying_nd_1/2/3_output and verifying_mfd_output).

ND legs: each Arstozka passport table violates {Name} -> {ID} weight 2 with
one pinned cluster and real weight 3/4/3, and the repaired table holds.
MFD legs: euclidean 1-d ([Title] -> [Duration] on theatres_mfd), euclidean
2-d ([Address] -> [Latitude, Longitude] on addresses_coordinates, the
calipers walkthrough) and cosine bigrams ([SSN] -> [ADDRESS] on
addresses_names), with every per-delta verdict and every violating cluster's
max distance pinned to the published digits."""

import pytest

from pyspark_validator.checks.mfd import mfd_check
from pyspark_validator.checks.nd import nd_check
from pyspark_validator.io import read_reference_csv

DATASETS = "/root/reference/examples/datasets"
ND = f"{DATASETS}/nd_verification_datasets"


# ------------------------------------------------------------------- ND ----


@pytest.mark.parametrize(
    "bad,good,lhs,weight_found",
    [
        ("expired_passport", "valid_passports_1", ["Name"], 3),
        ("merged_people", "valid_passports_2", ["Name"], 4),
        (
            "expired_passport_complex",
            "valid_passports_3",
            ["First name", "Last name"],
            3,
        ),
    ],
)
def test_nd_walkthroughs_match_snapshots(spark, bad, good, lhs, weight_found):
    df_bad = read_reference_csv(spark, f"{ND}/{bad}.csv")
    s = nd_check(df_bad, lhs, ["ID"], weight=2).collect()[0]
    assert not s["holds"]
    assert s["real_weight"] == weight_found
    assert s["n_violating_clusters"] == 1
    assert s["n_violating_rows"] == weight_found  # IDs are unique per row here

    df_good = read_reference_csv(spark, f"{ND}/{good}.csv")
    s2 = nd_check(df_good, lhs, ["ID"], weight=2).collect()[0]
    assert bool(s2["holds"]) is True


def test_nd_violating_cluster_is_kordon_kallo(spark):
    from pyspark_validator.compat import NdVerifier

    v = NdVerifier(spark)
    v.load_data(read_reference_csv(spark, f"{ND}/expired_passport.csv"))
    v.execute(lhs_indices=[0], rhs_indices=[1], weight=2)
    assert v.nd_holds is False and v.real_weight == 3
    (hl,) = v.highlights
    assert hl["lhs_value"] == "Kordon Kallo"
    assert hl["occurrences_number"] == 3
    assert hl["distinct_rhs_values_number"] == 3


# ------------------------------------------------------------------ MFD ----


def _mfd(spark, path, lhs, rhs, metric, parameter):
    df = read_reference_csv(spark, f"{DATASETS}/{path}")
    for c in rhs if metric != "cosine" else []:
        df = df.withColumn(c, df[c].cast("double"))
    return mfd_check(df, lhs, rhs, metric=metric, parameter=parameter)


def _diameters(chk):
    return [r["diameter"] for r in chk.highlights().collect()]


def test_mfd_theatres_matches_snapshot(spark):
    # [Title] -> [Duration], euclidean: holds at 5, two clusters of max 5.0 at 3
    chk5 = _mfd(spark, "theatres_mfd.csv", ["Title"], ["Duration"], "euclidean", 5)
    assert bool(chk5.summary().collect()[0]["holds"]) is True
    chk3 = _mfd(spark, "theatres_mfd.csv", ["Title"], ["Duration"], "euclidean", 3)
    assert not chk3.summary().collect()[0]["holds"]
    assert sorted(_diameters(chk3)) == [5.0, 5.0]


def test_mfd_coordinates_matches_snapshot(spark):
    # [Address] -> [Latitude, Longitude], euclidean 2-d (the calipers leg)
    args = ("addresses_coordinates.csv", ["Address"], ["Latitude", "Longitude"])
    for delta in (1, 0.1, 0.01):
        assert bool(
            _mfd(spark, *args, "euclidean", delta).summary().collect()[0]["holds"]
        ) is True
    chk = _mfd(spark, *args, "euclidean", 0.001)
    assert not chk.summary().collect()[0]["holds"]
    assert _diameters(chk) == [0.00873801493474823]
    chk = _mfd(spark, *args, "euclidean", 0.0001)
    assert not chk.summary().collect()[0]["holds"]
    assert sorted(_diameters(chk)) == [
        0.00023246720199186958,
        0.00032472295884457205,
        0.00873801493474823,
    ]


def test_mfd_cosine_matches_snapshot(spark):
    # [SSN] -> [ADDRESS], cosine bigram distance
    args = ("addresses_names.csv", ["SSN"], ["ADDRESS"])
    for delta in (0.75, 0.5, 0.25):
        assert bool(
            _mfd(spark, *args, "cosine", delta).summary().collect()[0]["holds"]
        ) is True
    chk = _mfd(spark, *args, "cosine", 0.1)
    assert not chk.summary().collect()[0]["holds"]
    assert _diameters(chk) == pytest.approx([0.18518518518518523], abs=1e-12)
    chk = _mfd(spark, *args, "cosine", 0.01)
    assert not chk.summary().collect()[0]["holds"]
    assert sorted(_diameters(chk)) == pytest.approx(
        [0.04749904749857124, 0.18518518518518523], abs=1e-12
    )
