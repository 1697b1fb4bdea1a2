"""Sampled-CORDS goldens vs the reference's own suite (test_sfd.cpp
CordsAlgorithmTest::LineItem over the shipped LineItem.csv at
kTestConfigDefault with fixed_sample=true). The other two cases use
unshipped fixtures (iris, CIPublicHighway10k).

checks/sfd.py::cords_profile replays cords.cpp ExecuteInternal exactly:
FrequencyHandler top-70 maps with the (freq desc, value desc) tie rule,
soft-key / trivial exclusion, per-pair CalculateSampleSize fixed samples
(i % rows = a cyclic prefix), DetectSFD on sample cardinalities, skew
filtering, and the chi-squared / structural-zeroes contingency verdict
with the libstdc++ std::hash bucketing for non-skewed columns (verified
against a compiled g++ probe)."""

import pandas as pd
import pytest

from pyspark_validator.checks.sfd import cords_profile, std_string_hash

REF = "/root/reference/test_input_data"


def test_std_string_hash_matches_libstdcxx():
    # values from a g++ 12 probe of std::hash<std::string> on this platform
    assert std_string_hash("") == 6142509188972423790
    assert std_string_hash("hello") == 2762169579135187400
    assert std_string_hash("1996-03-13") == 17082656311869940320
    assert std_string_hash("21168.23") == 3084754103172750615


def test_cords_lineitem_golden(spark):
    pdf = pd.read_csv(f"{REF}/LineItem.csv", sep="|", dtype=str)
    pdf = pdf.reset_index(drop=True).reset_index(names="__row_index")
    df = spark.createDataFrame(pdf)
    res = cords_profile(df, order_col="__row_index")

    cols = [c for c in pdf.columns if c != "__row_index"]
    idx = {c: i for i, c in enumerate(cols)}

    assert sorted(idx[c] for c in res["soft_keys"]) == [1, 2, 5, 15]
    assert res["trivial_columns"] == []

    expected_sfds = {
        (0, 8), (0, 9),
        (10, 3), (11, 3), (12, 3),
        (10, 6), (11, 6), (12, 6),
        (10, 7), (11, 7), (12, 7),
        (8, 9),
        (10, 8), (11, 8), (12, 8),
        (10, 9), (11, 9), (12, 9),
        (10, 13), (10, 14), (11, 13), (11, 14), (12, 13), (12, 14),
    }
    got = {(idx[a], idx[b]) for a, b in res["sfds"]}
    assert got == expected_sfds


def test_cords_only_sfd_mode(spark):
    # only_sfd skips the contingency stage entirely (cords.cpp:201-203):
    # the SFD list is unchanged and correlations stay empty
    pdf = pd.read_csv(f"{REF}/LineItem.csv", sep="|", dtype=str)
    pdf = pdf.reset_index(drop=True).reset_index(names="__row_index")
    df = spark.createDataFrame(pdf)
    res = cords_profile(df, order_col="__row_index", only_sfd=True)
    assert len(res["sfds"]) == 24
    assert res["correlations"] == []
