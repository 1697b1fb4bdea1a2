"""CORDS soft-FD / correlation check: quantile math + decision goldens.

chi2_ppf is validated against closed forms: dof=2 is Exponential(1/2) so
ppf(p, 2) = -2 ln(1-p) exactly; dof=1 is a squared normal quantile with
the known 0.95 constant. Decision cases are hand-computed from the
cords.cpp rules (DetectSFD / TooMuchStructuralZeroes / ChiSquaredTest).
"""

import math

import pytest

from pyspark_validator.checks.sfd import chi2_ppf, sfd_check


class TestChi2Ppf:
    def test_dof2_closed_form(self):
        for p in (0.5, 0.9, 0.99, 0.999999):
            assert chi2_ppf(p, 2) == pytest.approx(-2.0 * math.log(1.0 - p), rel=1e-10)

    def test_dof1_known_constant(self):
        # (norm.ppf(0.975))^2 = 1.959963984540054^2
        assert chi2_ppf(0.95, 1) == pytest.approx(3.8414588206941245, rel=1e-9)

    def test_monotone_in_dof(self):
        assert chi2_ppf(0.95, 10) > chi2_ppf(0.95, 5) > chi2_ppf(0.95, 1)


class TestSFDDecisions:
    def test_exact_dependence_is_sfd(self, spark):
        rows = [(c, v) for c, v in [("a", "x"), ("b", "y"), ("c", "z")] for _ in range(10)]
        df = spark.createDataFrame(rows, "a string, b string")
        s = sfd_check(df, "a", "b").summary().collect()[0]
        # card(a,b)=3 <= 0.99*30 and card(det)=3 >= 0.9*3 -> SFD; the
        # reference skips the correlation test once the SFD is detected
        assert s["sfd_holds"] and not s["correlated"]
        assert s["pair_card"] == 3 and s["n_rows"] == 30

    def test_independent_uniform_not_correlated(self, spark):
        rows = [(a, b) for a in "ab" for b in "xy" for _ in range(10)]
        df = spark.createDataFrame(rows, "a string, b string")
        s = sfd_check(df, "a", "b").summary().collect()[0]
        assert not s["sfd_holds"]  # card(det)=2 < 0.9 * card(pair)=3.6
        assert s["chi2"] == pytest.approx(0.0, abs=1e-9)
        assert s["n_zero_cells"] == 0
        assert not s["correlated"]

    def test_diagonal_association_is_correlated(self, spark):
        rows = (
            [("a", "x")] * 50 + [("b", "y")] * 50 + [("a", "y")] + [("b", "x")]
        )
        df = spark.createDataFrame(rows, "a string, b string")
        s = sfd_check(df, "a", "b").summary().collect()[0]
        # 2x2 chi2 = n (o11 o22 - o12 o21)^2 / (r1 r2 c1 c2)
        expect = 102 * (50 * 50 - 1) ** 2 / (51**4)
        assert s["chi2"] == pytest.approx(expect, rel=1e-9)
        assert s["dof"] == 1 and s["chi2"] > s["chi2_critical"]
        assert not s["sfd_holds"] and s["correlated"]

    def test_structural_zeroes_path(self, spark):
        # 3x3 with only the diagonal + one off cell: 5 zero cells > 0.3*9,
        # and card(det)=3 < 0.9 * card(pair)=3.6 -> not an SFD
        rows = (
            [("a", "x")] * 5 + [("b", "y")] * 5 + [("c", "z")] * 5 + [("a", "y")] * 5
        )
        df = spark.createDataFrame(rows, "a string, b string")
        s = sfd_check(df, "a", "b").summary().collect()[0]
        assert not s["sfd_holds"]
        assert s["n_zero_cells"] == 5 and s["too_many_zeroes"] and s["correlated"]

    def test_soft_key_flag(self, spark):
        rows = [(str(i), "x" if i % 2 else "y") for i in range(50)]
        df = spark.createDataFrame(rows, "k string, b string")
        s = sfd_check(df, "k", "b").summary().collect()[0]
        assert s["det"] == "k" and s["soft_key_det"] and not s["soft_key_dep"]

    def test_determinant_is_higher_cardinality(self, spark):
        rows = [(b, a) for a in "abcde" for b in "xy" for _ in range(3)]
        df = spark.createDataFrame(rows, "two string, five string")
        s = sfd_check(df, "two", "five").summary().collect()[0]
        assert s["det"] == "five" and s["det_card"] == 5 and s["dep_card"] == 2

    def test_hash_bucket_path(self, spark):
        # 300 distinct det values with max_categories=16 forces the
        # non-skew hash-bucket path: top-16 values cover << (1-0.5) of rows
        rows = [(str(i), "x" if i % 2 else "y") for i in range(300)]
        df = spark.createDataFrame(rows, "k string, b string")
        s = (
            sfd_check(df, "k", "b", max_categories=16, min_cardinality=0.0001)
            .summary()
            .collect()[0]
        )
        assert not s["skew_det"] and s["d1"] == 16
        assert s["n_used"] == 300  # hash path keeps every row


class TestMineSfds:
    def test_all_pairs_classification(self, spark):
        # y is a function of x (SFD); z is diagonally associated with x
        # (correlation); u is an independent uniform; k is a soft key
        rows = []
        for i in range(120):
            x = "abc"[i % 3]
            y = {"a": "p", "b": "q", "c": "p"}[x]
            z = x if i % 40 else "c"  # near-deterministic copy of x
            u = "uv"[(i // 3) % 2]
            rows.append((str(i), x, y, z, u))
        df = spark.createDataFrame(rows, "k string, x string, y string, z string, u string")
        out = __import__(
            "pyspark_validator.discovery", fromlist=["mine_sfds"]
        ).mine_sfds(df, max_false_positive_probability=0.01)
        assert out["soft_keys"] == ["k"]
        assert out["trivial_columns"] == []
        assert ("x", "y") in out["sfds"]
        assert ("x", "z") in out["sfds"] or ("z", "x") in out["sfds"] or (
            ("x", "z") in out["correlations"] or ("z", "x") in out["correlations"]
        )
        # u is independent of everything: never correlated
        flat = out["sfds"] + out["correlations"]
        assert not any("u" in p for p in flat if "y" in p or "z" in p)

    def test_suite_sfd_kind(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        from pyspark_validator.runner import CheckSpec, ValidationSuite

        docs = spark.createDataFrame(
            [(f"d{i}", [("text", "t" + str(i % 3), None, 0)]) for i in range(30)],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
        )
        suite = ValidationSuite(spark, docs, num_partitions=4)
        out = suite.run(
            [
                CheckSpec(
                    name="sfd_span",
                    kind="sfd",
                    params={
                        "col_a": "span_key",
                        "col_b": "span_seq",
                        "expect": "sfd",
                        "min_cardinality": 0.5,
                    },
                )
            ]
        )
        row = out["sfd_span"].collect()[0]
        assert row.holds and row.sfd_holds  # span_key determines span_seq


def test_calculate_sample_size_reference_golden():
    """The six pinned values from test_sfd.cpp:107-114 (TestCordsUtils
    SampleSize), bit-for-bit."""
    from pyspark_validator.checks.sfd import calculate_sample_size

    assert calculate_sample_size(465, 4, 1e-06, 0.05) == 4215
    assert calculate_sample_size(472, 7, 1e-06, 0.05) == 3005
    assert calculate_sample_size(4198, 2632, 0.1, 0.1) == 111
    assert calculate_sample_size(765987, 292784, 0.149804, 0.14367) == 168
    assert calculate_sample_size(640568, 365981, 0.173673, 0.284799) == 64
    assert calculate_sample_size(319, 4, 0.0181818, 0.16) == 485
