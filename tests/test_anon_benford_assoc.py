"""k-anonymity / l-diversity, Benford conformance, categorical association.

Python oracles recompute every statistic from first principles on collected
rows; the fused Benford member is pinned equal to the standalone check.
"""

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from pyspark_validator.checks.anon import anon_check
from pyspark_validator.checks.assoc import _norm_ppf, assoc_check
from pyspark_validator.checks.benford import (
    benford_check,
    benford_expected,
    first_digit_expr,
)
from pyspark_validator.fused import FusedPass


# ---------------------------------------------------------------------------
# fixtures


@pytest.fixture(scope="module")
def people(spark):
    # (zip, age_band, disease): clusters of sizes 1..4, mixed diversity
    rows = []
    rid = 0
    for zipc, band, diseases in [
        ("10001", "20-30", ["flu", "flu", "cold"]),       # size 3, 2 distinct
        ("10001", "30-40", ["flu"]),                      # size 1  (k<2 viol)
        ("10002", "20-30", ["cold", "cold", "cold", "cold"]),  # size 4, l viol
        ("10002", "30-40", ["flu", "cold"]),              # size 2, 2 distinct
        ("10003", "20-30", ["hep", "flu", "cold"]),       # size 3, 3 distinct
    ]:
        for d in diseases:
            rows.append((rid, zipc, band, d))
            rid += 1
    return spark.createDataFrame(
        rows, "id int, zip string, age_band string, disease string"
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity


def test_kanon_summary_exact(people):
    s = anon_check(people, ["zip", "age_band"], k=3, sensitive="disease", l=2) \
        .summary().collect()[0]
    # clusters: sizes 3,1,4,2,3 -> below k=3: sizes 1 and 2 (2 clusters, 3 rows)
    assert s["n_rows"] == 13
    assert s["n_clusters"] == 5
    assert s["min_cluster_size"] == 1
    assert s["n_k_violating_clusters"] == 2
    assert s["n_k_violating_rows"] == 3
    assert s["suppression_ratio"] == pytest.approx(3 / 13)
    # l=2 distinct: the all-cold size-4 cluster and the singleton violate
    assert s["min_distinct_sensitive"] == 1
    assert s["n_l_violating_clusters"] == 2
    assert s["n_l_violating_rows"] == 5
    assert not s["holds"]


def test_kanon_entropy_l_diversity(people):
    # entropy l-diversity at l=2: requires H >= ln 2; the 2/1 flu/cold split
    # (H = ln3 - (2 ln2)/3 ~ 0.6365) fails while distinct-l passes it
    s = anon_check(people, ["zip", "age_band"], k=1, sensitive="disease", l=2) \
        .summary().collect()[0]
    # entropy violators: {flu,flu,cold} H=0.6365 < ln2, {flu} H=0,
    # {cold x4} H=0 -> 3 clusters
    assert s["n_entropy_violating_clusters"] == 3
    assert s["n_l_violating_clusters"] == 2  # distinct-l only catches H==0 ones


def test_kanon_violations_rows(people):
    v = anon_check(people, ["zip", "age_band"], k=3, sensitive="disease", l=2) \
        .violations().collect()
    got = {(r["zip"], r["age_band"]): r for r in v}
    # k-violators: (10001,30-40) size1, (10002,30-40) size2
    # l-violators: (10002,20-30) size4 distinct1 (+ the singleton, already in)
    # entropy-l violator ONLY: (10001,20-30) {flu,flu,cold} H=.6365 < ln2
    assert set(got) == {
        ("10001", "30-40"),
        ("10002", "30-40"),
        ("10002", "20-30"),
        ("10001", "20-30"),
    }
    ent_only = got[("10001", "20-30")]
    assert ent_only["violates_entropy_l"]
    assert not ent_only["violates_k"] and not ent_only["violates_l"]
    assert got[("10002", "20-30")]["violates_l"]
    assert not got[("10002", "20-30")]["violates_k"]
    assert got[("10001", "30-40")]["violates_k"]
    assert got[("10002", "30-40")]["cluster_size"] == 2


def test_kanon_holds_when_k_met(people):
    s = anon_check(people, ["zip"], k=3).summary().collect()[0]
    # zip cluster sizes: 4, 6, 3 -> all >= 3
    assert s["holds"] and s["n_k_violating_clusters"] == 0
    assert s["min_cluster_size"] == 3


def test_kanon_verdicts_sum_to_summary(people):
    chk = anon_check(people, ["zip", "age_band"], k=3)
    v = chk.verdicts().agg(
        F.sum("n_rows"), F.sum("n_k_violating_clusters")
    ).collect()[0]
    s = chk.summary().collect()[0]
    assert v[0] == s["n_rows"] and v[1] == s["n_k_violating_clusters"]


# ---------------------------------------------------------------------------
# Benford


def test_first_digit_expr(spark):
    df = spark.createDataFrame(
        [(123.45,), (0.00042,), (-9000.0,), (0.0,), (None,), (1.0,), (7e22,)],
        "v double",
    )
    got = [r[0] for r in df.select(first_digit_expr(F.col("v"))).collect()]
    assert got == [1, 4, 9, None, None, 1, 7]


def test_first_two_digits(spark):
    df = spark.createDataFrame([(123.45,), (0.0099,), (97000.0,)], "v double")
    got = [r[0] for r in df.select(first_digit_expr(F.col("v"), 2)).collect()]
    assert got == [12, 99, 97]


def test_benford_python_oracle(spark):
    # deterministic multiplicative sequence is Benford-ish; uniform is not
    vals = [1.7 ** i % 10 ** (i % 5 + 1) for i in range(1, 400)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    s = benford_check(df, "v").summary().collect()[0]
    # python oracle
    digits = [int(str(f"{abs(v):.15e}")[0]) for v in vals if v != 0]
    cnt = Counter(digits)
    n = len(digits)
    exp = benford_expected(1)
    mad = sum(abs(cnt.get(d, 0) / n - exp[d]) for d in range(1, 10)) / 9
    chi2 = n * sum(
        (cnt.get(d, 0) / n - exp[d]) ** 2 / exp[d] for d in range(1, 10)
    )
    assert s["n"] == n
    assert s["mad"] == pytest.approx(mad, rel=1e-12)
    assert s["chi2"] == pytest.approx(chi2, rel=1e-9)
    assert s["mad_conformity"] in {
        "close", "acceptable", "marginal", "nonconformity"
    }


def test_benford_conforming_sample(spark):
    # exact Benford frequencies -> mad ~ rounding error -> close conformity
    rows = []
    for d in range(1, 10):
        rows += [(float(d),)] * round(1000 * math.log10(1 + 1 / d))
    df = spark.createDataFrame(rows, "v double")
    s = benford_check(df, "v").summary().collect()[0]
    assert s["mad_conformity"] == "close"
    assert s["holds"] and s["chi2_conforms"]


def test_fused_benford_matches_standalone(spark):
    vals = [(i, float((i * 37 + 11) % 9999) + 0.5) for i in range(1, 500)]
    df = spark.createDataFrame(vals, "id int, v double")
    stand = benford_check(df, "v").summary().collect()[0]
    fp = FusedPass(df, num_partitions=8, partition_key="id").add_benford(
        "ben", "v"
    )
    roll = fp.rollup_benford("ben").collect()[0]
    assert roll["n"] == stand["n"]
    assert roll["mad"] == pytest.approx(stand["mad"], rel=1e-12)
    assert roll["holds"] == stand["holds"]
    # per-partition digit counts sum to the global census
    verd = fp.verdict("ben")
    assert verd.agg(F.sum("n")).collect()[0][0] == stand["n"]
    fp.unpersist()


# ---------------------------------------------------------------------------
# association


def _assoc_oracle(pairs):
    n = len(pairs)
    joint = Counter(pairs)
    ma = Counter(a for a, _ in pairs)
    mb = Counter(b for _, b in pairs)
    r, c = len(ma), len(mb)
    chi2 = 0.0
    for a in ma:
        for b in mb:
            e = ma[a] * mb[b] / n
            o = joint.get((a, b), 0)
            chi2 += (o - e) ** 2 / e
    h = lambda cnts: -sum(v / n * math.log(v / n) for v in cnts.values())
    h_a, h_b, h_ab = h(ma), h(mb), h(joint)
    mi = max(h_a + h_b - h_ab, 0.0)
    phi2 = chi2 / n
    v = math.sqrt(phi2 / (min(r, c) - 1)) if min(r, c) > 1 else 0.0
    return dict(n=n, r=r, c=c, chi2=chi2, h_a=h_a, h_b=h_b, h_ab=h_ab,
                mi=mi, v=v)


def test_assoc_python_oracle(spark):
    pairs = [(f"a{i % 3}", f"b{(i * i + i // 7) % 4}") for i in range(200)]
    df = spark.createDataFrame(pairs, "x string, y string")
    s = assoc_check(df, "x", "y").summary().collect()[0]
    o = _assoc_oracle(pairs)
    assert (s["n"], s["r"], s["c"]) == (o["n"], o["r"], o["c"])
    assert s["chi2"] == pytest.approx(o["chi2"], rel=1e-9)
    assert s["cramers_v"] == pytest.approx(o["v"], rel=1e-9)
    assert s["h_a"] == pytest.approx(o["h_a"], rel=1e-12)
    assert s["mutual_info"] == pytest.approx(o["mi"], rel=1e-9)
    assert s["theil_u_a_given_b"] == pytest.approx(o["mi"] / o["h_a"], rel=1e-9)
    assert s["dof"] == (o["r"] - 1) * (o["c"] - 1)


def test_assoc_functional_dependency_extremes(spark):
    # y = f(x) exactly -> U(y|x) = 1; x independent-ish of z -> U small
    rows = [(i % 6, (i % 6) * 10, i % 5) for i in range(300)]
    df = spark.createDataFrame(rows, "x int, y int, z int")
    s = assoc_check(df, "y", "x").summary().collect()[0]
    assert s["theil_u_a_given_b"] == pytest.approx(1.0, abs=1e-12)
    assert s["cramers_v"] == pytest.approx(1.0, abs=1e-9)
    s2 = assoc_check(df, "x", "z").summary().collect()[0]
    assert s2["mutual_info"] == pytest.approx(0.0, abs=1e-9)
    assert not s2["dependent"]


def test_assoc_constant_column_null_u(spark):
    df = spark.createDataFrame([("k", f"b{i % 3}") for i in range(30)],
                               "x string, y string")
    s = assoc_check(df, "x", "y").summary().collect()[0]
    assert s["theil_u_a_given_b"] is None  # H(A)=0 -> undefined
    assert s["cramers_v"] == 0.0


def test_norm_ppf_known_values():
    assert _norm_ppf(0.975) == pytest.approx(1.959963984540054, abs=1e-12)
    assert _norm_ppf(0.95) == pytest.approx(1.6448536269514722, abs=1e-12)
    assert _norm_ppf(0.5) == pytest.approx(0.0, abs=1e-12)


def test_wilson_hilferty_vs_exact():
    from pyspark_validator.checks.sfd import chi2_ppf
    from pyspark_validator.checks.assoc import _chi2_crit_expr  # noqa: F401

    # the JVM formula's python twin: relative error < 1% for dof >= 3
    z = _norm_ppf(0.95)
    for dof in (3, 8, 20, 100):
        t = 1 - 2 / (9 * dof) + z * math.sqrt(2 / (9 * dof))
        approx = dof * t ** 3
        exact = chi2_ppf(0.95, dof)
        assert abs(approx - exact) / exact < 0.01


def test_assoc_runner_rejects_bad_expect(spark):
    """A typo'd expect (e.g. 'indep') must raise, not silently flip the gate."""
    import pytest

    from pyspark_validator.runner import CheckSpec, ValidationSuite

    df = spark.createDataFrame(
        [("d%d" % i, "a" if i % 2 else "b", "x" if i % 3 else "y")
         for i in range(12)],
        "doc_id string, c1 string, c2 string",
    )
    suite = ValidationSuite(spark, df, num_partitions=4)
    spec = CheckSpec(
        name="bad", kind="assoc",
        params={"col_a": "c1", "col_b": "c2", "expect": "indep"},
    )
    with pytest.raises(ValueError, match="independent"):
        suite.run([spec])


def test_benford_assoc_unpersist_releases_census(spark):
    """BenfordCheck/AssocCheck expose unpersist() (and context-manager form)
    mirroring FusedPass; census blocks must not leak in long sessions."""
    from pyspark_validator.checks.assoc import assoc_check
    from pyspark_validator.checks.benford import benford_check

    df = spark.createDataFrame(
        [(float(i), "a" if i % 2 else "b", "x") for i in range(1, 40)],
        ["v", "c1", "c2"],
    )
    b = benford_check(df, "v")
    b.table().collect()
    assert b.census.storageLevel.useMemory
    b.unpersist()
    assert not b.census.storageLevel.useMemory
    with assoc_check(df, "c1", "c2") as a:
        a.summary().collect()
        assert a.census.storageLevel.useMemory
    assert not a.census.storageLevel.useMemory
    # unpersist before materialization is a no-op, not an error
    benford_check(df, "v").unpersist()


def test_runner_unpersist_drains_live_checks(spark):
    from pyspark_validator.runner import CheckSpec, ValidationSuite

    df = spark.createDataFrame(
        [("d%d" % i, "a" if i % 2 else "b", "x" if i % 3 else "y")
         for i in range(12)],
        "doc_id string, c1 string, c2 string",
    )
    suite = ValidationSuite(spark, df, num_partitions=4)
    spec = CheckSpec(
        name="as", kind="assoc", params={"col_a": "c1", "col_b": "c2"},
    )
    out = suite.run([spec])["as"]
    out.collect()
    assert len(suite._live_checks) == 1
    census = suite._live_checks[0].census
    assert census.storageLevel.useMemory
    suite.unpersist()
    assert not census.storageLevel.useMemory
    assert suite._live_checks == []
