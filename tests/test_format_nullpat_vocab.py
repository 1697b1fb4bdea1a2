"""Format-mask profiling, null-pattern census, vocabulary drift, and the
incremental Benford member (fold + retract laws)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pyspark_validator.checks.stats import (
    format_conformance,
    format_mask_expr,
    format_profile,
    null_pattern_census,
)
from pyspark_validator.pipelines.text import vocab_drift


# ---------------------------------------------------------------------------
# format masks


def test_format_mask_expr(spark):
    df = spark.createDataFrame(
        [("Abc-123",), ("NY 10001",), ("",), (None,), ("éxō",)], "s string"
    )
    got = [r[0] for r in df.select(format_mask_expr(F.col("s"))).collect()]
    # ASCII classes only; non-ASCII letters pass through verbatim (documented)
    assert got == ["Aaa-999", "AA 99999", "", None, "éaō"]


def test_format_profile_python_oracle(spark):
    vals = [f"X{i % 3}{'y' * (i % 4)}" for i in range(60)] + [None] * 5

    def mask(v):
        if v is None:
            return None
        out = []
        for ch in v:
            out.append(
                "A" if ch.isupper() else "a" if ch.islower() else
                "9" if ch.isdigit() else ch
            )
        return "".join(out)

    cnt = Counter(mask(v) for v in vals)
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = format_profile(df, "s", k=10).collect()
    got = {r["mask"]: (r["cnt"], r["fraction"]) for r in rows}
    assert set(got) == set(cnt)
    for m, (c, f) in got.items():
        assert c == cnt[m]
        assert f == pytest.approx(cnt[m] / 65, rel=1e-12)
    # deterministic order: count desc then mask asc
    keys = [(r["cnt"], r["mask"]) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1] or ""))


def test_format_conformance_gate(spark):
    good = spark.createDataFrame([(f"AB-{i:04d}",) for i in range(200)], "s string")
    s = format_conformance(good, "s").collect()[0]
    assert s["holds"] and s["n_masks"] == 1 and s["top_mask"] == "AA-9999"
    mixed = good.union(
        spark.createDataFrame([(f"broken {i}",) for i in range(10)], "s string")
    )
    s2 = format_conformance(mixed, "s", min_fraction=0.99).collect()[0]
    assert not s2["holds"]
    assert s2["top_mask_cnt"] == 200 and s2["n"] == 210


# ---------------------------------------------------------------------------
# null-pattern census


def test_null_pattern_census_oracle(spark):
    rows = [
        (1, "a"), (None, "b"), (1, None), (None, None), (2, "c"), (None, "d"),
    ]
    df = spark.createDataFrame(rows, "x int, y string")
    got = {
        r["pattern"]: r["cnt"] for r in null_pattern_census(df, ["x", "y"]).collect()
    }
    assert got == {"00": 2, "10": 2, "01": 1, "11": 1}
    fr = {
        r["pattern"]: r["fraction"]
        for r in null_pattern_census(df, ["x", "y"]).collect()
    }
    assert fr["00"] == pytest.approx(2 / 6)


def test_null_pattern_census_correlated_missingness(spark):
    # x and y always null together: only '00' and '11' appear
    rows = [(i if i % 3 else None, f"v{i}" if i % 3 else None) for i in range(30)]
    df = spark.createDataFrame(rows, "x int, y string")
    pats = {r["pattern"] for r in null_pattern_census(df, ["x", "y"]).collect()}
    assert pats == {"00", "11"}


# ---------------------------------------------------------------------------
# vocabulary drift


def _vocab_oracle(bt, ct):
    cb, cc = Counter(), Counter()
    for t in bt:
        cb.update(t.lower().split())
    for t in ct:
        cc.update(t.lower().split())
    nb, nc = sum(cb.values()), sum(cc.values())
    new = {t for t in cc if t not in cb}
    van = {t for t in cb if t not in cc}
    jsd = 0.0
    for t in set(cb) | set(cc):
        p, q = cb.get(t, 0) / nb, cc.get(t, 0) / nc
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log2(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log2(q / m)
    return dict(
        new=len(new), van=len(van),
        new_mass=sum(cc[t] for t in new) / nc,
        van_mass=sum(cb[t] for t in van) / nb,
        jsd=jsd, nb=nb, nc=nc,
        tb=len(cb), tc=len(cc),
    )


def test_vocab_drift_python_oracle(spark):
    bt = ["alpha beta gamma", "beta gamma delta", "old relic here"]
    ct = ["alpha beta beta", "gamma fresh tokens", "fresh fresh delta"]
    b = spark.createDataFrame([(t,) for t in bt], "text string")
    c = spark.createDataFrame([(t,) for t in ct], "text string")
    r = vocab_drift(b, c).collect()[0]
    o = _vocab_oracle(bt, ct)
    assert (r["n_tokens_b"], r["n_tokens_c"]) == (o["nb"], o["nc"])
    assert (r["n_types_b"], r["n_types_c"]) == (o["tb"], o["tc"])
    assert r["n_new_types"] == o["new"]
    assert r["n_vanished_types"] == o["van"]
    assert r["new_type_mass"] == pytest.approx(o["new_mass"], rel=1e-12)
    assert r["vanished_type_mass"] == pytest.approx(o["van_mass"], rel=1e-12)
    assert r["jsd"] == pytest.approx(o["jsd"], rel=1e-12)


def test_vocab_drift_identical_corpora(spark):
    b = spark.createDataFrame([("same words here",)] * 4, "text string")
    r = vocab_drift(b, b).collect()[0]
    assert r["jsd"] == pytest.approx(0.0, abs=1e-15)
    assert r["n_new_types"] == 0 and r["n_vanished_types"] == 0
    assert not r["drift_detected"]


def test_vocab_drift_new_mass_gate(spark):
    b = spark.createDataFrame([("stable corpus",)] * 5, "text string")
    c = spark.createDataFrame([("entirely novel vocabulary",)] * 5, "text string")
    r = vocab_drift(b, c, new_mass_threshold=0.2).collect()[0]
    assert r["new_type_mass"] == pytest.approx(1.0)
    assert r["drift_detected"]


# ---------------------------------------------------------------------------
# incremental Benford (fold + retract)


def test_incremental_benford_fold_and_retract(spark, tmp_path):
    from pyspark_validator.fused import FusedPass, IncrementalFused

    def fp(df):
        return FusedPass(df, num_partitions=8, partition_key="id").add_benford(
            "ben", "v"
        )

    rows = [(i, float((i * 37 + 11) % 9999) + 0.5) for i in range(1, 400)]
    df = spark.createDataFrame(rows, "id int, v double")
    base = df.filter(F.col("id") % 3 != 0)
    d1 = df.filter(F.col("id") % 3 == 0)
    gone = df.filter(F.col("id") % 7 == 0)

    inc = IncrementalFused(fp(base), str(tmp_path / "ben_state"))
    inc.initialize()
    inc.apply_delta(d1)
    inc.apply_delta(deletes=gone)

    kept = df.filter(F.col("id") % 7 != 0)
    got = {r.partition_id: r for r in inc.verdict("ben").collect()}
    want = {r.partition_id: r for r in fp(kept).verdict("ben").collect()}
    for pid, w in want.items():
        g = got[pid]
        assert g.n == w.n, pid
        if w.mad is None:
            assert g.mad is None
        else:
            assert g.mad == pytest.approx(w.mad, rel=1e-12)
        assert g.holds == w.holds
