"""Temperature-balanced mixture sampling + per-source token-budget
subsetting (pipelines/curation.py, session 20)."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.curation import (
    temperature_mixture,
    temperature_rates,
    token_budget_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    sizes = {"big": 300, "mid": 60, "small": 10}
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s, f"tok{i} " * ((i % 5) + 1)))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string").persist()


def test_temperature_rates_properties(spark, docs):
    flat = temperature_rates(docs, alpha=0.0, target_total=30)
    # alpha=0: p_i uniform -> expected kept per source = 10 each
    assert flat["small"] == 1.0  # 10 docs, expected 10 -> capped at 1
    assert flat["big"] == pytest.approx(10 / 300, abs=1e-6)
    natural = temperature_rates(docs, alpha=1.0, target_total=370)
    # alpha=1: rates all equal (natural proportions, total = corpus size)
    assert natural["big"] == natural["mid"] == natural["small"] == 1.0
    # monotonicity: lower alpha shifts rate mass from big to small sources
    r03 = temperature_rates(docs, alpha=0.3, target_total=100)
    r08 = temperature_rates(docs, alpha=0.8, target_total=100)
    assert r03["big"] < r08["big"]
    assert r03["small"] >= r08["small"]


def test_temperature_mixture_hashlib_oracle(spark, docs):
    rates = temperature_rates(docs, alpha=0.3, target_total=100)
    kept = {r["doc_id"] for r in temperature_mixture(docs, alpha=0.3, target_total=100).collect()}
    rows = docs.collect()
    want = set()
    for r in rows:
        pre = hashlib.md5(f"{r['doc_id']}|temp".encode()).hexdigest()[:12]
        thr = format(int(rates[r["source"]] * 16**12), "012x") if rates[r["source"]] < 1 else "g"
        if pre < thr:
            want.add(r["doc_id"])
    assert kept == want


def _budget_oracle(rows, budget, salt="budget"):
    bysrc = {}
    for r in rows:
        toks = [t for t in re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ") if t]
        key = hashlib.md5(f"{r['doc_id']}|{salt}".encode()).hexdigest()[:12]
        bysrc.setdefault(r["source"], []).append((key, r["doc_id"], len(toks)))
    keep = set()
    for src, lst in bysrc.items():
        cum = 0
        for key, i, n in sorted(lst):
            cum += n  # strict prefix: an overflowing doc still consumes budget
            if cum <= budget:
                keep.add(i)
    return keep


def test_token_budget_exact_matches_python_oracle(spark, docs):
    out = token_budget_sample(docs, budget_tokens=40)
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == _budget_oracle(docs.collect(), 40)
    # per-source totals within budget
    tot = out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    assert all(r["t"] <= 40 for r in tot)


def test_token_budget_approx_mode(spark, docs):
    exact_all = token_budget_sample(docs, budget_tokens=10**9)
    approx_all = token_budget_sample(docs, budget_tokens=10**9, approx=True)
    # budget above total: both keep everything
    assert exact_all.count() == approx_all.count() == docs.count()
    # approx plan is window-free
    plan = (
        token_budget_sample(docs, budget_tokens=40, approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
