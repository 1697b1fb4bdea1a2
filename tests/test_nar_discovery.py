"""DES NAR-mining tests: the mt19937/generate_canonical replica is pinned
to the standard test vectors, the evolution trajectory is deterministic,
and every emitted rule's qualities satisfy the reference's closed-form
definitions (nar.cpp:25-73) recomputed directly on the data. (The
reference's own DES goldens run on abalone.csv, which is not shipped in
its test_input_data, so trajectory fidelity rests on the pinned RNG plus
a faithful replay of des.cpp/encoded_nar.cpp -- documented in the
module.)"""

import pandas as pd
import pytest

from pyspark_validator.nar_discovery import (
    MT19937,
    FeatureDomain,
    RefRNG,
    _decode,
    _Encoded,
    _rand_indices,
    mine_nars,
)


def test_mt19937_reference_vector():
    """First outputs of std::mt19937 for the default seed 5489."""
    m = MT19937(5489)
    assert [m.next32() for _ in range(5)] == [
        3499211612, 581869302, 3890346734, 3586334585, 545404204,
    ]


def test_generate_canonical_formula():
    """libstdc++ generate_canonical<double,53>: (a + b*2^32) / 2^64."""
    a = MT19937(2)
    lo, hi = a.next32(), a.next32()
    assert RefRNG(2).next() == (lo + (hi << 32)) / 2**64


def test_rand_indices_matches_reference_semantics():
    """GetRandIndices: rejection into an ordered set, ascending output,
    never the excluded index."""
    rng = RefRNG(7)
    for _ in range(50):
        idx = _rand_indices(3, 10, 3, rng)
        assert len(idx) == 3 and 3 not in idx and idx == sorted(idx)
        assert all(0 <= i < 10 for i in idx)


def test_decode_truncation_and_split():
    """encoded_value_range.cpp: int spans truncate toward zero; the
    implication sign splits the permutation order."""
    domains = [FeatureDomain("int", lo=0.0, hi=10.0),
               FeatureDomain("string", values=["a", "b", "c"])]
    # permutation: feature1 first (0.9 > 0.1); thresholds 1.0 keep both
    # (threshold < draw is the skip condition and draws are < 1).
    ind = _Encoded(0.0, [[0.1, 1.0, 0.55, 0.21], [0.9, 1.0, 0.99, 0.0]])
    ante, cons = _decode(ind, domains, RefRNG(2))
    # sign 0.0 -> sign_after 0: first processed feature (f1) is ante,
    # second (f0) is cons.
    assert ante == {1: "c"} and cons == {0: (2.0, 5.0)}  # int truncation


@pytest.fixture(scope="module")
def frame(spark):
    pdf = pd.DataFrame(
        {
            "grp": (["hot"] * 40 + ["cold"] * 60),
            "temp": [30 + (i % 10) for i in range(40)]
            + [-5 + (i % 10) for i in range(60)],
            "load": [float(i % 7) for i in range(100)],
        }
    )
    return spark.createDataFrame(pdf)


def test_deterministic_trajectory(frame):
    kw = dict(population_size=12, max_fitness_evaluations=24, seed=2)
    r1 = mine_nars(frame, ["grp", "temp", "load"], **kw)
    r2 = mine_nars(frame, ["grp", "temp", "load"], **kw)
    assert [str(r) for r in r1] == [str(r) for r in r2]
    assert [r.fitness for r in r1] == [r.fitness for r in r2]
    assert r1 and r1[0].fitness == max(r.fitness for r in r1)


def test_rule_qualities_law(frame):
    """support = |ante&cons|/n, confidence = |ante&cons|/|ante|, fitness =
    (conf + sup + inclusion)/3 -- recomputed directly in pandas."""
    rules = mine_nars(frame, ["grp", "temp", "load"],
                      population_size=10, max_fitness_evaluations=20, seed=3)
    pdf = frame.toPandas()
    n = len(pdf)
    for r in rules:
        def fits(side):
            m = pd.Series(True, index=pdf.index)
            for col, rng in side.items():
                if isinstance(rng, tuple):
                    m &= (pdf[col] >= rng[0]) & (pdf[col] <= rng[1])
                else:
                    m &= pdf[col] == rng
            return m
        a = fits(r.ante)
        both = a & fits(r.cons)
        assert r.support == pytest.approx(both.sum() / n)
        assert r.confidence == pytest.approx(both.sum() / a.sum())
        incl = (len(r.ante) + len(r.cons)) / 3
        assert r.fitness == pytest.approx((r.confidence + r.support + incl) / 3)


def test_minsup_minconf_strict(frame):
    loose = mine_nars(frame, ["grp", "temp"], population_size=10,
                      max_fitness_evaluations=20, seed=2)
    tight = mine_nars(frame, ["grp", "temp"], minsup=0.3, minconf=0.9,
                      population_size=10, max_fitness_evaluations=20, seed=2)
    assert all(r.support > 0.3 and r.confidence > 0.9 for r in tight)
    assert {str(r) for r in tight} <= {str(r) for r in loose}


def test_des_facade(spark, frame):
    from pyspark_validator.compat import DES

    algo = DES(spark)
    algo.load_data(frame.select("grp", "temp"))
    algo.execute(population_size=10, max_fitness_evaluations=15)
    nars = algo.get_nars()
    assert nars and all(hasattr(r, "fitness") for r in nars)
    fits = [r.fitness for r in nars]
    assert fits == sorted(fits, reverse=True)
