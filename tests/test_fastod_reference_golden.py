"""FASTOD set-based OD discovery pinned to the reference's golden result
hashes (src/tests/unit/test_fastod.cpp: ExactFastodResultHashTest /
ApproximateFastodResultHashTest). The hashes are reproduced bit-for-bit:
AttributeSet hashes to its 64-bit mask, CanonicalOD combines context and
attribute-pair hashes with fastod/hashing/hashing.h's mixer, each sorted
result vector folds left from 0, and the final hash folds the (asc, desc,
simple) vector hashes -- see FastodResult.result_hash.

The CSVs are rank-encoded by scripts/fastod_oracle.load_reference_csv with
the reference's own typed comparator (per-value typing, null/empty unordered
below everything, cross-type string-form compare -- type_util.cpp), so even
the mixed-type TestFD case is covered end to end.

A second suite is the property law: on random matrices the Spark miner
equals the pandas brute-force replica (direct per-candidate definition
checks) for both exact and removal-budget modes.
"""

import os
import random
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from fastod_oracle import brute_force_fastod, load_reference_csv  # noqa: E402

from pyspark_validator.od_discovery import FastodResult, mine_set_ods  # noqa: E402

FIXTURES = "/root/reference/test_input_data/"

# (csv, golden hash, error) -- test_fastod.cpp INSTANTIATE_TEST_SUITE_P
GOLDEN = [
    ("od_norm_data/small_2x3.csv", 14827049072319306073, 0.0),
    ("od_norm_data/small_3x3.csv", 66466490561337, 0.0),
    ("od_norm_data/OD_norm.csv", 8741296102670149192, 0.0),
    ("BernoulliRelation.csv", 6518269127574092257, 0.0),
    ("TestFD.csv", 15333753345229147120, 0.0),
    ("od_norm_data/metanome/iris_norm.csv", 11093822414574, 0.0),
    ("TestFD.csv", 6669867546111180267, 0.1),
    ("od_norm_data/metanome/iris_norm.csv", 10544375522104677703, 0.1),
]

# the full golden list also runs through the pandas replica (cheap), pinning
# the walk itself on every fixture incl. the 625-row balance-scale
GOLDEN_ORACLE_ONLY = GOLDEN + [
    ("od_norm_data/metanome/balance-scale_norm.csv", 11093822414574, 0.0),
    ("od_norm_data/metanome/balance-scale_norm.csv", 11093822414574, 0.1),
    ("BernoulliRelation.csv", 6518269127574092257, 0.1),
    ("od_norm_data/small_2x3.csv", 14827049072319306073, 0.1),
    ("od_norm_data/small_3x3.csv", 66466490561337, 0.1),
    ("od_norm_data/OD_norm.csv", 8741296102670149192, 0.1),
]


def _hash_of(simple, asc, desc, p, n):
    return FastodResult(
        columns=[f"v{i}" for i in range(p)],
        simple=simple,
        asc=asc,
        desc=desc,
        n_rows=n,
    ).result_hash()


@pytest.mark.parametrize("path,want,error", GOLDEN_ORACLE_ONLY)
def test_brute_force_replica_matches_reference_hash(path, want, error):
    rows = load_reference_csv(FIXTURES + path)
    p = len(rows[0])
    simple, asc, desc = brute_force_fastod(rows, p, error=error)
    assert _hash_of(simple, asc, desc, p, len(rows)) == want


@pytest.mark.parametrize("path,want,error", GOLDEN)
def test_spark_miner_matches_reference_hash(spark, path, want, error):
    rows = load_reference_csv(FIXTURES + path)
    p = len(rows[0])
    cols = [f"v{i}" for i in range(p)]
    df = spark.createDataFrame([tuple(r) for r in rows], cols)
    res = mine_set_ods(df, cols, error=error)
    assert res.result_hash() == want


def _random_matrix(rng, n, p, card):
    return [[rng.randrange(card) for _ in range(p)] for _ in range(n)]


@pytest.mark.parametrize("seed,error", [(1, 0.0), (2, 0.0), (3, 0.1), (4, 0.2)])
def test_property_law_spark_equals_brute_force(spark, seed, error):
    """Property law: on random low-cardinality matrices (dense ties exercise
    group logic), the batched Spark miner emits exactly the brute-force
    replica's OD sets in all three result classes."""
    rng = random.Random(seed)
    n, p, card = 40, 4, 3
    rows = _random_matrix(rng, n, p, card)
    cols = [f"v{i}" for i in range(p)]
    df = spark.createDataFrame([tuple(r) for r in rows], cols)
    res = mine_set_ods(df, cols, error=error)
    simple, asc, desc = brute_force_fastod(rows, p, error=error)
    assert sorted(map(repr, res.simple)) == sorted(map(repr, simple))
    assert sorted(map(repr, res.asc)) == sorted(map(repr, asc))
    assert sorted(map(repr, res.desc)) == sorted(map(repr, desc))


def test_fastod_compat_facade(spark):
    """compat.Fastod mirrors bind_od.cpp:126-130: get_asc_ods/get_desc_ods/
    get_simple_ods return the reference display strings (1-based indices,
    canonical_od.cpp:34-69) for the brute-force-oracle OD sets."""
    from pyspark_validator import compat

    rows = load_reference_csv(FIXTURES + "od_norm_data/small_3x3.csv")
    p = len(rows[0])
    algo = compat.Fastod(spark)
    algo.load_data(
        spark.createDataFrame(
            [tuple(r) for r in rows], [f"v{i}" for i in range(p)]
        )
    )
    algo.execute()
    simple, asc, desc = brute_force_fastod(rows, p)

    def ctx(c):
        return "{" + ",".join(str(i + 1) for i in sorted(c)) + "}"

    assert algo.get_simple_ods() == sorted(
        f"{ctx(c)} : [] -> {r + 1}<=" for c, r in simple
    )
    assert algo.get_asc_ods() == sorted(
        f"{ctx(c)} : {a + 1}<= ~ {b + 1}<=" for c, a, b in asc
    )
    assert algo.get_desc_ods() == sorted(
        f"{ctx(c)} : {a + 1}>= ~ {b + 1}<=" for c, a, b in desc
    )


def test_max_level_truncates(spark):
    """max_level=2 yields exactly the level<=2 slice: constants, unary-FD
    OFDs, and empty-context order compatibilities."""
    rows = load_reference_csv(FIXTURES + "od_norm_data/OD_norm.csv")
    p = len(rows[0])
    cols = [f"v{i}" for i in range(p)]
    df = spark.createDataFrame([tuple(r) for r in rows], cols)
    res = mine_set_ods(df, cols, max_level=2)
    assert res.levels <= 2
    assert all(len(c) <= 1 for c, _ in res.simple)
    assert all(len(c) == 0 for c, _, _ in res.asc + res.desc)
    # OD_norm plants Weight ~ Shipping cost order compatibility (column 0 ~ 1)
    assert (frozenset(), 0, 1) in res.asc
