"""FD / UCC mining hash goldens vs the reference's own algorithm suites.

Every expected value is lifted verbatim from the reference's consistent-hash
tests over the fixture CSVs its repo ships:

* FD: test_fd_util.h kLightDatasets (Fletcher16 over FDAlgorithm::GetJsonFDs,
  fd_algorithm.cpp:43-55 -- the SAME hash every FD miner family must produce:
  Tane/Pyro/HyFD/FDep/FastFDs/Depminer/FdMine/FUN/Aid/EulerFD/...). The
  serialization is `{"fds": [{"lhs": [i,j], "rhs": k},...]}` with the FD
  strings sorted lexicographically (fd_algorithm.h:83-98, fd.h:19-21,
  vertical.cpp:108-123, column.h:36-38).
* UCC: test_ucc_algorithms.cpp kLightDatasets (tests::Hash over the sorted
  index vectors, test_hash_util.cpp:16-34 -- note the 32-bit wrap of
  x + 0x9e3779b9 before the size_t promotion).

Both run the SPARK miners (discovery.mine_fds / mine_uccs at full lattice
depth) over io.read_reference_csv + cast_inferred, i.e. the reference's CSV
NULL/Empty conventions and type lattice.
"""

import pytest

from pyspark_validator.discovery import mine_fds, mine_uccs
from pyspark_validator.io import cast_inferred, read_reference_csv

REF = "/root/reference/test_input_data"
_M64 = (1 << 64) - 1

#: test_fd_util.h:61-72 kLightDatasets (datasets the reference repo ships)
FD_GOLD = {
    "WDC_astronomical": 22281,
    "WDC_age": 19620,
    "WDC_appearances": 25827,
    "WDC_astrology": 40815,
    "WDC_game": 6418,
    "WDC_science": 19620,
    "WDC_symbols": 28289,
    "WDC_kepler": 63730,
}

#: test_ucc_algorithms.cpp:81-106 kLightDatasets (shipped subset)
UCC_GOLD = {
    "WDC_astronomical": 2089541732445,
    "WDC_symbols": 1,  # duplicate rows -> no UCC at any arity
    "WDC_science": 2658842082150,
    "WDC_satellites": 5208443370856032,
    "WDC_appearances": 82369238361,
    "WDC_astrology": 79554241843163108,
    "WDC_game": 2555214540772530,
    "WDC_kepler": 82426217315737,
    "WDC_planetz": 2555214540772530,
    "WDC_age": 2658842082150,
    "TestWide": 2555250373874,
}


def _fletcher16(s: str) -> int:
    s1 = s2 = 0
    for ch in s.encode():
        s1 = (s1 + ch) % 255
        s2 = (s2 + s1) % 255
    return (s2 << 8) | s1


def _json_fds(fds, cols) -> str:
    idx = {c: i for i, c in enumerate(cols)}
    strs = [
        '{"lhs": [%s], "rhs": %d}'
        % (",".join(str(i) for i in sorted(idx[c] for c in lhs)), idx[rhs])
        for lhs, rhs in fds
    ]
    strs.sort()
    return '{"fds": [' + ",".join(strs) + "]}"


def _hash_vec(vec) -> int:
    """tests::Hash(vector<unsigned>): x is 32-bit unsigned, so
    x + 0x9e3779b9 wraps at 32 bits BEFORE the size_t seed terms join."""
    seed = len(vec) & _M64
    for x in vec:
        x = ((x >> 16) ^ x) * 0x45D9F3B & 0xFFFFFFFF
        x = ((x >> 16) ^ x) * 0x45D9F3B & 0xFFFFFFFF
        x = (x >> 16) ^ x
        t = (x + 0x9E3779B9) & 0xFFFFFFFF
        seed = (seed ^ (t + ((seed << 6) & _M64) + (seed >> 2))) & _M64
    return seed


def _hash_vecvec(vv) -> int:
    h = 1
    for v in vv:
        h = (31 * h + _hash_vec(v)) & _M64
    return h


def _load(spark, name):
    return cast_inferred(read_reference_csv(spark, f"{REF}/{name}.csv"))


@pytest.mark.parametrize("name", sorted(FD_GOLD))
def test_fd_mining_hash(spark, name):
    df = _load(spark, name)
    fds = mine_fds(df, max_lhs=len(df.columns) - 1)
    assert _fletcher16(_json_fds(fds, df.columns)) == FD_GOLD[name]


@pytest.mark.parametrize("name", sorted(UCC_GOLD))
def test_ucc_mining_hash(spark, name):
    df = _load(spark, name)
    idx = {c: i for i, c in enumerate(df.columns)}
    uccs = mine_uccs(df, max_arity=len(df.columns))
    vv = sorted(sorted(idx[c] for c in u) for u in uccs)
    assert _hash_vecvec(vv) == UCC_GOLD[name]


#: test_ind_algorithms.cpp:78-99 kLightConfigsHashes (shipped subset;
#: is_null_equal_null = false -- the LHS must be null-free)
IND_GOLD_STRICT = {
    "INDTestNulls": 170947241093786881,
    "WDC_astronomical": 1,
    "WDC_symbols": 1,
    "WDC_science": 1,
    "WDC_satellites": 1,
    "WDC_appearances": 1,
    "WDC_astrology": 13455143437649811744,
    "WDC_game": 447511263452,
    "WDC_kepler": 1,
    "WDC_planetz": 1,
    "WDC_age": 1,
    "TestWide": 7112674290840,
}

#: test_ind_algorithms.cpp:101-105 kNullConfigsHashes (shipped subset;
#: is_null_equal_null = true -- null is one value that must appear in the RHS)
IND_GOLD_NULL_EQ = {"INDTestNulls": 6131570082162402642}


def _hash_cc(pair):
    """tests::Hash(pair<unsigned, vector<unsigned>>) = 31*table + Hash(cols)."""
    t, vec = pair
    return (31 * t + _hash_vec(vec)) & _M64


def _hash_ind_pair(p):
    l, r = _hash_cc(p[0]), _hash_cc(p[1])
    return (l ^ ((r + 0x9E3779B9 + ((l << 6) & _M64) + (l >> 2)) & _M64)) & _M64


def _hash_inds(pairs):
    h = 1
    for p in sorted(pairs):
        h = (31 * h + _hash_ind_pair(p)) & _M64
    return h


def _ind_hash(spark, name, flag):
    from pyspark_validator.discovery import mine_unary_inds_exact

    df = _load(spark, name)
    idx = {c: i for i, c in enumerate(df.columns)}
    inds = mine_unary_inds_exact({"t": df}, is_null_equal_null=flag)
    return _hash_inds(
        [
            ((0, [idx[a.split(".", 1)[1]]]), (0, [idx[b.split(".", 1)[1]]]))
            for a, b in inds
        ]
    )


@pytest.mark.parametrize("name", sorted(IND_GOLD_STRICT))
def test_ind_mining_hash_null_neq(spark, name):
    assert _ind_hash(spark, name, False) == IND_GOLD_STRICT[name]


@pytest.mark.parametrize("name", sorted(IND_GOLD_NULL_EQ))
def test_ind_mining_hash_null_eq(spark, name):
    assert _ind_hash(spark, name, True) == IND_GOLD_NULL_EQ[name]
