"""Discovery (bonus) tests: mined unary FDs/UCCs/INDs must agree with the
corresponding verifiers (the reference's miner-vs-verifier cross-validation
pattern, test_ucc_verifier.cpp:100-166) and with hand-computed sets."""

from pyspark_validator.checks.fd import fd_check
from pyspark_validator.checks.ind import ind_check
from pyspark_validator.discovery import mine_unary_fds, mine_unary_inds, mine_uccs


def test_mine_unary_fds_nation(spark):
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    fds = mine_unary_fds(n)
    # n_nationkey and n_name are keys -> each determines everything else
    assert ("n_nationkey", "n_regionkey") in fds
    assert ("n_name", "n_regionkey") in fds
    assert ("n_regionkey", "n_nationkey") not in fds
    # cross-validate every mined FD with the verifier
    for lhs, rhs in fds:
        assert fd_check(n, [lhs], [rhs], num_partitions=4).summary().collect()[0].holds


def test_mine_uccs(spark):
    rows = [(1, "a", "x"), (2, "a", "y"), (3, "b", "x"), (4, "b", "y")]
    df = spark.createDataFrame(rows, ["k", "g", "h"])
    uccs = mine_uccs(df, max_arity=2)
    assert ("k",) in uccs
    assert ("g", "h") in uccs  # the four (g,h) combos are distinct
    assert ("g",) not in uccs and ("h",) not in uccs
    # minimality: no pair containing the unary key
    assert not any(len(u) == 2 and "k" in u for u in uccs)


def test_mine_unary_inds_cross_table(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_custkey"
    )
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    inds = mine_unary_inds({"orders": orders, "customer": cust})
    assert ("orders.o_custkey", "customer.c_custkey") in inds
    # cross-validate with the IND verifier
    for a, b in inds:
        ta, ca = a.split(".")
        tb, cb = b.split(".")
        frames = {"orders": orders, "customer": cust}
        s = (
            ind_check(frames[ta], [ca], frames[tb], [cb]).summary().collect()[0]
        )
        assert s.holds, (a, b)


# ---------------------------------------------------------------------------
# Round-2 lattice level 2: mine_fds / mine_afds / mine_ainds vs brute force
# ---------------------------------------------------------------------------
from itertools import combinations

from pyspark_validator.discovery import mine_afds, mine_ainds, mine_fds


def _brute_minimal_fds(rows, columns, max_lhs=2):
    """Textbook oracle: lhs -> rhs iff every lhs-projection maps to one rhs
    value (NULL a value); minimal iff no proper subset (incl. empty) holds."""
    def holds(lhs, rhs):
        seen = {}
        for r in rows:
            k = tuple(r[columns.index(c)] for c in lhs)
            v = r[columns.index(rhs)]
            if k in seen and seen[k] != v:
                return False
            seen[k] = v
        return True

    out = []
    for rhs in columns:
        subsets = [()]
        for size in range(1, max_lhs + 1):
            subsets += list(
                combinations([c for c in columns if c != rhs], size)
            )
        for lhs in subsets:
            if holds(lhs, rhs) and not any(
                holds(sub, rhs)
                for size in range(len(lhs))
                for sub in combinations(lhs, size)
            ):
                out.append((tuple(lhs), rhs))
    return sorted(out)


def _brute_g1(rows, columns, lhs, rhs):
    from collections import Counter

    xy = Counter(
        (tuple(r[columns.index(c)] for c in lhs), r[columns.index(rhs)])
        for r in rows
    )
    x = Counter()
    for (k, _), c in xy.items():
        x[k] += c
    n = len(rows)
    conflict = sum(c * (c - 1) for c in x.values()) - sum(
        c * (c - 1) for c in xy.values()
    )
    return conflict / (n * n - n)


def test_mine_fds_matches_bruteforce(spark):
    cols = ["k1", "k2", "c", "v", "constc"]
    rows = [
        (1, 1, 10, 5, "z"),
        (1, 2, 10, 6, "z"),
        (2, 1, 20, 7, "z"),
        (2, 2, 20, 5, "z"),
    ]
    df = spark.createDataFrame(rows, cols)
    assert mine_fds(df, cols) == _brute_minimal_fds(rows, cols)


def test_mine_fds_null_semantics(spark):
    # NULL is a value: group (1) holds {None, None} -> constant; group (2)
    # holds {None, 'x'} -> mixture breaks the FD
    rows = [(1, None), (1, None), (2, None), (2, "x")]
    df = spark.createDataFrame(rows, ["a", "b"])
    fds = mine_fds(df, ["a", "b"])
    assert (("a",), "b") not in fds
    rows2 = [(1, None), (1, None), (2, "x"), (2, "x")]
    df2 = spark.createDataFrame(rows2, ["a", "b"])
    assert (("a",), "b") in mine_fds(df2, ["a", "b"])


def test_mine_fds_random_vs_bruteforce(spark):
    import random

    rng = random.Random(7)
    cols = ["a", "b", "c", "d"]
    rows = [
        tuple(rng.randrange(3) for _ in cols) for _ in range(40)
    ]
    df = spark.createDataFrame(rows, cols)
    assert mine_fds(df, cols) == _brute_minimal_fds(rows, cols)


def test_mine_afds_g1_matches_bruteforce(spark):
    import random

    rng = random.Random(3)
    cols = ["a", "b", "c"]
    rows = [tuple(rng.randrange(4) for _ in cols) for _ in range(60)]
    df = spark.createDataFrame(rows, cols)
    e = 0.25
    mined = mine_afds(df, cols, max_error=e)
    # brute: minimal under the same budget
    def err(lhs, rhs):
        return _brute_g1(rows, cols, lhs, rhs)

    expect = []
    for rhs in cols:
        subsets = [()]
        for size in (1, 2):
            subsets += list(combinations([c for c in cols if c != rhs], size))
        for lhs in subsets:
            if err(lhs, rhs) <= e and not any(
                err(sub, rhs) <= e
                for size in range(len(lhs))
                for sub in combinations(lhs, size)
            ):
                expect.append((tuple(lhs), rhs))
    assert [(l, r) for l, r, _ in mined] == sorted(expect)
    for lhs, rhs, g1 in mined:
        assert abs(g1 - err(lhs, rhs)) < 1e-12


def test_mine_afds_agrees_with_afd_measures(spark):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    mined = mine_afds(
        o, ["o_custkey", "o_orderstatus", "o_totalprice"], max_error=1e-5
    )
    for lhs, rhs, g1 in mined:
        if not lhs:
            continue
        ref = (
            fd_check(o, list(lhs), [rhs], num_partitions=4)
            .afd_measures()
            .collect()[0]
        )
        assert abs(ref.g1 - g1) < 1e-12


def test_mine_ainds_error_and_threshold(spark):
    a = spark.createDataFrame([(1,), (2,), (3,), (4,)], ["x"])
    b = spark.createDataFrame([(1,), (2,), (3,)], ["y"])
    got = mine_ainds({"a": a, "b": b}, max_error=0.3)
    # a.x has 4 distinct, 1 missing from b.y -> error 0.25 <= 0.3
    assert ("a.x", "b.y", 0.25) in got
    # b.y fully contained in a.x -> error 0.0
    assert ("b.y", "a.x", 0.0) in got
    assert mine_ainds({"a": a, "b": b}, max_error=0.2) == [("b.y", "a.x", 0.0)]


def test_mine_afds_pdep_path(spark):
    # pdep rides the per-candidate job path; cross-check vs a direct pandas
    # computation of 1 - pdep on a small random table
    import random
    from collections import Counter

    rng = random.Random(11)
    cols = ["a", "b", "c"]
    rows = [tuple(rng.randrange(3) for _ in cols) for _ in range(50)]
    df = spark.createDataFrame(rows, cols)
    mined = mine_afds(df, cols, max_error=0.4, measure="pdep")

    def pdep_err(lhs, rhs):
        n = len(rows)
        xy = Counter(
            (tuple(r[cols.index(c)] for c in lhs), r[cols.index(rhs)])
            for r in rows
        )
        x = Counter()
        for (k, _), cnt in xy.items():
            x[k] += cnt
        num = sum(cnt * cnt / x[k] for (k, _), cnt in xy.items())
        return 1.0 - num / n

    for lhs, rhs, err in mined:
        assert err <= 0.4
        assert abs(err - pdep_err(lhs, rhs)) < 1e-9
    # at least the structure is non-trivial on 3-value random data
    assert isinstance(mined, list)


def test_mine_binary_inds_apriori_and_verify(spark):
    from pyspark_validator.discovery import mine_binary_inds

    a = spark.createDataFrame([(1, "x"), (2, "y")], ["u", "v"])
    b = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (1, "y")], ["p", "q"]
    )
    # unary INDs hold component-wise into c, but the PAIRS don't line up
    c = spark.createDataFrame([(1, "y"), (2, "x"), (3, "z")], ["p2", "q2"])
    got = mine_binary_inds({"a": a, "b": b, "c": c})
    assert (("a.u", "a.v"), ("b.p", "b.q")) in got
    assert not any(rhs == ("c.p2", "c.q2") for _, rhs in got)
    # every reported binary IND verifies exactly
    from pyspark_validator.checks.ind import ind_check

    tables = {"a": a, "b": b, "c": c}
    for (l1, l2), (r1, r2) in got:
        ta, ca1 = l1.split("."); _, ca2 = l2.split(".")
        tb, cb1 = r1.split("."); _, cb2 = r2.split(".")
        s = ind_check(tables[ta], [ca1, ca2], tables[tb], [cb1, cb2]).summary().collect()[0]
        assert s["holds"]


def test_lattice_counts_batching_identical(spark):
    from itertools import combinations as _comb

    from pyspark_validator.discovery import _lattice_counts

    df = spark.createDataFrame(
        [(i % 3, i % 5, "v" + str(i % 2)) for i in range(30)], ["a", "b", "c"]
    )
    cols = ["a", "b", "c"]
    sets = [()] + [(c,) for c in cols] + list(_comb(cols, 2)) + [tuple(cols)]
    whole = _lattice_counts(df, sets)
    batched = _lattice_counts(df, sets, max_sets_per_job=2)
    assert whole == batched
    # empty set semantics: one group of n rows
    assert whole[frozenset()] == (1, 30 * 29, 30)


# ---------------------------------------------------------------------------
# Round-2 session 8: arbitrary-depth lattice walk (max_lhs / max_arity >= 3)
# ---------------------------------------------------------------------------


def _brute_minimal_uccs(rows, columns, max_arity):
    out = []
    for k in range(1, max_arity + 1):
        for s in combinations(columns, k):
            if any(set(u) <= set(s) for u in out):
                continue
            proj = {tuple(r[columns.index(c)] for c in s) for r in rows}
            if len(proj) == len(rows):
                out.append(s)
    return sorted(out)


def test_mine_fds_depth3_matches_bruteforce(spark):
    # planted minimal 3-FD: d = f(a, b, c) where no 2-subset determines d
    import random

    rng = random.Random(11)
    rows = []
    for _ in range(50):
        a, b, c = rng.randrange(3), rng.randrange(3), rng.randrange(3)
        d = (a + 2 * b + 4 * c) % 7
        e = rng.randrange(2)
        rows.append((a, b, c, d, e))
    cols = ["a", "b", "c", "d", "e"]
    df = spark.createDataFrame(rows, cols)
    mined = mine_fds(df, cols, max_lhs=3)
    expect = _brute_minimal_fds(rows, cols, max_lhs=3)
    assert mined == expect
    # the planted dependency is found at level 3 unless a subset grabbed it
    assert any(len(lhs) == 3 and rhs == "d" for lhs, rhs in expect)


def test_mine_fds_depth3_random_vs_bruteforce(spark):
    import random

    rng = random.Random(23)
    cols = ["a", "b", "c", "d", "e"]
    rows = [tuple(rng.randrange(2) for _ in cols) for _ in range(24)]
    df = spark.createDataFrame(rows, cols)
    assert mine_fds(df, cols, max_lhs=3) == _brute_minimal_fds(
        rows, cols, max_lhs=3
    )


def test_mine_fds_key_prune_keeps_key_fds(spark):
    # a unary key determines everything at level 1; supersets never re-emit
    rows = [(i, i % 2, i % 3, "z") for i in range(12)]
    cols = ["k", "p", "q", "const"]
    df = spark.createDataFrame(rows, cols)
    mined = mine_fds(df, cols, max_lhs=3)
    assert mined == _brute_minimal_fds(rows, cols, max_lhs=3)
    assert (("k",), "p") in mined and (("k",), "q") in mined
    assert not any(len(lhs) >= 2 and "k" in lhs for lhs, _ in mined)


def test_mine_uccs_depth3_matches_bruteforce(spark):
    # minimal triple key: (a, b, c) unique, no pair unique
    import random

    rng = random.Random(5)
    seen = set()
    rows = []
    while len(rows) < 18:
        t = (rng.randrange(3), rng.randrange(3), rng.randrange(3))
        if t not in seen:
            seen.add(t)
            rows.append(t + (rng.randrange(2),))
    cols = ["a", "b", "c", "x"]
    df = spark.createDataFrame(rows, cols)
    mined = mine_uccs(df, cols, max_arity=3)
    assert mined == _brute_minimal_uccs(rows, cols, 3)
    assert ("a", "b", "c") in mined


def test_mine_afds_g1_depth3_matches_bruteforce(spark):
    import random

    rng = random.Random(17)
    cols = ["a", "b", "c", "d"]
    rows = [tuple(rng.randrange(3) for _ in cols) for _ in range(45)]
    df = spark.createDataFrame(rows, cols)
    e = 0.08
    mined = mine_afds(df, cols, max_error=e, max_lhs=3)

    def err(lhs, rhs):
        return _brute_g1(rows, cols, lhs, rhs)

    expect = []
    for rhs in cols:
        subsets = [()]
        for size in (1, 2, 3):
            subsets += list(combinations([c for c in cols if c != rhs], size))
        for lhs in subsets:
            if err(lhs, rhs) <= e and not any(
                err(sub, rhs) <= e
                for size in range(len(lhs))
                for sub in combinations(lhs, size)
            ):
                expect.append((tuple(lhs), rhs))
    assert [(l, r) for l, r, _ in mined] == sorted(expect)
    for lhs, rhs, g1 in mined:
        assert abs(g1 - err(lhs, rhs)) < 1e-12


def test_mine_afds_pdep_depth3(spark):
    # pdep path walks the same level-wise minimality at depth 3
    import random

    rng = random.Random(29)
    cols = ["a", "b", "c", "d"]
    rows = [tuple(rng.randrange(2) for _ in cols) for _ in range(20)]
    df = spark.createDataFrame(rows, cols)
    g1_mined = mine_afds(df, cols, max_error=0.0, measure="g1", max_lhs=3)
    pd_mined = mine_afds(df, cols, max_error=0.0, measure="pdep", max_lhs=3)
    # at error 0 both measures reduce to exact FDs
    exact = mine_fds(df, cols, max_lhs=3)
    assert [(l, r) for l, r, _ in g1_mined] == exact
    assert [(l, r) for l, r, _ in pd_mined] == exact
