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
