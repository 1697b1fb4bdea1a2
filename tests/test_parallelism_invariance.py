"""Per-partition verdicts must be byte-identical regardless of physical
parallelism (the north rule's N-vs-4N exactness claim): partition_id is
pmod(xxhash64(key), P) -- a pure function of the data -- and every verdict field
is an exact integer aggregate, so repartitioning the input must never change any
verdict row."""

from pyspark.sql import functions as F

from pyspark_validator.checks.fd import fd_check
from pyspark_validator.checks.ucc import ucc_check


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ucc_verdicts_invariant_to_physical_partitioning(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cols = ["l_orderkey", "l_linenumber"]
    base = _rows(ucc_check(li, cols, num_partitions=16).verdicts())
    for phys in (1, 7, 64):
        v = _rows(ucc_check(li.repartition(phys), cols, num_partitions=16).verdicts())
        assert v == base
    # and under a different shuffle-partition setting
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert _rows(ucc_check(li, cols, num_partitions=16).verdicts()) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_fd_verdicts_invariant_to_physical_partitioning(spark):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    base = _rows(
        fd_check(o, ["o_custkey"], ["o_orderpriority"], num_partitions=16).verdicts()
    )
    for phys in (1, 5, 32):
        v = _rows(
            fd_check(
                o.repartition(phys), ["o_custkey"], ["o_orderpriority"], num_partitions=16
            ).verdicts()
        )
        assert v == base


def test_partition_id_is_data_deterministic(spark):
    """Same doc_id -> same partition_id in any session/layout."""
    from pyspark_validator.canonical import partition_id_expr

    df = spark.createDataFrame([(f"doc_{i}",) for i in range(100)], ["doc_id"])
    a = {
        r.doc_id: r.pid
        for r in df.select(
            "doc_id", partition_id_expr("doc_id", 64).alias("pid")
        ).collect()
    }
    b = {
        r.doc_id: r.pid
        for r in df.repartition(13)
        .select("doc_id", partition_id_expr("doc_id", 64).alias("pid"))
        .collect()
    }
    assert a == b
    assert all(0 <= p < 64 for p in a.values())
