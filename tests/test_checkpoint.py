"""Checkpoint/resume: kill-and-continue without recomputing validated partitions."""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.checkpoint import CheckpointManager
from pyspark_validator.oracle import fixtures
from pyspark_validator.runner import CheckSpec, ValidationSuite


def test_filter_pending_and_record(spark, tmp_path):
    path = str(tmp_path / "manifest")
    ckpt = CheckpointManager(spark, path)
    df = spark.range(100).select(
        (F.col("id") % 10).cast("int").alias("partition_id"), F.col("id")
    )
    # nothing recorded -> everything pending
    assert ckpt.filter_pending(df, "c1", "s1").count() == 100
    # record verdicts for partitions 0..4
    verdicts = spark.createDataFrame(
        [(p, True, 10) for p in range(5)], ["partition_id", "holds", "n_rows"]
    )
    ckpt.record_verdicts("c1", "s1", verdicts)
    assert ckpt.filter_pending(df, "c1", "s1").count() == 50
    # different check / snapshot unaffected
    assert ckpt.filter_pending(df, "c2", "s1").count() == 100
    assert ckpt.filter_pending(df, "c1", "s2").count() == 100
    # manifest carries metrics lineage
    m = ckpt.manifest().filter(F.col("check_id") == "c1").collect()
    assert len(m) == 5
    assert all(r.status == "ok" for r in m)
    assert '"n_rows":10' in m[0].metrics_json


def test_suite_kill_and_continue(spark, tmp_path):
    """Run a suite, then re-run with the same manifest: second run computes 0
    partitions (all resumed)."""
    path = str(tmp_path / "manifest2")
    docs = fixtures.docs_spark_df(spark, 300)
    suite = ValidationSuite(
        spark, docs, num_partitions=8, checkpoint_path=path, snapshot_id="snapA"
    )
    checks = [
        CheckSpec(name="ucc_doc_id", kind="ucc", params={"columns": ["doc_id"]}),
        CheckSpec(name="fd_doc_spans", kind="fd", params={"lhs": ["doc_id"], "rhs": ["span_key"]}),
    ]
    first = suite.run(checks)
    assert first["ucc_doc_id"].count() == 8  # all 8 partitions computed
    # simulate a restart: new suite, same manifest
    suite2 = ValidationSuite(
        spark, docs, num_partitions=8, checkpoint_path=path, snapshot_id="snapA"
    )
    second = suite2.run(checks)
    assert second["ucc_doc_id"].count() == 0  # nothing recomputed
    # but a new snapshot recomputes everything
    suite3 = ValidationSuite(
        spark, docs, num_partitions=8, checkpoint_path=path, snapshot_id="snapB"
    )
    third = suite3.run(checks)
    assert third["ucc_doc_id"].count() == 8
    suite.unpersist(); suite2.unpersist(); suite3.unpersist()


def test_partial_then_resume(spark, tmp_path):
    """Record half the partitions (simulated kill), resume computes only the rest,
    and the union matches a clean full run."""
    path = str(tmp_path / "manifest3")
    ckpt = CheckpointManager(spark, path)
    docs = fixtures.docs_spark_df(spark, 300)
    from pyspark_validator.canonical import canonicalize
    from pyspark_validator.checks.ucc import ucc_check

    canon = canonicalize(docs, num_partitions=8, cache=False)
    full = ucc_check(
        canon.df, ["doc_id"], num_partitions=8, partition_key="doc_id"
    ).verdicts()
    done_half = full.filter(F.col("partition_id") < 4)
    ckpt.record_verdicts("ucc", "s", done_half)
    pending_df = ckpt.filter_pending(canon.df, "ucc", "s")
    resumed = ucc_check(
        pending_df, ["doc_id"], num_partitions=8, partition_key="doc_id"
    ).verdicts()
    got = sorted(
        [tuple(r) for r in resumed.collect()] + [tuple(r) for r in done_half.collect()]
    )
    exp = sorted(tuple(r) for r in full.collect())
    assert got == exp


def test_suite_single_row_check_kinds(spark, tmp_path):
    """nd-style partition-0 framing extends to mfd / sd / md specs."""
    from pyspark.sql import functions as F

    from pyspark_validator.checks.md import ColumnMatch

    docs = spark.createDataFrame(
        [(f"d{i}", [("text", f"span {i % 3}", None, 0)]) for i in range(30)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    suite = ValidationSuite(spark, docs, num_partitions=4)
    # derived numeric column for mfd/sd over the canonical frame
    res = suite.run(
        [
            CheckSpec(
                name="mfd_len",
                kind="custom",
                fn=lambda df: __import__(
                    "pyspark_validator.checks.mfd", fromlist=["mfd_check"]
                )
                .mfd_check(
                    df.withColumn("ln", F.length("span_seq")),
                    ["span_key"], ["ln"], metric="euclidean", parameter=100.0,
                )
                .summary()
                .withColumn("partition_id", F.lit(0)),
            ),
            CheckSpec(
                name="md_spanseq",
                kind="md",
                params={
                    "lhs": [ColumnMatch("equality", "span_seq", "span_seq", 1.0)],
                    "rhs": ColumnMatch("equality", "span_key", "span_key", 1.0),
                    "left_id": "doc_id",
                },
            ),
        ]
    )
    assert res["mfd_len"].collect()[0].holds
    # identical span_seq => identical span_key: the MD must hold
    assert res["md_spanseq"].collect()[0].holds
    # sd spec over an ordered numeric view
    ev = spark.createDataFrame(
        [(f"e{i}", [("text", "x", None, 0)]) for i in range(5)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    s2 = ValidationSuite(spark, ev, num_partitions=2)
    out = s2.run(
        [
            CheckSpec(
                name="sd_key",
                kind="sd",
                params={"order_col": "span_key", "value_col": "span_key",
                        "g1": 0.0, "g2": float("inf")},
            )
        ]
    )
    assert "holds" in out["sd_key"].columns
