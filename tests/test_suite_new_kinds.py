"""ValidationSuite routing for the session-23 check kinds (anon / assoc /
reconcile / precedence / interval_overlap) -- spec-level params, manifest
framing, holds semantics."""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.runner import CheckSpec, ValidationSuite


def test_suite_anon_kind(spark):
    rows = [(f"d{i}", "z1" if i < 8 else "z2") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id string, zip string")
    suite = ValidationSuite(spark, docs, num_partitions=4)
    out = suite.run(
        [
            CheckSpec(
                name="kanon",
                kind="anon",
                params={"quasi_identifiers": ["zip"], "k": 3},
            )
        ]
    )["kanon"].collect()
    # z2 has only 2 rows -> its partition fails; totals match
    assert sum(r["n_rows"] for r in out) == 10
    assert sum(r["n_k_violating_clusters"] for r in out) == 1
    assert any(not r["holds"] for r in out)


def test_suite_assoc_kind_expectations(spark):
    rows = [(f"d{i}", i % 4, (i % 4) * 10, i % 3) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id string, x int, y int, z int")
    suite = ValidationSuite(spark, docs, num_partitions=4)
    out = suite.run(
        [
            CheckSpec(
                name="dep",
                kind="assoc",
                params={"col_a": "y", "col_b": "x", "expect": "dependent"},
            ),
            CheckSpec(
                name="indep",
                kind="assoc",
                params={"col_a": "x", "col_b": "z", "expect": "independent"},
            ),
        ]
    )
    dep = out["dep"].collect()[0]
    assert dep["holds"] and dep["partition_id"] == 0
    indep = out["indep"].collect()[0]
    assert indep["holds"]  # x and z genuinely independent here


def test_suite_reconcile_kind(spark):
    parent = spark.createDataFrame(
        [("d1", 30.0), ("d2", 10.0)], "doc_id string, total double"
    )
    child = spark.createDataFrame(
        [("d1", 10.0), ("d1", 20.0), ("d2", 99.0)], "doc_id string, amount double"
    )
    suite = ValidationSuite(spark, parent, num_partitions=4)
    out = suite.run(
        [
            CheckSpec(
                name="rollup",
                kind="reconcile",
                params={
                    "child_df": child,
                    "parent_keys": ["doc_id"],
                    "child_keys": ["doc_id"],
                    "stored": "total",
                    "derived_agg": "sum(amount)",
                },
            )
        ]
    )["rollup"].collect()[0]
    assert out["n_matched"] == 1 and out["n_mismatched"] == 1
    assert not out["holds"]


def test_suite_precedence_and_interval_kinds(spark):
    ev = spark.createDataFrame(
        [("d1", 1, 1, "open"), ("d1", 1, 2, "close"), ("d2", 2, 1, "close")],
        "doc_id string, u int, ts int, et string",
    )
    suite = ValidationSuite(spark, ev, num_partitions=4)
    out = suite.run(
        [
            CheckSpec(
                name="prec",
                kind="precedence",
                params={
                    "keys": ["u"],
                    "ts_col": "ts",
                    "antecedent": "et = 'open'",
                    "consequent": "et = 'close'",
                },
            )
        ]
    )["prec"].collect()[0]
    assert out["n_unpreceded"] == 1 and not out["holds"]

    iv = spark.createDataFrame(
        [("d1", 1, 0.0, 10.0), ("d2", 1, 5.0, 7.0), ("d3", 2, 0.0, 1.0)],
        "doc_id string, k int, s double, e double",
    )
    suite2 = ValidationSuite(spark, iv, num_partitions=4)
    out2 = suite2.run(
        [
            CheckSpec(
                name="ov",
                kind="interval_overlap",
                params={"keys": ["k"], "start_col": "s", "end_col": "e"},
            )
        ]
    )["ov"].collect()[0]
    assert out2["n_overlaps"] == 1 and not out2["holds"]


def test_suite_outlier_kind(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", float(i % 10)) for i in range(50)] + [("dz", 9999.0)],
        "doc_id string, v double",
    )
    suite = ValidationSuite(spark, docs, num_partitions=4)
    out = suite.run(
        [
            CheckSpec(
                name="out_v",
                kind="outlier",
                params={"column": "v", "method": "zscore"},
            ),
            CheckSpec(
                name="out_budget",
                kind="outlier",
                params={
                    "column": "v",
                    "method": "zscore",
                    "max_outlier_fraction": 0.05,
                },
            ),
        ]
    )
    strict = out["out_v"].collect()[0]
    assert strict["n_outliers"] == 1 and not strict["holds"]
    budget = out["out_budget"].collect()[0]
    assert budget["holds"]  # 1/51 < 5% budget
