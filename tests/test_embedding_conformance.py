"""Embedding (vector-column) conformance (schema.py::embedding_conformance /
embedding_violations).

Laws pinned here:
  * flags are mutually exclusive and priority-ordered (null > bad_dim >
    nonfinite > zero > norm_out): every violating row gets exactly ONE reason;
  * counters equal a python recomputation over a frame planting every
    violation class;
  * a clean frame yields all-zero counters and no violation rows;
  * norm band is optional: without bounds nothing is norm_out;
  * the summary plan is ONE aggregation (map-side combinable) -- no window,
    no join, no Python.
"""

import math

from pyspark.sql import functions as F

from pyspark_validator.schema import embedding_conformance, embedding_violations

ROWS = [
    (0, [1.0, 0.0, 0.0]),           # clean, norm 1
    (1, [0.6, 0.8, 0.0]),           # clean, norm 1
    (2, None),                       # null_vector
    (3, [1.0, 2.0]),                 # bad_dim
    (4, [float("nan"), 1.0, 1.0]),   # nonfinite (NaN)
    (5, [float("inf"), 0.0, 0.0]),   # nonfinite (inf) -- even though dim ok
    (6, [0.0, 0.0, 0.0]),            # zero_vector
    (7, [10.0, 0.0, 0.0]),           # norm_out (10 > hi)
    (8, [0.1, 0.0, 0.0]),            # norm_out (0.1 < lo)
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_summary_counters(spark):
    s = embedding_conformance(_df(spark), dim=3, norm_lo=0.5, norm_hi=2.0).collect()[0]
    assert s.n_rows == 9
    assert s.n_null_vec == 1
    assert s.n_bad_dim == 1
    assert s.n_nonfinite == 2
    assert s.n_zero_vec == 1
    assert s.n_norm_out == 2
    assert math.isclose(s.min_norm, 0.0)  # the zero vector is measurable
    assert math.isclose(s.max_norm, 10.0)


def test_violation_rows_single_reason(spark):
    v = embedding_violations(
        _df(spark), dim=3, norm_lo=0.5, norm_hi=2.0
    ).collect()
    got = {r.vec_id: r.reason for r in v}
    assert got == {
        2: "null_vector",
        3: "bad_dim",
        4: "nonfinite",
        5: "nonfinite",
        6: "zero_vector",
        7: "norm_out",
        8: "norm_out",
    }


def test_clean_frame_and_optional_band(spark):
    clean = _df(spark, [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])])
    s = embedding_conformance(clean, dim=3).collect()[0]
    assert (s.n_null_vec, s.n_bad_dim, s.n_nonfinite, s.n_zero_vec, s.n_norm_out) == (
        0,
        0,
        0,
        0,
        0,
    )
    assert embedding_violations(clean, dim=3).count() == 0
    # without a band, extreme norms are NOT out
    wild = _df(spark, [(0, [100.0, 0.0, 0.0])])
    assert embedding_conformance(wild, dim=3).collect()[0].n_norm_out == 0


def test_summary_is_one_agg(spark):
    res = embedding_conformance(_df(spark), dim=3, norm_lo=0.5, norm_hi=2.0)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    ).split("Initial Plan")[0]
    assert "Window" not in plan and "Join" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan
    # partial + final of the SAME single aggregate: exactly one Exchange
    # (count tree nodes only; the detail section repeats every node name)
    import re

    assert (
        len(re.findall(r"\+- (?:\* )?Exchange", plan))
        + len(re.findall(r"^(?:\* )?Exchange", plan, re.M))
        == 1
    ), plan
