"""Property-based cross-validation: on random small tables, Spark verdicts must
equal a direct pandas computation of the reference formulas (ucc_verifier.cpp,
fd_verifier.cpp, afd_measures.cpp). Extends the reference's golden-value test
style with randomized coverage (the reference has none -- SURVEY.md section 5)."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_validator.checks.fd import fd_check
from pyspark_validator.checks.ucc import ucc_check

# random tables: 1-30 rows, two low-cardinality string columns (forces clusters)
rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.sampled_from(["x", "y", "z"]),
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_ucc_matches_pandas_oracle(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    s = ucc_check(df, ["k"], num_partitions=4).summary().collect()[0]
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    sizes = pdf.groupby("k").size()
    n = len(pdf)
    viol = sizes[sizes > 1]
    assert s.n_rows == n
    assert s.n_distinct == len(sizes)
    assert s.n_violating_clusters == len(viol)
    assert s.n_violating_rows == int(viol.sum())
    assert s.violating_pairs == int((sizes * (sizes - 1)).sum())
    expected_err = (
        float((sizes * (sizes - 1)).sum()) / (n * (n - 1)) if n > 1 else 0.0
    )
    assert float(s.aucc_error) == pytest.approx(expected_err)
    assert s.holds == (len(viol) == 0)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_fd_matches_pandas_oracle(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    s = fd_check(df, ["k"], ["v"], num_partitions=4).summary().collect()[0]
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    n = len(pdf)
    x_sizes = pdf.groupby("k").size()
    xy_sizes = pdf.groupby(["k", "v"]).size()
    ndy = pdf.groupby("k")["v"].nunique()
    conflict = int(
        (x_sizes * (x_sizes - 1)).sum() - (xy_sizes * (xy_sizes - 1)).sum()
    )
    assert s.n_rows == n
    assert s.n_distinct_x == len(x_sizes)
    assert s.n_distinct_xy == len(xy_sizes)
    assert s.n_error_clusters == int((ndy > 1).sum())
    assert s.conflict_pairs == conflict
    expected_g1 = conflict / (n * n - n) if n > 1 else 0.0
    assert float(s.g1_error) == pytest.approx(expected_g1)
    assert s.holds == (len(x_sizes) == len(xy_sizes))
