"""Reference-API compatibility facade.

Mirrors the reference's pybind11 surface (src/python_bindings/*/bind_*.cpp and
the Algorithm lifecycle of algorithm.cpp:76-96) so a Desbordante user can port
scripts with minimal edits: construct a verifier, ``load_data`` once, call
``execute`` many times with new parameters, read results through the same
getter names (``fd_holds`` / ``get_error`` / ``get_num_error_clusters`` / ...).

Differences, by design (this is Spark, not a single-process engine):
  * ``load_data`` takes a Spark DataFrame, a parquet path, or a pandas frame;
  * column arguments are names or positional indices (the reference is
    index-only);
  * cluster/highlight getters return bounded samples (driver-side lists capped
    by ``cap``) -- at 10^12 rows nobody collects full clusters to one machine.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from pyspark_validator.checks.fd import fd_check
from pyspark_validator.checks.ind import ind_check
from pyspark_validator.checks.ucc import ucc_check


class _Verifier:
    def __init__(self, spark: SparkSession | None = None):
        self._spark = spark
        self._df: DataFrame | None = None

    def _resolve(self, table) -> DataFrame:
        if isinstance(table, DataFrame):
            return table
        if isinstance(table, pd.DataFrame):
            assert self._spark is not None, "pass spark= for pandas input"
            return self._spark.createDataFrame(table)
        if isinstance(table, str):
            spark = self._spark or SparkSession.active()
            return spark.read.parquet(table)
        raise TypeError(f"unsupported table type: {type(table)}")

    def load_data(self, table) -> None:
        """Algorithm::LoadData analog: resolve + cache the input once; execute()
        is re-callable with new params without re-loading (algorithm.cpp:91-95)."""
        self._df = self._resolve(table).persist()
        self._df.count()

    def _cols(self, indices) -> list[str]:
        assert self._df is not None, "call load_data first"
        if all(isinstance(i, int) for i in indices):
            return [self._df.columns[i] for i in indices]
        return list(indices)


class UccVerifier(_Verifier):
    """UCCVerifier analog (bind_ucc_verification.cpp getters)."""

    def execute(self, ucc_indices, cap: int = 100) -> None:
        check = ucc_check(self._df, self._cols(ucc_indices), violation_cap=cap)
        self._summary = check.summary().collect()[0]
        self._violations = (
            check.violations().limit(cap).collect()
            if not self._summary.holds
            else []
        )

    def ucc_holds(self) -> bool:
        return bool(self._summary.holds)

    def get_error(self) -> float:
        return float(self._summary.aucc_error)

    def get_num_clusters_violating_ucc(self) -> int:
        return int(self._summary.n_violating_clusters)

    def get_num_rows_violating_ucc(self) -> int:
        return int(self._summary.n_violating_rows)

    def get_clusters_violating_ucc(self) -> list[list]:
        return [list(r.sample_rows) for r in self._violations]


class FdVerifier(_Verifier):
    """FDVerifier analog (bind_fd_verification.cpp getters)."""

    def execute(self, lhs_indices, rhs_indices, cap: int = 100) -> None:
        check = fd_check(
            self._df,
            self._cols(lhs_indices),
            self._cols(rhs_indices),
            highlight_cap=cap,
        )
        self._summary = check.summary().collect()[0]
        self._highlights = (
            check.highlights().collect() if not self._summary.holds else []
        )

    def fd_holds(self) -> bool:
        return bool(self._summary.holds)

    def get_error(self) -> float:
        return float(self._summary.g1_error)

    def get_num_error_clusters(self) -> int:
        return int(self._summary.n_error_clusters)

    def get_num_error_rows(self) -> int:
        return int(self._summary.n_error_rows)

    def get_highlights(self) -> list[dict]:
        """[{cluster_size, num_distinct_rhs_values,
        most_frequent_rhs_value_proportion, lhs_values}] like Highlight."""
        out = []
        for r in self._highlights:
            d = r.asDict()
            out.append(
                {
                    "cluster_size": d["cluster_size"],
                    "num_distinct_rhs_values": d["num_distinct_rhs"],
                    "most_frequent_rhs_value_proportion": d[
                        "most_frequent_rhs_proportion"
                    ],
                    "lhs_values": [
                        v
                        for k, v in d.items()
                        if k
                        not in (
                            "partition_id",
                            "cluster_size",
                            "num_distinct_rhs",
                            "most_frequent_rhs_proportion",
                        )
                    ],
                }
            )
        return out


class IndVerifier(_Verifier):
    """INDVerifier analog (bind_ind_verification.cpp getters). ``load_data``
    accepts one table or a (lhs_table, rhs_table) pair."""

    def load_data(self, table, rhs_table=None) -> None:
        self._df = self._resolve(table).persist()
        self._df.count()
        self._rhs_df = (
            self._resolve(rhs_table).persist() if rhs_table is not None else self._df
        )

    def _rhs_cols(self, indices) -> list[str]:
        if all(isinstance(i, int) for i in indices):
            return [self._rhs_df.columns[i] for i in indices]
        return list(indices)

    def execute(self, lhs_indices, rhs_indices, cap: int = 100) -> None:
        check = ind_check(
            self._df,
            self._cols(lhs_indices),
            self._rhs_df,
            self._rhs_cols(rhs_indices),
            violation_cap=cap,
        )
        self._summary = check.summary().collect()[0]
        self._violations = (
            check.violations().collect() if not self._summary.holds else []
        )

    def ind_holds(self) -> bool:
        return bool(self._summary.holds)

    def get_error(self) -> float:
        return float(self._summary.error)

    def get_violating_clusters_count(self) -> int:
        return int(self._summary.n_violating_clusters)

    def get_violating_rows_count(self) -> int:
        return int(self._summary.n_violating_rows)

    def get_violating_clusters(self) -> list[tuple]:
        return [tuple(r)[:-1] for r in self._violations]  # drop occurrences col
