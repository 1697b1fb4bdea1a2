"""pyspark-validator: a from-scratch PySpark-native schema + constraint validation engine.

Capabilities mirror Desbordante's validation tier (reference at /root/reference, cited
per-module by file:line): per-column statistics, uniqueness (UCC), functional-dependency
validation with the AFD error family (g1 / pdep / tau / mu+ / rho), probabilistic FDs,
inclusion / referential integrity (IND), numerical dependencies (ND), metric FDs, and
distribution-drift checks (PSI / KS / chi-square) -- all re-designed as DataFrame
aggregations and vectorized Arrow UDFs for trillion-row Iceberg/parquet tables of
interleaved text+media documents.

Design rules (see SURVEY.md section 7):
  * Every check is a lazy DataFrame DAG: one hash-partitioned grouped aggregation per
    check where possible; Catalyst does partial (map-side) aggregation so small-key
    verdict rollups never skew.
  * Violation collection is gated on failure and capped (reference precedent: FDVerifier
    early-exit, fd_verifier.cpp:59-62).
  * No per-row Python anywhere; Python-side logic uses Arrow-batched pandas UDFs only.
"""

from pyspark_validator.canonical import (
    CanonicalDocs,
    canonicalize,
    partition_id_expr,
    span_key_expr,
)
from pyspark_validator.checks.ac import ac_check
from pyspark_validator.checks.ar import ar_check
from pyspark_validator.checks.cfd import cfd_check
from pyspark_validator.checks.cind import cind_check
from pyspark_validator.checks.anon import anon_check, suppress_to_k
from pyspark_validator.checks.assoc import assoc_check
from pyspark_validator.checks.benford import benford_check
from pyspark_validator.checks.dc import dc_check
from pyspark_validator.checks.reconcile import reconciliation_check
from pyspark_validator.checks.temporal import (
    interval_overlap_check,
    interval_overlap_violations,
    precedence_check,
    precedence_violations,
)
from pyspark_validator.checks.dd import dd_check
from pyspark_validator.checks.fd import afd_measures, fd_check, pfd_check
from pyspark_validator.checks.ind import ind_check
from pyspark_validator.checks.md import ColumnMatch, md_check
from pyspark_validator.checks.mfd import mfd_check
from pyspark_validator.checks.nar import nar_check
from pyspark_validator.checks.nd import nd_check
from pyspark_validator.checks.od import aod_check
from pyspark_validator.checks.outlier import embedding_outlier_check, outlier_check
from pyspark_validator.checks.pac import domain_pac_check
from pyspark_validator.checks.sd import sd_check
from pyspark_validator.checks.sfd import sfd_check
from pyspark_validator.checks.stats import column_profile
from pyspark_validator.checks.ucc import ucc_check
from pyspark_validator.cfd_discovery import CFDRule, mine_cfds
from pyspark_validator.cind_discovery import CindCondition, CindResult, mine_cinds
from pyspark_validator.discovery import (
    mine_afds,
    mine_ainds,
    mine_ars,
    mine_binary_inds,
    mine_nary_inds,
    mine_fds,
    mine_frequent_itemsets,
    mine_sfds,
    mine_uccs,
    mine_unary_fds,
    mine_unary_inds,
    mine_unary_inds_exact,
)
from pyspark_validator.io import read_reference_csv
from pyspark_validator.od_discovery import FastodResult, mine_set_ods
from pyspark_validator.order_discovery import OrderResult, mine_list_ods
from pyspark_validator.pfd_discovery import mine_afds_tane, mine_pfds
from pyspark_validator.dd_discovery import DDResult, mine_dds
from pyspark_validator.nar_discovery import NarRule, mine_nars
from pyspark_validator.dc_discovery import DCResult, mine_dcs
from pyspark_validator.md_discovery import ColumnMatch, MDRule, mine_mds
from pyspark_validator.report import write_report
from pyspark_validator.schema import (
    ColumnSpec,
    SchemaSpec,
    embedding_conformance,
    embedding_violations,
    quarantine_by_integrity,
    schema_check,
    schema_verdict,
    span_integrity_violations,
)
from pyspark_validator.session import get_spark
from pyspark_validator.sketches import sketch_profile

__all__ = [
    "CanonicalDocs",
    "ac_check",
    "anon_check",
    "assoc_check",
    "afd_measures",
    "benford_check",
    "interval_overlap_check",
    "interval_overlap_violations",
    "embedding_outlier_check",
    "outlier_check",
    "precedence_check",
    "precedence_violations",
    "reconciliation_check",
    "suppress_to_k",
    "aod_check",
    "ar_check",
    "canonicalize",
    "cfd_check",
    "cind_check",
    "column_profile",
    "dc_check",
    "dd_check",
    "domain_pac_check",
    "fd_check",
    "get_spark",
    "ind_check",
    "ColumnMatch",
    "md_check",
    "mfd_check",
    "CFDRule",
    "mine_afds",
    "mine_afds_tane",
    "mine_ainds",
    "mine_cfds",
    "mine_cinds",
    "CindResult",
    "CindCondition",
    "mine_ars",
    "mine_binary_inds",
    "mine_nary_inds",
    "mine_fds",
    "mine_frequent_itemsets",
    "mine_set_ods",
    "mine_list_ods",
    "OrderResult",
    "mine_pfds",
    "mine_dds",
    "mine_nars",
    "mine_dcs",
    "mine_mds",
    "MDRule",
    "ColumnMatch",
    "DCResult",
    "NarRule",
    "DDResult",
    "FastodResult",
    "mine_sfds",
    "mine_uccs",
    "mine_unary_fds",
    "mine_unary_inds",
    "mine_unary_inds_exact",
    "nar_check",
    "nd_check",
    "partition_id_expr",
    "pfd_check",
    "embedding_conformance",
    "embedding_violations",
    "quarantine_by_integrity",
    "read_reference_csv",
    "sd_check",
    "schema_check",
    "schema_verdict",
    "ColumnSpec",
    "SchemaSpec",
    "sfd_check",
    "sketch_profile",
    "span_integrity_violations",
    "span_key_expr",
    "ucc_check",
    "write_report",
]

__version__ = "0.1.0"
