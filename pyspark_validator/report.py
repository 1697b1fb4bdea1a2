"""Validation-report sink: persist a suite's verdicts as JSON + Markdown.

The reference returns results as in-memory objects and prints text from its
CLI (bind_main_classes.cpp:84-115); at cluster scale the durable equivalents
are (a) the per-partition verdict parquet written by the CLI, (b) the
checkpoint manifest, and (c) this human/machine-readable run report."""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summarize_verdicts(results: dict[str, DataFrame]) -> dict:
    """Roll every check's per-partition verdict frame into one JSON-able dict."""
    checks = {}
    for name, verdicts in results.items():
        cols = verdicts.columns
        agg_exprs = [F.count(F.lit(1)).alias("partitions")]
        if "holds" in cols:
            agg_exprs.append(F.sum((~F.col("holds")).cast("long")).alias("violated"))
        for c in ("n_rows", "n_violating_rows", "n_violating_clusters",
                  "n_error_rows", "n_error_clusters"):
            if c in cols:
                agg_exprs.append(F.sum(c).alias(c))
        row = verdicts.agg(*agg_exprs).collect()[0].asDict()
        row = {k: (int(v) if v is not None else 0) for k, v in row.items()}
        row["holds"] = row.get("violated", 0) == 0
        checks[name] = row
    return {
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "holds": all(c["holds"] for c in checks.values()) if checks else True,
        "checks": checks,
    }


def write_report(results: dict[str, DataFrame], path_prefix: str) -> dict:
    """Write ``<prefix>.json`` and ``<prefix>.md``; returns the summary dict."""
    summary = summarize_verdicts(results)
    with open(f"{path_prefix}.json", "w") as f:
        json.dump(summary, f, indent=1)
    lines = [
        "# Validation report",
        "",
        f"Generated: {summary['generated_at']}  |  Overall: "
        + ("**PASS**" if summary["holds"] else "**VIOLATIONS FOUND**"),
        "",
        "| check | partitions | violated | verdict |",
        "|---|---|---|---|",
    ]
    for name, c in summary["checks"].items():
        lines.append(
            f"| {name} | {c.get('partitions', 0)} | {c.get('violated', 0)} | "
            + ("pass" if c["holds"] else "VIOLATED")
            + " |"
        )
    with open(f"{path_prefix}.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    return summary
