#!/usr/bin/env python
"""Reproduce the round-5 fused-pass root cause in ~3 minutes: two regex
expression families that are ADDITIVE in separate aggregation passes become
4-10x MULTIPLICATIVE in one shared pass — in every execution mode (whole-
stage codegen, codegen off, factoryMode=NO_CODEGEN) and with zero GC delta,
i.e. JIT profile pollution at the shared java.util.regex interpreter call
sites, not a Catalyst plan defect. This is why FusedPass runs one physical
aggregation per ``_Member.group`` (fused.py).

Builds a ~400k-doc corpus from sf0.1 documents (per-replica word suffixes so
parquet dictionary encoding cannot collapse the text), then times:
  chain   = sum(length(regexp_replace(regexp_replace(text, URL), EMAIL)))
  lam_bpe = sum(aggregate(transform(spans, s -> regexp_count(s.text, BPE))))
solo and combined, plus the control pair bpe-on-text + bpe-in-lambda
(identical pattern => additive). Prints one JSON line.

Usage: python scripts/regex_interference_probe.py [--rep 80]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=80)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/regex_probe.parquet")
    args = ap.parse_args()

    from scale_soak import validation_docs
    from pyspark_validator.pipelines.text import BPE_TOKEN_PATTERN, PII_PATTERNS
    from pyspark_validator.session import get_spark

    spark = get_spark(shuffle_partitions=32)
    shutil.rmtree(args.work, ignore_errors=True)
    validation_docs(spark, args.sf_dir, args.rep).write.parquet(args.work)
    P = spark.read.parquet(args.work).persist()
    n = P.count()

    t = F.coalesce(F.col("text"), F.lit(""))
    spans = F.col("spans")
    chain = F.sum(
        F.length(
            F.regexp_replace(
                F.regexp_replace(t, PII_PATTERNS["url"], " "),
                PII_PATTERNS["email"],
                " ",
            )
        )
    ).alias("chain")
    bpe_text = F.sum(F.regexp_count(t, F.lit(BPE_TOKEN_PATTERN))).alias("bt")
    lam_bpe = F.sum(
        F.aggregate(
            F.transform(
                spans,
                lambda s: F.coalesce(
                    F.regexp_count(s["text"], F.lit(BPE_TOKEN_PATTERN)),
                    F.lit(0),
                ),
            ),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
    ).alias("lb")

    def run(exprs):
        s = time.perf_counter()
        P.agg(*exprs).collect()
        return round(time.perf_counter() - s, 2)

    res = {"n_docs": n}
    res["chain_solo"] = run([chain])
    res["lambda_bpe_solo"] = run([lam_bpe])
    res["chain_plus_lambda_SHARED_pass"] = run([chain, lam_bpe])
    res["bpe_text_solo"] = run([bpe_text])
    res["bpe_text_plus_lambda_shared"] = run([bpe_text, lam_bpe])
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    res["chain_plus_lambda_codegen_off"] = run([chain, lam_bpe])
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    res["interference_factor"] = round(
        res["chain_plus_lambda_SHARED_pass"]
        / max(res["chain_solo"] + res["lambda_bpe_solo"], 0.01),
        2,
    )
    res["control_factor_same_pattern"] = round(
        res["bpe_text_plus_lambda_shared"]
        / max(res["bpe_text_solo"] + res["lambda_bpe_solo"], 0.01),
        2,
    )
    print(json.dumps(res))
    P.unpersist()
    shutil.rmtree(args.work, ignore_errors=True)


if __name__ == "__main__":
    main()
