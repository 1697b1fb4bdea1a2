#!/usr/bin/env python
"""Executor-level N -> 4N scaling evidence on a REAL multi-executor cluster.

The north rule's scaling criterion is phrased over EXECUTORS ("two cluster
sizes (N and 4N executors)"), but earlier rounds could only model it with
thread counts inside one JVM (``bench.py --scaling``: local[1] vs local[4]).
This harness closes that gap inside the sandbox: it boots a genuine Spark
STANDALONE cluster on this host (one master + ``--workers`` single-core
worker daemons, each a separate JVM with its own executor memory pool and
localhost-TCP shuffle), packages the engine with ``scripts/package.py``, and
runs the same heavy workload as ``bench.py --scaling`` (UCC(doc_id) +
FD(doc_id -> span_key) over the 8M-doc amplified interleaved table) via

    spark-submit --master spark://127.0.0.1:7077 \
        --py-files dist/pyspark_validator.zip ... scripts/cluster_scaling.py

once with ``spark.cores.max`` = N executors and once with 4N. This is the
exact deploy shape the north rule names (multi-executor cluster, engine
shipped as a --py-files zip), not a thread-count proxy: each executor is its
own JVM process, shuffle blocks move between processes through the shuffle
service codepath, and the driver is a separate client process.

Executor sizing defaults to 1 core per worker so the 4N level uses 4 total
cores -- the span BASELINE.md round 1-4 established as BELOW this host's
memory-bandwidth saturation knee (threads/processes on one VM share one
memory bus; a real cluster multiplies buses with nodes). Efficiency is
(t_N / t_4N) / 4.

Per-partition verdict EXACTNESS across cluster sizes is asserted, not
assumed: each level collects the full per-partition verdict frames of both
checks and the orchestrator requires byte-identical canonical SHA-256 at
N and 4N (verdicts are pure functions of the data: partition_id =
pmod(xxhash64(key), P) and integer aggregates).

Usage:
    python scripts/cluster_scaling.py [--workers 4] [--worker-cores 1]
        [--worker-mem 24g] [--executor-mem 20g] [--low 1] [--high 4]
        [--reps 3] [--out /tmp/cluster_scaling.json]

Numbers land in BASELINE.md / BENCH_r5.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MASTER_PORT = 7077
MASTER_WEBUI = 8080


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


# ---------------------------------------------------------------------------
# worker mode: runs INSIDE spark-submit against the standalone master


def _graph_frames(spark, n: int):
    """The graph-tier soak's synthetic closed-form graph (scale_soak.py
    _graph_tier), built in-memory: n customer vertices + 25 nations + one
    directed in_nation edge per customer; segment 'B' every 1000th id,
    nationkey = id % 25."""
    from pyspark.sql import functions as F

    customers = spark.range(n).select(
        F.col("id").alias("vid"),
        F.col("id").alias("node_id"),
        F.lit("customer").alias("label"),
        F.create_map(
            F.lit("segment"),
            F.when(F.pmod("id", F.lit(1000)) == 0, "B").otherwise("A"),
            F.lit("nationkey"), F.pmod("id", F.lit(25)).cast("string"),
        ).alias("attrs"),
    )
    nations = spark.range(25).select(
        (F.col("id") + 1000000000).alias("vid"),
        (F.col("id") + 1000000000).alias("node_id"),
        F.lit("nation").alias("label"),
        F.create_map(
            F.lit("name"), F.concat(F.lit("n"), F.col("id").cast("string")),
            F.lit("nationkey"), F.col("id").cast("string"),
        ).alias("attrs"),
    )
    vertices = customers.unionByName(nations).repartition(64).persist()
    edges = spark.range(n).select(
        F.col("id").alias("src"),
        (F.pmod("id", F.lit(25)) + 1000000000).alias("dst"),
        F.lit("in_nation").alias("label"),
    ).repartition(64).persist()
    vertices.count()
    edges.count()
    return vertices, edges


def _graph_suite(spark, n: int):
    """Timed phase of the graph workload: the two gfd_customer_nation-shaped
    GFD checks (planted-violation + full-scan holds) over the synthetic
    graph. Returns (elapsed, docs=2n, bad_count, holds_count)."""
    from pyspark_validator.graphs.gfd import Gfd, gfd_violations
    from pyspark_validator.graphs.io import GraphData, VertexData

    # the submit conf pins shuffle partitions to cores_max for the UCC/FD
    # suite (which partitions explicitly); the GFD join chain rides the
    # session value, and ONE sort partition at the 1-executor level spills
    # the whole 32M-row merge join -- fix the fan-out like bench's
    # num_partitions=64 (AQE coalesces the small ones back)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    vertices, edges = _graph_frames(spark, n)
    pattern = GraphData(
        directed=False,
        vertices=[
            VertexData(node_id=0, attrs={"label": "customer"}),
            VertexData(node_id=1, attrs={"label": "nation"}),
        ],
        edges=[(0, 1, "in_nation")],
    )
    gfd_bad = Gfd(
        pattern, [((1, "name"), (-1, "n0"))], [((0, "segment"), (-1, "A"))]
    )
    gfd_holds = Gfd(pattern, [], [((0, "nationkey"), (1, "nationkey"))])
    t0 = time.time()
    bad = gfd_violations(vertices, edges, gfd_bad).count()
    holds = gfd_violations(vertices, edges, gfd_holds).count()
    elapsed = time.time() - t0
    viol_rows = sorted(
        r["v0"] for r in gfd_violations(vertices, edges, gfd_bad).collect()
    )
    sha = hashlib.sha256(repr(viol_rows).encode()).hexdigest()
    vertices.unpersist()
    edges.unpersist()
    return elapsed, 2 * n, bad, holds, sha


def worker_main(cores_max: int, reps: int, workload: str = "validation") -> None:
    from pyspark.sql import SparkSession

    import bench

    spark = SparkSession.builder.getOrCreate()
    sc = spark.sparkContext
    # wait for every requested executor to register before timing anything;
    # getExecutorMemoryStatus includes the driver, hence the -1
    want = cores_max  # 1 core per executor
    deadline = time.time() + 120
    while time.time() < deadline:
        n_exec = sc._jsc.sc().getExecutorMemoryStatus().size() - 1
        if n_exec >= want:
            break
        time.sleep(1)
    else:
        raise SystemExit(f"only {n_exec}/{want} executors registered after 120s")

    if workload == "graph":
        n = int(os.environ.get("SPARK_GRAFT_GRAPH_N", "2000000"))
        best, n_docs = None, 0
        for _ in range(reps):
            elapsed, n_docs, bad, holds, sha = _graph_suite(spark, n)
            best = elapsed if best is None else min(best, elapsed)
        expected_bad = sum(1 for i in range(0, n, 1000) if i % 25 == 0)
        n_exec = sc._jsc.sc().getExecutorMemoryStatus().size() - 1
        print(
            "CLUSTER_WORKER_RESULT "
            + json.dumps(
                {
                    "cores_max": cores_max,
                    "executors": n_exec,
                    "sec": round(best, 3),
                    "n_docs": n_docs,
                    "ucc_verdict_sha": sha,  # violation-row sha (bad GFD)
                    "fd_verdict_sha": f"bad={bad};exp={expected_bad};holds={holds}",
                }
            )
        )
        spark.stop()
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    best, n_docs = None, 0
    for _ in range(reps):
        elapsed, n_docs = bench._heavy_suite(spark, sf_dir)
        best = elapsed if best is None else min(best, elapsed)

    # untimed: canonical per-partition verdict hashes for the exactness claim
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from pyspark_validator.canonical import span_key_expr
    from pyspark_validator.checks.fd import fd_check
    from pyspark_validator.checks.ucc import ucc_check

    ds = entry_mod._docs_spans(spark, sf_dir)
    rep_amp = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "1600"))
    ds = (
        ds.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep_amp - 1))))
        .withColumn("doc_id", F.concat_ws("#", "doc_id", F.col("r").cast("string")))
        .drop("r")
    )

    def _sha(df) -> str:
        rows = sorted(tuple(r) for r in df.collect())
        return hashlib.sha256(repr(rows).encode()).hexdigest()

    ucc_sha = _sha(ucc_check(ds, ["doc_id"], num_partitions=64).verdicts())
    dse = ds.withColumn("span_key", span_key_expr("spans"))
    fd_sha = _sha(
        fd_check(dse, ["doc_id"], ["span_key"], num_partitions=64).verdicts()
    )

    n_exec = sc._jsc.sc().getExecutorMemoryStatus().size() - 1
    print(
        "CLUSTER_WORKER_RESULT "
        + json.dumps(
            {
                "cores_max": cores_max,
                "executors": n_exec,
                "sec": round(best, 3),
                "n_docs": n_docs,
                "ucc_verdict_sha": ucc_sha,
                "fd_verdict_sha": fd_sha,
            }
        )
    )
    spark.stop()


# ---------------------------------------------------------------------------
# orchestrator mode


def _wait_http_json(url: str, pred, timeout: float = 60.0):
    deadline = time.time() + timeout
    last = None
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(url, timeout=5) as r:
                last = json.loads(r.read())
            if pred(last):
                return last
        except Exception:
            pass
        time.sleep(1)
    raise SystemExit(f"timeout waiting on {url}; last={last}")


def _spawn(cmd: list[str], log_path: str, env: dict) -> subprocess.Popen:
    log = open(log_path, "w")
    return subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT, env=env)


def _submit(args, zip_path: str, cores_max: int) -> dict:
    spark_home = _spark_home()
    env = {
        **os.environ,
        "SPARK_HOME": spark_home,
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    }
    cmd = [
        os.path.join(spark_home, "bin", "spark-submit"),
        "--master",
        f"spark://127.0.0.1:{MASTER_PORT}",
        "--deploy-mode",
        "client",
        "--py-files",
        zip_path,
        "--conf",
        f"spark.cores.max={cores_max}",
        "--conf",
        "spark.executor.cores=1",
        "--conf",
        f"spark.executor.memory={args.executor_mem}",
        "--conf",
        "spark.driver.memory=8g",
        "--conf",
        "spark.driver.host=127.0.0.1",
        "--conf",
        "spark.driver.bindAddress=127.0.0.1",
        "--conf",
        f"spark.sql.shuffle.partitions={cores_max}",
        "--conf",
        "spark.sql.adaptive.enabled=true",
        "--conf",
        "spark.sql.adaptive.coalescePartitions.enabled=true",
        "--conf",
        "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf",
        "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf",
        "spark.sql.session.timeZone=UTC",
        "--conf",
        "spark.ui.enabled=false",
        os.path.abspath(__file__),
        "--worker",
        str(cores_max),
        str(args.reps),
        args.workload,
    ]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    lines = [
        ln
        for ln in p.stdout.splitlines()
        if ln.startswith("CLUSTER_WORKER_RESULT ")
    ]
    if p.returncode != 0 or not lines:
        sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-4000:] + "\n")
        raise SystemExit(f"spark-submit (cores.max={cores_max}) failed")
    return json.loads(lines[-1].split(" ", 1)[1])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--worker-cores", type=int, default=1)
    ap.add_argument("--worker-mem", default="24g")
    ap.add_argument("--executor-mem", default="20g")
    ap.add_argument("--low", type=int, default=1, help="N (executors)")
    ap.add_argument("--high", type=int, default=4, help="4N (executors)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/cluster_scaling.json")
    ap.add_argument("--work-dir", default="/tmp/cluster_scaling")
    ap.add_argument(
        "--workload", default="validation", choices=("validation", "graph"),
        help="'validation' = UCC+FD heavy suite (default); 'graph' = the "
             "two gfd_customer_nation-shaped GFD checks over the synthetic "
             "closed-form graph (SPARK_GRAFT_GRAPH_N vertices)",
    )
    args = ap.parse_args()

    os.makedirs(f"{args.work_dir}/logs", exist_ok=True)
    spark_home = _spark_home()
    env = {
        **os.environ,
        "SPARK_HOME": spark_home,
        "SPARK_WORKER_DIR": f"{args.work_dir}/work",
        "PYSPARK_PYTHON": sys.executable,
    }
    spark_class = os.path.join(spark_home, "bin", "spark-class")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from package import build_zip

    zip_path = os.path.join(args.work_dir, "pyspark_validator.zip")
    sha = build_zip(os.path.join(REPO, "pyspark_validator"), zip_path)

    procs: list[subprocess.Popen] = []
    try:
        procs.append(
            _spawn(
                [
                    spark_class,
                    "org.apache.spark.deploy.master.Master",
                    "--host",
                    "127.0.0.1",
                    "--port",
                    str(MASTER_PORT),
                    "--webui-port",
                    str(MASTER_WEBUI),
                ],
                f"{args.work_dir}/logs/master.log",
                env,
            )
        )
        _wait_http_json(
            f"http://127.0.0.1:{MASTER_WEBUI}/json/",
            lambda j: j.get("status") == "ALIVE",
        )
        for i in range(args.workers):
            procs.append(
                _spawn(
                    [
                        spark_class,
                        "org.apache.spark.deploy.worker.Worker",
                        f"spark://127.0.0.1:{MASTER_PORT}",
                        "--host",
                        "127.0.0.1",
                        "--cores",
                        str(args.worker_cores),
                        "--memory",
                        args.worker_mem,
                        "--webui-port",
                        str(MASTER_WEBUI + 1 + i),
                    ],
                    f"{args.work_dir}/logs/worker{i}.log",
                    env,
                )
            )
        _wait_http_json(
            f"http://127.0.0.1:{MASTER_WEBUI}/json/",
            lambda j: sum(1 for w in j.get("workers", []) if w["state"] == "ALIVE")
            >= args.workers,
        )

        results = {}
        for cores_max in (args.low, args.high):
            results[cores_max] = _submit(args, zip_path, cores_max)
    finally:
        for p in reversed(procs):
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()

    lo, hi = results[args.low], results[args.high]
    speedup = lo["sec"] / hi["sec"]
    ratio = args.high / args.low
    n = hi["n_docs"]
    out = {
        "metric": (
            f"scaling efficiency {args.low} -> {args.high} EXECUTORS "
            f"(standalone cluster, spark-submit --py-files, "
            f"{'GFD graph checks' if args.workload == 'graph' else 'UCC+FD heavy suite'})"
        ),
        "value": round(speedup / ratio, 3),
        "unit": "efficiency",
        "n_docs": n,
        "package_sha256": sha,
        f"sec_exec{args.low}": lo["sec"],
        f"sec_exec{args.high}": hi["sec"],
        f"docs_per_sec_exec{args.low}": round(2 * n / lo["sec"], 1),
        f"docs_per_sec_exec{args.high}": round(2 * n / hi["sec"], 1),
        "speedup": round(speedup, 3),
        "executor_ratio": ratio,
        f"executors_at_{args.low}": lo["executors"],
        f"executors_at_{args.high}": hi["executors"],
        "verdicts_identical_across_cluster_sizes": (
            lo["ucc_verdict_sha"] == hi["ucc_verdict_sha"]
            and lo["fd_verdict_sha"] == hi["fd_verdict_sha"]
        ),
        "ucc_verdict_sha": lo["ucc_verdict_sha"][:16],
        "fd_verdict_sha": lo["fd_verdict_sha"][:16],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker_main(
            int(sys.argv[2]),
            int(sys.argv[3]),
            sys.argv[4] if len(sys.argv) > 4 else "validation",
        )
    else:
        sys.exit(main())
