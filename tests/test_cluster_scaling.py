"""Integration test for scripts/cluster_scaling.py: boots a REAL standalone
cluster (master + worker JVMs on localhost), submits the heavy suite via
spark-submit --py-files at two executor counts, and checks the harness's
output contract — executors actually registered at both levels, timings
present, and the per-partition verdict hashes identical across cluster
sizes. Input is shrunk (rep=4, sf0.001) so the test is boot-dominated
(~2 min); the full-scale numbers land in BASELINE.md, not here.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_cluster_scaling_two_executor_levels(tmp_path):
    if not os.path.exists(os.path.join(SF_DIR, "documents.parquet")):
        pytest.skip("testdata not present")
    out = tmp_path / "cluster_scaling.json"
    env = {
        **os.environ,
        "SPARK_GRAFT_SCALE_REP": "4",
        "SPARK_GRAFT_SF_DIR": SF_DIR,
    }
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "cluster_scaling.py"),
            "--workers",
            "2",
            "--high",
            "2",
            "--reps",
            "1",
            "--worker-mem",
            "3g",
            "--executor-mem",
            "2g",
            "--work-dir",
            str(tmp_path / "cluster"),
            "--out",
            str(out),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=REPO,
    )
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    res = json.loads(out.read_text())
    # both levels ran on real executor processes at the requested counts
    assert res["executors_at_1"] == 1
    assert res["executors_at_2"] == 2
    assert res["sec_exec1"] > 0 and res["sec_exec2"] > 0
    assert res["n_docs"] > 0
    # the north-rule exactness claim: per-partition verdicts are pure
    # functions of the data, so cluster size must not change a single byte
    assert res["verdicts_identical_across_cluster_sizes"] is True
    # the engine really shipped as the --py-files artifact
    assert len(res["package_sha256"]) == 64
