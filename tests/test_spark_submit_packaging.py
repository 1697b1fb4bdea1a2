"""End-to-end proof of the north rule's deployment story: the engine runs
under ``spark-submit --py-files <zip>`` with no repo checkout available.

The driver shim is copied into a temp dir and executed from there with cwd
set to that dir, so ``pyspark_validator`` can only come from the zip built
by scripts/package.py -- exactly what a cluster submit looks like.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _spark_submit() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else "spark-submit"


def test_package_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from package import build_zip
    finally:
        sys.path.pop(0)
    d1 = build_zip(os.path.join(REPO, "pyspark_validator"), str(tmp_path / "a.zip"))
    d2 = build_zip(os.path.join(REPO, "pyspark_validator"), str(tmp_path / "b.zip"))
    assert d1 == d2
    assert (tmp_path / "a.zip").read_bytes() == (tmp_path / "b.zip").read_bytes()


def test_spark_submit_py_files_end_to_end(tmp_path):
    docs = os.path.join(SF_DIR, "documents.parquet")
    if not os.path.exists(docs):
        pytest.skip("testdata not present")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from package import build_zip
    finally:
        sys.path.pop(0)
    zip_path = str(tmp_path / "pyspark_validator.zip")
    build_zip(os.path.join(REPO, "pyspark_validator"), zip_path)

    driver = tmp_path / "run_suite.py"
    shutil.copyfile(os.path.join(REPO, "scripts", "run_suite.py"), driver)

    out_dir = tmp_path / "verdicts"
    spec = {
        "table": docs,
        "num_partitions": 8,
        "doc_id_col": "doc_id",
        "output": str(out_dir),
        "fuse": True,
        "checks": [
            {"name": "ucc_doc_id", "kind": "ucc", "params": {"columns": ["doc_id"]}},
            {
                "name": "text_present",
                "kind": "completeness",
                "params": {"column": "text", "max_null_fraction": 0.0},
            },
        ],
    }
    spec_path = tmp_path / "suite.json"
    spec_path.write_text(json.dumps(spec))

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # make sure the repo checkout is NOT importable: the zip must provide it
    env.pop("PYTHONPATH", None)

    proc = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[2]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            str(driver),
            "--spec",
            str(spec_path),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"

    verdict_lines = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{") and '"check"' in line
    ]
    by_name = {v["check"]: v for v in verdict_lines}
    assert by_name["ucc_doc_id"]["holds"] is True
    assert by_name["text_present"]["holds"] is True

    # verdict parquet written per check, readable without spark
    import duckdb

    n = duckdb.sql(
        f"select count(*) from '{out_dir}/ucc_doc_id/*.parquet' where holds"
    ).fetchone()[0]
    assert n >= 1


def test_spark_submit_kill_and_resume(tmp_path):
    """North-rule resumability, end-to-end under real spark-submit: SIGKILL a
    suite mid-run, rerun the same spec, and prove completed (check, snapshot,
    partition) triples are NOT recomputed -- each appears exactly once in the
    final manifest, the rerun reports 0 pending partitions for the checks
    finished before the kill, and run_id lineage shows which run did the work."""
    import time

    docs = os.path.join("/root/testdata/sf0.01", "documents.parquet")
    if not os.path.exists(docs):
        pytest.skip("testdata not present")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from package import build_zip
    finally:
        sys.path.pop(0)
    zip_path = str(tmp_path / "pyspark_validator.zip")
    build_zip(os.path.join(REPO, "pyspark_validator"), zip_path)
    driver = tmp_path / "run_suite.py"
    shutil.copyfile(os.path.join(REPO, "scripts", "run_suite.py"), driver)

    ckpt = tmp_path / "manifest"
    checks = [
        {"name": "ucc_doc_id", "kind": "ucc", "params": {"columns": ["doc_id"]}},
        {"name": "text_present", "kind": "completeness",
         "params": {"column": "text", "max_null_fraction": 0.0}},
        {"name": "chars_profile", "kind": "numeric_profile",
         "params": {"column": "n_chars"}},
        {"name": "lang_type", "kind": "type_conformance",
         "params": {"column": "lang", "dtype": "string"}},
        {"name": "chars_benford", "kind": "benford",
         "params": {"column": "n_chars"}},
        {"name": "doc_distinct", "kind": "distinct",
         "params": {"columns": "doc_id", "min_ratio": 0.5}},
    ]
    spec = {
        "table": docs,
        "num_partitions": 8,
        "doc_id_col": "doc_id",
        "checkpoint_path": str(ckpt),
        "snapshot_id": "snap-kill-test",
        "checks": checks,
    }
    spec_path = tmp_path / "suite.json"
    spec_path.write_text(json.dumps(spec))

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)
    cmd = [
        _spark_submit(), "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        str(driver), "--spec", str(spec_path),
    ]

    # run 1: SIGKILL as soon as the first check's manifest append commits
    proc = subprocess.Popen(
        cmd, cwd=str(tmp_path), env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 240
    while time.time() < deadline:
        if list(ckpt.glob("batch-*/part-*.parquet")):
            break
        if proc.poll() is not None:
            break
        time.sleep(0.05)
    proc.kill()
    proc.wait(timeout=60)

    import duckdb

    done_run1 = [
        r[0] for r in duckdb.sql(
            f"select distinct check_id from '{ckpt}/batch-*/part-*.parquet'"
        ).fetchall()
    ]
    assert len(done_run1) >= 1, "kill landed before any manifest append"
    if len(done_run1) == len(checks):
        pytest.skip("suite finished before the kill landed; resume untestable")

    # run 2: same spec to completion
    t0 = time.time()
    proc2 = subprocess.run(
        cmd, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300,
    )
    resume_wall = time.time() - t0
    assert proc2.returncode in (0, 3), proc2.stderr[-3000:]
    lines = {
        j["check"]: j
        for j in (json.loads(ln) for ln in proc2.stdout.splitlines()
                  if ln.startswith("{") and '"check"' in ln)
    }
    # checks completed before the kill report ZERO pending partitions on rerun
    for name in done_run1:
        assert lines[name]["partitions"] == 0, (name, lines[name])
    # every completed triple recorded exactly once across both runs
    dup = duckdb.sql(
        f"""select check_id, partition_id, count(*) c
            from '{ckpt}/batch-*/part-*.parquet'
            group by 1, 2 having count(*) > 1"""
    ).fetchall()
    assert dup == [], f"recomputed triples: {dup}"
    # full coverage: all checks x all 8 partitions present
    cov = duckdb.sql(
        f"""select check_id, count(distinct partition_id)
            from '{ckpt}/batch-*/part-*.parquet' group by 1"""
    ).fetchall()
    assert sorted(cov) == sorted((c["name"], 8) for c in checks)
    # lineage: run-1 rows keep run-1's run_id (two distinct run_ids total)
    n_runs = duckdb.sql(
        f"select count(distinct run_id) from '{ckpt}/batch-*/part-*.parquet'"
    ).fetchone()[0]
    assert n_runs == 2
    print(f"resume wall: {resume_wall:.1f}s, run1 completed {len(done_run1)}/{len(checks)}")


def test_spark_submit_concurrent_runs_with_kill(tmp_path):
    """Manifest concurrency end-to-end: TWO concurrent suite runs share ONE
    manifest dir (the scenario record_verdicts' batch-subdirectory design
    exists for), one of them is SIGKILLed mid-run, the survivor completes,
    and a third run proves a clean resume. Asserts the documented semantics:
    pure-union merge (coverage complete, duplicate triples from the overlap
    allowed), last-wins resolution yields exactly one row per triple,
    duplicate verdicts agree (same data => same verdict), and the torn
    batch dir left by the kill never poisons a read."""
    import time

    docs = os.path.join("/root/testdata/sf0.01", "documents.parquet")
    if not os.path.exists(docs):
        pytest.skip("testdata not present")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from package import build_zip
    finally:
        sys.path.pop(0)
    zip_path = str(tmp_path / "pyspark_validator.zip")
    build_zip(os.path.join(REPO, "pyspark_validator"), zip_path)
    driver = tmp_path / "run_suite.py"
    shutil.copyfile(os.path.join(REPO, "scripts", "run_suite.py"), driver)

    ckpt = tmp_path / "manifest"
    checks = [
        {"name": "ucc_doc_id", "kind": "ucc", "params": {"columns": ["doc_id"]}},
        {"name": "text_present", "kind": "completeness",
         "params": {"column": "text", "max_null_fraction": 0.0}},
        {"name": "chars_profile", "kind": "numeric_profile",
         "params": {"column": "n_chars"}},
        {"name": "lang_type", "kind": "type_conformance",
         "params": {"column": "lang", "dtype": "string"}},
        {"name": "chars_benford", "kind": "benford",
         "params": {"column": "n_chars"}},
        {"name": "doc_distinct", "kind": "distinct",
         "params": {"columns": "doc_id", "min_ratio": 0.5}},
    ]
    spec = {
        "table": docs,
        "num_partitions": 8,
        "doc_id_col": "doc_id",
        "checkpoint_path": str(ckpt),
        "snapshot_id": "snap-concurrent",
        "checks": checks,
    }
    spec_path = tmp_path / "suite.json"
    spec_path.write_text(json.dumps(spec))

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)
    cmd = [
        _spark_submit(), "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        str(driver), "--spec", str(spec_path),
    ]

    # two CONCURRENT runs on the same manifest; kill A once any append commits
    proc_a = subprocess.Popen(
        cmd, cwd=str(tmp_path), env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    proc_b = subprocess.Popen(
        cmd, cwd=str(tmp_path), env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    deadline = time.time() + 300
    while time.time() < deadline:
        if list(ckpt.glob("batch-*/part-*.parquet")):
            break
        if proc_a.poll() is not None and proc_b.poll() is not None:
            break
        time.sleep(0.05)
    proc_a.kill()
    proc_a.wait(timeout=60)
    out_b, _ = proc_b.communicate(timeout=600)
    assert proc_b.returncode in (0, 3), "survivor run failed"

    import duckdb

    glob_sql = f"'{ckpt}/batch-*/part-*.parquet'"
    # union semantics: full coverage despite the kill (B computed everything
    # that wasn't committed when it checked pending -- both started empty)
    cov = duckdb.sql(
        f"select check_id, count(distinct partition_id) from {glob_sql} group by 1"
    ).fetchall()
    assert sorted(cov) == sorted((c["name"], 8) for c in checks)
    # last-wins resolution: ranking by completed_at leaves exactly one row
    # per (check, snapshot, partition) triple even where the overlap wrote two
    resolved = duckdb.sql(
        f"""select count(*) from (
              select *, row_number() over (
                partition by check_id, snapshot_id, partition_id
                order by completed_at desc, run_id desc) rn
              from {glob_sql}) where rn = 1"""
    ).fetchone()[0]
    assert resolved == len(checks) * 8
    # determinism: where both runs committed the same triple, verdicts agree
    disagree = duckdb.sql(
        f"""select check_id, partition_id, count(distinct status)
            from {glob_sql} group by 1, 2 having count(distinct status) > 1"""
    ).fetchall()
    assert disagree == [], f"concurrent runs disagreed: {disagree}"

    # clean resume: a third run sees nothing pending and recomputes nothing
    proc_c = subprocess.run(
        cmd, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc_c.returncode in (0, 3), proc_c.stderr[-3000:]
    lines_c = {
        j["check"]: j
        for j in (json.loads(ln) for ln in proc_c.stdout.splitlines()
                  if ln.startswith("{") and '"check"' in ln)
    }
    for c in checks:
        assert lines_c[c["name"]]["partitions"] == 0, (c["name"], lines_c[c["name"]])
