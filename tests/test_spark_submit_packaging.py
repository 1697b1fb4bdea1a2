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
