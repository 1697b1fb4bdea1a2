"""Build the --py-files artifact for cluster submission.

The north rule ships the engine to a multi-executor cluster via

    spark-submit --py-files dist/pyspark_validator.zip scripts/run_suite.py \
        --spec suite.json

This script produces that zip deterministically: files are added in sorted
order with zeroed timestamps and fixed permissions, so the same tree always
yields a byte-identical artifact (reproducible deploys; the sha256 printed
here can be pinned in a deploy manifest).

Usage:  python scripts/package.py [--out dist/pyspark_validator.zip]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import zipfile

_EXCLUDE_DIRS = {"__pycache__", ".pytest_cache"}
_EXCLUDE_SUFFIXES = (".pyc", ".pyo")


def build_zip(package_dir: str, out_path: str) -> str:
    """Zip ``package_dir`` (a python package) so its parent is the zip root,
    i.e. ``import pyspark_validator`` works when the zip is on sys.path.
    Returns the sha256 hex digest of the artifact."""
    package_dir = os.path.abspath(package_dir)
    root = os.path.dirname(package_dir)
    entries = []
    for dirpath, dirnames, filenames in os.walk(package_dir):
        dirnames[:] = sorted(d for d in dirnames if d not in _EXCLUDE_DIRS)
        for fn in sorted(filenames):
            if fn.endswith(_EXCLUDE_SUFFIXES):
                continue
            full = os.path.join(dirpath, fn)
            entries.append((os.path.relpath(full, root), full))

    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as f:
                zf.writestr(info, f.read())

    h = hashlib.sha256()
    with open(out_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="package.py", description=__doc__)
    ap.add_argument("--out", default="dist/pyspark_validator.zip")
    ap.add_argument(
        "--package",
        default=os.path.join(os.path.dirname(__file__), "..", "pyspark_validator"),
    )
    args = ap.parse_args(argv)
    digest = build_zip(args.package, args.out)
    print(f"{args.out}  sha256={digest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
