"""Local replica of the driver's oracle-compare loop.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at a given sf dir,
then compares the two result sets the way the driver does: row count, sorted
column-name schema, and an order-insensitive value hash. The value hash here is
a strict proxy — both frames are converted to pandas, columns sorted by name,
rows sorted by all columns, and compared cell-for-cell *including dtype* — so
"OK" here implies the driver's hash matches regardless of its exact algorithm
(int64 25 vs float64 25.0 stringify differently under any hashing scheme).

Usage: python scripts/driver_compare.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cell_repr(v) -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "<NULL>"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    return repr(v)


def frame_sig(df: pd.DataFrame) -> list[tuple]:
    return [tuple(cell_repr(v) for v in row) for row in df.itertuples(index=False)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from pyspark_validator.session import get_spark

    spark = get_spark(app_name="driver-compare", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs)
    out: dict[str, dict] = {}
    n_bad = 0
    for name in names:
        t0 = time.time()
        rec: dict = {}
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            if name not in oracles:
                rec = {"err": "no_oracle", "spark_rows": len(sdf)}
                out[name] = rec
                print(f"{name:35s} rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
                continue
            odf = con.execute(oracles[name]).fetchdf()
            s, o = normalize(sdf), normalize(odf)
            rec["rows_match"] = len(s) == len(o)
            rec["schema_match"] = list(s.columns) == list(o.columns)
            vals_match = False
            dtype_diffs = []
            if rec["rows_match"] and rec["schema_match"]:
                vals_match = frame_sig(s) == frame_sig(o)
                for c in s.columns:
                    if str(s[c].dtype) != str(o[c].dtype):
                        dtype_diffs.append((c, str(s[c].dtype), str(o[c].dtype)))
            rec["hash_match"] = vals_match
            rec["dtype_diffs"] = dtype_diffs
            if not (rec["rows_match"] and rec["schema_match"] and vals_match):
                n_bad += 1
                detail = ""
                if dtype_diffs:
                    detail = f" dtypes: {dtype_diffs}"
                elif rec["rows_match"] and rec["schema_match"]:
                    a, b = frame_sig(s), frame_sig(o)
                    diff = next(
                        ((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y),
                        None,
                    )
                    detail = f" first-diff: {diff}"
                print(
                    f"{name:35s} FAIL rows={rec['rows_match']} schema={rec['schema_match']}"
                    f" vals={vals_match}{detail} [{time.time()-t0:.1f}s]"
                )
            else:
                print(f"{name:35s} OK ({len(s)} rows) [{time.time()-t0:.1f}s]")
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            rec = {"err": f"{type(e).__name__}: {e}"}
            print(f"{name:35s} ERROR {rec['err']} [{time.time()-t0:.1f}s]")
        out[name] = rec

    with open("/tmp/driver_compare.json", "w") as f:
        json.dump(out, f, indent=2, default=str)
    print(f"\n{len(names) - n_bad}/{len(names)} green; details /tmp/driver_compare.json")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
