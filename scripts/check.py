#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet written by graft.Verify, runs
the matching oracle SQL from oracle_sql.json in DuckDB over the same
sf tables, sorts columns by name, and compares row/schema/value hashes.
Driver-side-only tooling (duckdb/pandas are not available to the Spark
job itself).
"""
import hashlib
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        try:
            v = list(v.tolist() if hasattr(v, "tolist") else v)
        except Exception:
            pass
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = ["\x1f".join(norm_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    rows.sort()  # order-insensitive, like a sorted-row hash
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return h, len(df), list(df.columns)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failed = []
    for name in sorted(oracle):
        pq_dir = Path(out_dir, name)
        if not pq_dir.exists():
            print(f"FAIL {name}: no spark output")
            failed.append(name)
            continue
        got = pd.read_parquet(pq_dir)
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        gh, gn, gc = frame_hash(got)
        eh, en, ec = frame_hash(exp)
        if gc != ec:
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
            failed.append(name)
        elif gn != en:
            print(f"FAIL {name}: rows spark={gn} oracle={en}")
            failed.append(name)
        elif gh != eh:
            print(f"FAIL {name}: hash mismatch ({gn} rows)")
            merged = got[sorted(got.columns)].reset_index(drop=True).compare(
                exp[sorted(exp.columns)].reset_index(drop=True))
            print(merged.head(5))
            failed.append(name)
        else:
            print(f"OK   {name} ({gn} rows)")
    spark_only = [n for n in Path(out_dir).iterdir()
                  if n.is_dir() and n.name not in oracle]
    for n in sorted(spark_only):
        rows = len(pd.read_parquet(n))
        print(f"ROWS {n.name} ({rows} rows, no oracle)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle-checked OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
