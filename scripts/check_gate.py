#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its DuckDB oracle on the
same parquet, compare row count + columns + order-insensitive values.

Usage: python scripts/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from decimal import Decimal

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(v):
    """STRICT canonicalization mirroring the driver's value-hash: values
    are compared as delivered by toPandas()/.df() — a Decimal on one side
    vs a float64 on the other is a MISMATCH (that asymmetry is exactly
    what sank 14 round-1 queries), and float64s must be bit-identical
    (repr captures all 17 significant digits and distinguishes -0.0)."""
    if isinstance(v, Decimal):
        return f"decimal:{v}"
    if isinstance(v, float):
        return f"float:{v!r}"
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("float") or df[c].map(
                lambda v: isinstance(v, (Decimal, float, bytes))).any():
            df[c] = df[c].map(_canon)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from networkit_spark.session import get_spark

    spark = get_spark(app_name="check-gate")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        s, d = normalize(sdf), normalize(odf)
        status = None
        if list(s.columns) != list(d.columns):
            status = f"schema mismatch: spark={list(s.columns)} duck={list(d.columns)}"
        elif len(s) != len(d):
            status = f"rowcount mismatch: spark={len(s)} duck={len(d)}"
        elif len(s) == 0:
            status = None  # both empty with matching columns
        elif not s.equals(d):
            neq = (s != d) & ~(s.isna() & d.isna())
            bad = neq.any(axis=1)
            status = (f"value mismatch on {int(bad.sum())}/{len(s)} rows; first:\n"
                      f"spark:\n{s[bad].head(3)}\nduck:\n{d[bad].head(3)}")
        if status:
            print(f"FAIL  {name}: {status}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(s)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
