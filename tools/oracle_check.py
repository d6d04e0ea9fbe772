#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: oracle_check.py <sfDir> <verifyOutDir> [q1,q2,...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers the
sf parquet tables as DuckDB views, runs each oracle, and compares the sorted
row multiset + schema against the Spark result parquet in <verifyOutDir>/<q>.
"""
import json, sys, glob
import duckdb

sf, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ("customer", "supplier", "orders", "lineitem", "documents",
          "embeddings", "events"):
    import os
    p = f"{sf}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

fail = 0
for name in sorted(oracles):
    if only and name not in only:
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
    try:
        oracle_rel = con.sql(oracles[name])
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fail += 1; continue
    scols = [c.lower() for c in spark_rel.columns]
    ocols = [c.lower() for c in oracle_rel.columns]
    if scols != ocols:
        print(f"{name}: SCHEMA mismatch spark={scols} oracle={ocols}"); fail += 1; continue
    order = ", ".join(f'"{c}"' for c in spark_rel.columns)
    s = con.execute(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet') ORDER BY {order}").fetchall()
    o = con.execute(f"SELECT * FROM ({oracles[name]}) ORDER BY {order}").fetchall()
    if len(s) != len(o):
        print(f"{name}: ROWS mismatch spark={len(s)} oracle={len(o)}"); fail += 1; continue
    bad = [i for i, (a, b) in enumerate(zip(s, o)) if a != b]
    if bad:
        i = bad[0]
        print(f"{name}: VALUE mismatch at sorted row {i}: spark={s[i]} oracle={o[i]} ({len(bad)} rows differ)")
        fail += 1
    else:
        print(f"{name}: OK ({len(s)} rows)")
sys.exit(1 if fail else 0)
