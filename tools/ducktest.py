#!/usr/bin/env python3
"""Replay the driver's DuckDB oracle compare over a Verify dump."""
import duckdb, json, sys, glob, os
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{q}"
    if not os.path.isdir(spark_dir):
        print(f"{q}: MISSING spark output"); fails += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{spark_dir}/*.parquet")],
                    ignore_index=True) if glob.glob(f"{spark_dir}/*.parquet") else pd.DataFrame()
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"{q}: ORACLE SQL ERROR {e}"); fails += 1; continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        print(f"{q}: SCHEMA mismatch {list(sdf.columns)} vs {list(odf.columns)}"); fails += 1; continue
    if len(sdf) != len(odf):
        print(f"{q}: ROWS mismatch {len(sdf)} vs {len(odf)}"); fails += 1; continue
    key = list(sdf.columns)
    s = sdf.astype(str).sort_values(key).reset_index(drop=True)
    o = odf.astype(str).sort_values(key).reset_index(drop=True)
    if not s.equals(o):
        diff = (s != o).any(axis=1)
        print(f"{q}: VALUE mismatch ({diff.sum()} rows), first:")
        print(s[diff].head(2)); print(o[diff].head(2)); fails += 1; continue
    print(f"{q}: OK ({len(sdf)} rows)")
print(f"\n{'FAIL ' + str(fails) if fails else 'ALL OK'}")
sys.exit(1 if fails else 0)
