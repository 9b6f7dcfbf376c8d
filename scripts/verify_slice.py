#!/usr/bin/env python3
"""Big-scale oracle slice compare (the 100x gate).

Runs graft.Verify on a (replica) scale dir for an explicit query list,
then replays each oracle in DuckDB and compares values exactly — the same
strict canonicalization as verify_local.py. Used against the Nx replicas
built by replicate_testdata.py, where only oracle-tractable families run
(pair-explosion SQL twins are excluded by the list, not by the tool).

Usage: python3 scripts/verify_slice.py SFDIR OUTDIR name1,name2,...
Env:   SKIP_RUN=1 reuses OUTDIR's existing Spark output.
"""
import json, math, os, subprocess, sys, time
from decimal import Decimal

import duckdb

SF, OUT, NAMES = sys.argv[1], sys.argv[2], sys.argv[3]
SKIP_RUN = os.environ.get("SKIP_RUN") == "1"

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, Decimal): return format(v, "f")
    if isinstance(v, bytes): return v.hex()
    return str(v)

if not SKIP_RUN:
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF} {OUT} {NAMES}"],
        cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-2000:]); sys.exit(1)

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
oracle = json.load(open(f"{OUT}/oracle_sql.json"))

fails = 0
for name in NAMES.split(","):
    t0 = time.time()
    try:
        sdf = duckdb.connect().sql(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        scols = sorted(sdf.columns)
        spark_rows = duckdb.connect().execute(
            f"SELECT {', '.join(scols)} FROM read_parquet('{OUT}/{name}/*.parquet')").fetchall()
    except Exception as e:
        print(f"MISS {name}: {e}", flush=True); fails += 1; continue
    if name not in oracle:
        print(f"ok?  {name} rows={len(spark_rows)} (rows-only)", flush=True)
        continue
    try:
        odf = con.sql(oracle[name])
        ocols = sorted(odf.columns)
        oracle_rows = con.execute(
            f"SELECT {', '.join(ocols)} FROM ({oracle[name]}) _o").fetchall()
    except Exception as e:
        print(f"ERR  {name}: {e}", flush=True); fails += 1; continue
    if scols != ocols:
        print(f"FAIL {name}: columns {scols} vs {ocols}", flush=True); fails += 1; continue
    if len(spark_rows) != len(oracle_rows):
        print(f"FAIL {name}: rows {len(spark_rows)} vs {len(oracle_rows)}", flush=True)
        fails += 1; continue
    bad = next((i for i, (a, b) in enumerate(zip(spark_rows, oracle_rows))
                if tuple(map(canon, a)) != tuple(map(canon, b))), None)
    if bad is not None:
        print(f"FAIL {name}: first diff at row {bad}: "
              f"{spark_rows[bad]} vs {oracle_rows[bad]}", flush=True)
        fails += 1; continue
    print(f"OK   {name} rows={len(spark_rows)}/{len(oracle_rows)} "
          f"{int(time.time()-t0)}s", flush=True)

print(f"SUMMARY {fails} FAILED" if fails else "SUMMARY all green", flush=True)
sys.exit(1 if fails else 0)
