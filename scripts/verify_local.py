#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs graft.Verify on each scale-factor dir, then executes each oracle SQL in
DuckDB against the same parquet tables and compares with the Spark result:
columns sorted by name, declared types compared strictly, values compared
exactly, row order respected.

Usage: python3 scripts/verify_local.py [sfdir ...]
       (no args = BOTH /root/testdata/sf0.01 and /root/testdata/sf0.1 —
        round 2 ran green at one SF while the driver's artifact disagreed;
        one invocation now reproduces the gate at both.)
Env:   SKIP_RUN=1 reuses the existing Spark output dirs.
"""
import json, math, subprocess, sys, glob, os
from decimal import Decimal

SFS = sys.argv[1:] if len(sys.argv) > 1 else [
    "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
SKIP_RUN = os.environ.get("SKIP_RUN") == "1"

import duckdb

def canon(v):
    # Strict, driver-faithful rendering: Decimal keeps its full declared
    # scale (NO trailing-zero strip — the driver hashes the materialized
    # value, so decimal(28,4) vs DECIMAL(38,4) renderings must differ here
    # exactly when they differ there).
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return format(v, "f")
    if isinstance(v, bytes): return v.hex()
    return str(v)

def run_sf(SF, OUT):
    if not SKIP_RUN:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
            cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                                   if "[verify]" in l or "error" in l.lower()) + "\n")
        if r.returncode != 0:
            print(r.stdout[-4000:]); print(r.stderr[-2000:]); return None

    con = duckdb.connect()
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))

    fail = 0
    names = sorted(set(list(oracle.keys()) +
                       [os.path.basename(d) for d in glob.glob(f"{OUT}/*") if os.path.isdir(d)]))
    for name in names:
        qdir = f"{OUT}/{name}"
        if not os.path.isdir(qdir):
            print(f"MISS  {name}: oracle present but no Spark output"); fail += 1; continue
        files = sorted(glob.glob(f"{qdir}/*.parquet"))
        if not files:
            print(f"MISS  {name}: no parquet written"); fail += 1; continue
        sdf = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols = sorted(sdf.columns)
        spark_rows = con.sql(
            f"SELECT {', '.join(scols)} FROM read_parquet({files!r})").fetchall()
        if name not in oracle:
            print(f"ok?   {name}: rows={len(spark_rows)} (no oracle, rows-only check)")
            continue
        try:
            odf = con.sql(oracle[name])
            ocols = sorted(odf.columns)
            oracle_rows = con.sql(
                f"SELECT {', '.join(ocols)} FROM ({oracle[name]}) _o").fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); fail += 1; continue
        if scols != ocols:
            print(f"FAIL  {name}: columns differ spark={scols} oracle={ocols}"); fail += 1; continue
        # Declared result types must match too (driver is type-strict: Spark
        # sum(decimal(18,4)) -> (28,4) vs DuckDB -> (38,4) is a hash mismatch
        # even when every value compares equal).
        stypes = {c: str(t) for c, t in zip(sdf.columns, sdf.types)}
        otypes = {c: str(t) for c, t in zip(odf.columns, odf.types)}
        tdiff = {c: (stypes[c], otypes[c]) for c in scols if stypes[c] != otypes[c]}
        if tdiff:
            print(f"FAIL  {name}: column types differ {tdiff}"); fail += 1; continue
        sc = [[canon(v) for v in r] for r in spark_rows]
        oc = [[canon(v) for v in r] for r in oracle_rows]
        if sc == oc:
            print(f"OK    {name}: {len(sc)} rows")
        else:
            fail += 1
            if sorted(map(tuple, sc)) == sorted(map(tuple, oc)):
                print(f"FAIL  {name}: same multiset, row ORDER differs ({len(sc)} rows)")
            else:
                print(f"FAIL  {name}: values differ spark={len(sc)} oracle={len(oc)} rows")
                sset, oset = set(map(tuple, sc)), set(map(tuple, oc))
                for r in list(sset - oset)[:3]: print(f"   spark-only: {r}")
                for r in list(oset - sset)[:3]: print(f"  oracle-only: {r}")
    con.close()
    return fail

def main():
    results = {}
    for SF in SFS:
        tag = os.path.basename(SF.rstrip("/"))
        OUT = f"/tmp/verify_out_{tag}"
        print(f"=== {SF} -> {OUT} ===")
        results[tag] = run_sf(SF, OUT)

    print("\n== per-SF summary ==")
    bad = 0
    for tag, fail in results.items():
        if fail is None:
            print(f"  {tag}: VERIFY RUN FAILED"); bad += 1
        else:
            print(f"  {tag}: " + ("ALL GREEN" if fail == 0 else f"{fail} FAILURES"))
            bad += fail
    print(("ALL GREEN" if bad == 0 else f"{bad} FAILURES"))
    sys.exit(1 if bad else 0)


# importable (scripts/compare_out.py reuses run_sf) without running the gate
if __name__ == "__main__":
    main()
