#!/usr/bin/env python3
"""Compare an existing graft.Verify output dir against its oracle_sql.json
in DuckDB — the compare half of verify_local.py, for filtered iteration.

Usage: python3 scripts/compare_out.py <sfDir> <outDir>
"""
import sys, os, importlib.util

sf, out = sys.argv[1], sys.argv[2]
spec = importlib.util.spec_from_file_location(
    "vl", os.path.join(os.path.dirname(__file__), "verify_local.py"))
vl = importlib.util.module_from_spec(spec)
vl.__dict__["__name__"] = "vl"
os.environ["SKIP_RUN"] = "1"
# stop verify_local's main loop from running by giving it no SFs
sys.argv = ["verify_local.py", "/nonexistent-skip"]
src = open(spec.origin).read()
head = src.split("results = {}")[0]
exec(compile(head, spec.origin, "exec"), vl.__dict__)
fail = vl.run_sf(sf, out)
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
