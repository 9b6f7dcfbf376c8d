#!/usr/bin/env python3
"""Compare an existing graft.Verify output dir against its oracle_sql.json
in DuckDB — the compare half of verify_local.py, for filtered iteration.

Usage: python3 scripts/compare_out.py <sfDir> <outDir>
"""
import sys, os, importlib.util

sf, out = sys.argv[1], sys.argv[2]
spec = importlib.util.spec_from_file_location(
    "verify_local", os.path.join(os.path.dirname(__file__), "verify_local.py"))
vl = importlib.util.module_from_spec(spec)
# SKIP_RUN is read at module import; set it only for this process's copy
os.environ["SKIP_RUN"] = "1"
spec.loader.exec_module(vl)  # main() is __main__-guarded, nothing runs
fail = vl.run_sf(sf, out)
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
