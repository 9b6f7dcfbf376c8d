#!/usr/bin/env python3
"""Build a synthetic Nx replica of a testdata scale-factor dir (default:
10x of /root/testdata/sf0.1 -> /tmp/graft-sf0.1-x10) for the 4th-scale-point
correctness run: every new SF so far caught a real bug (int64 overflow at
sf0.1; the K-floor geometry only visible across sf0.01 vs sf0.1), so the
full 184-query Spark-vs-DuckDB compare runs once on this corpus too:

    python3 scripts/replicate_testdata.py
    python3 scripts/verify_local.py /tmp/graft-sf0.1-x10

Replication discipline (round-7 constant-density rules):
  - fixed dimensions (region, nation) are NOT replicated — natural scaling
    keeps them fixed, and key-offset copies would break FK realism;
  - fact/entity keys are offset per replica (custkey, orderkey, partkey,
    suppkey, event_id, user_id, doc_id, vec_id) so key uniqueness and
    referential integrity survive;
  - document tokens are suffixed with the replica index for k>0, so
    near-dup DENSITY stays constant while volume grows Nx;
  - embeddings are coordinate-rotated per replica (orthogonal: preserves
    within-replica cosines, decorrelates replicas);
  - timestamps, floats, and categorical values are copied verbatim (time
    grids densify, ranges stay put — the realistic growth mode).
The compare itself needs only that Spark and DuckDB read the SAME files,
but keeping keys/FKs coherent keeps plan shapes (joins, skew) realistic.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
DST = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/graft-{os.path.basename(SRC)}-x{REPS}"

con = duckdb.connect()
os.makedirs(DST, exist_ok=True)

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def copy(t, select_for_k):
    parts = " UNION ALL ".join(select_for_k(k) for k in range(REPS))
    con.execute(f"COPY ({parts}) TO '{DST}/{t}.parquet' (FORMAT parquet)")
    n, = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()
    print(f"{t}: {n} rows")

# fixed dimensions: verbatim
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' (FORMAT parquet)")
    print(f"{t}: copied verbatim")

# per-replica key stride = max+1 (keys are 0-based; a bare max would
# collide each replica's first key with its predecessor's last)
mx = {t: con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]
      for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                   ("part", "p_partkey"), ("orders", "o_orderkey"),
                   ("events", "event_id"), ("documents", "doc_id"),
                   ("embeddings", "vec_id")]}
mxuser, = con.execute(f"SELECT max(user_id) + 1 FROM {src('events')}").fetchone()
dim, = con.execute(f"SELECT len(embedding) FROM {src('embeddings')} LIMIT 1").fetchone()

copy("customer", lambda k:
    f"SELECT c_custkey + {k * mx['customer']} AS c_custkey, c_name, c_nationkey,"
    f" c_acctbal, c_mktsegment FROM {src('customer')}")
copy("supplier", lambda k:
    f"SELECT s_suppkey + {k * mx['supplier']} AS s_suppkey, s_name, s_nationkey,"
    f" s_acctbal FROM {src('supplier')}")
copy("part", lambda k:
    f"SELECT p_partkey + {k * mx['part']} AS p_partkey, p_name, p_brand, p_type,"
    f" p_size, p_retailprice FROM {src('part')}")
copy("orders", lambda k:
    f"SELECT o_orderkey + {k * mx['orders']} AS o_orderkey,"
    f" o_custkey + {k * mx['customer']} AS o_custkey, o_orderstatus, o_totalprice,"
    f" o_orderdate, o_orderpriority FROM {src('orders')}")
copy("lineitem", lambda k:
    f"SELECT l_orderkey + {k * mx['orders']} AS l_orderkey,"
    f" l_partkey + {k * mx['part']} AS l_partkey,"
    f" l_suppkey + {k * mx['supplier']} AS l_suppkey,"
    f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
    f" l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}")
copy("events", lambda k:
    f"SELECT event_id + {k * mx['events']} AS event_id, ts,"
    f" user_id + {k * mxuser} AS user_id, event_type, value, props"
    f" FROM {src('events')}")
copy("documents", lambda k:
    (f"SELECT doc_id, text, lang, source, n_chars FROM {src('documents')}" if k == 0 else
     f"SELECT doc_id + {k * mx['documents']} AS doc_id,"
     f" regexp_replace(text, '(\\S+)', '\\1{k}', 'g') AS text, lang, source,"
     f" CAST(length(regexp_replace(text, '(\\S+)', '\\1{k}', 'g')) AS BIGINT) AS n_chars"
     f" FROM {src('documents')}"))
copy("embeddings", lambda k:
    f"SELECT vec_id + {k * mx['embeddings']} AS vec_id,"
    f" list_transform(range(0, {dim}), i -> embedding[1 + ((i + {7 * k}) % {dim})])"
    f" AS embedding, label FROM {src('embeddings')}")
print(f"done: {DST}")
