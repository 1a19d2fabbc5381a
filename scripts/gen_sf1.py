#!/usr/bin/env python3
"""Dev-only scale-up generator: replicate the sf0.1 tables K times
(default 10 -> "sf1") with per-replica key offsets so foreign keys
stay consistent (replica i of an order points at replica i of its
customer). Tiny dims (region, nation) keep a single copy, so scaled
facts still join them. DuckDB does the copy so parquet logical types
(notably events.ts micros timestamp) survive exactly.

Usage: python3 scripts/gen_sf1.py [src_dir] [dst_dir] [K]
NOT part of the library; used for the sf1 correctness/bench sweep.
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)

con = duckdb.connect()

# key-symbol per offset column: columns sharing a symbol share a base,
# keeping cross-table references aligned
SYMBOL = {
    "customer": {"c_custkey": "C"},
    "supplier": {"s_suppkey": "S"},
    "part": {"p_partkey": "P"},
    "orders": {"o_orderkey": "O", "o_custkey": "C"},
    "lineitem": {"l_orderkey": "O", "l_partkey": "P", "l_suppkey": "S"},
    "events": {"event_id": "E", "user_id": "U"},
    "documents": {"doc_id": "D"},
    "embeddings": {"vec_id": "V"},
}
# base per symbol = next power of 10 above the key's max -> offsets
# never collide and scaled ids stay human-readable (replica digit up
# front)
BASE_SOURCE = {
    "C": ("customer", "c_custkey"), "S": ("supplier", "s_suppkey"),
    "P": ("part", "p_partkey"), "O": ("orders", "o_orderkey"),
    "E": ("events", "event_id"), "U": ("events", "user_id"),
    "D": ("documents", "doc_id"), "V": ("embeddings", "vec_id"),
}
base = {}
for sym, (t, c) in BASE_SOURCE.items():
    mx = con.sql(
        f"SELECT max({c}) FROM parquet_scan('{src}/{t}.parquet')").fetchone()[0]
    b = 1
    while b <= mx:
        b *= 10
    base[sym] = b

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    cols = [r[0] for r in con.sql(
        f"describe select * from parquet_scan('{src}/{t}.parquet')").fetchall()]
    offs = SYMBOL.get(t, {})
    if not offs:  # tiny dim: single copy
        con.sql(f"COPY (SELECT * FROM parquet_scan('{src}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
        continue
    sel = ", ".join(
        f"({c} + rep * {base[offs[c]]}) AS {c}" if c in offs else c
        for c in cols)
    con.sql(
        f"COPY (SELECT {sel} "
        f" FROM parquet_scan('{src}/{t}.parquet') "
        f" CROSS JOIN (SELECT unnest(range({K})) AS rep) "
        f" ORDER BY rep) "
        f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM parquet_scan('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows (x{K})")
