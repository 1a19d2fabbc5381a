#!/usr/bin/env python3
"""Local dev-only replica of the driver's correctness gate: runs each
oracle SQL in DuckDB against the sf parquet tables and compares with
the Verify.scala parquet dumps (column-name-sorted, row-sorted,
value-normalized). NOT part of the library."""
import json, math, os, sys
import duckdb
import pandas as pd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_frags import norm

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

fails = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    got = norm(pd.read_parquet(d))
    if name not in oracle:
        print(f"  {name}: rows-only ({len(got)} rows)" +
              ("  !! EMPTY" if len(got) == 0 else ""))
        continue
    want = norm(con.sql(oracle[name]).df())
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1
        continue
    if got.equals(want):
        print(f"  ok {name}: {len(got)} rows")
    else:
        fails += 1
        diff = got.compare(want) if got.shape == want.shape else None
        print(f"FAIL {name}: shape {got.shape} vs {want.shape}")
        if diff is not None and len(diff):
            print(diff.head(5))
        else:
            print("  got:", got.head(3).to_dict("records"))
            print("  want:", want.head(3).to_dict("records"))
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
