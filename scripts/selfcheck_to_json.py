#!/usr/bin/env python3
"""Convert a self_check.py log into a CORRECTNESS-style JSON artifact
(query -> {ok, rows} plus a summary line). Dev-only."""
import json
import re
import sys

log = sys.argv[1]
out = sys.argv[2]
res = {}
for line in open(log):
    m = re.match(r"\s+ok (\S+): (\d+) rows", line)
    if m:
        res[m.group(1)] = {"ok": True, "rows": int(m.group(2))}
        continue
    m = re.match(r"\s+(\S+): rows-only \((\d+) rows\)", line)
    if m:
        res[m.group(1)] = {"ok": True, "rows": int(m.group(2)), "rows_only": True}
        continue
    m = re.match(r"FAIL (\S+): (.*)", line)
    if m:
        res[m.group(1)] = {"ok": False, "detail": m.group(2)[:200]}
n_fail = sum(1 for v in res.values() if not v["ok"])
artifact = {
    "summary": {"queries": len(res), "failures": n_fail},
    "queries": dict(sorted(res.items())),
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"{out}: {len(res)} queries, {n_fail} failures")
