#!/usr/bin/env python3
"""Assemble tools/ab_bench_r12.sh's per-tree Profile outputs into one
JSON record: per tree x query, every raw run plus the median. Profile
lines look like `name  median=  1.234  runs=1.2,1.3`."""
import json, re, statistics, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
out = {"sf": sf, "alternating_passes": reps, "runs_per_pass": 2,
       "order": "r11,r12 interleaved per pass (same boot)", "trees": {}}
for tree, commit in (("r11", "26bfe1b"), ("r12", "HEAD")):
    runs = {}
    try:
        text = open(f"/tmp/ab12/out_{tree}.txt").read()
    except FileNotFoundError:
        continue
    for m in re.finditer(r"^(\S+)\s+median=\s*([\d.]+)\s+runs=([\d.,]+)",
                         text, re.M):
        runs.setdefault(m.group(1), []).extend(
            float(x) for x in m.group(3).split(","))
    out["trees"][tree] = {"commit": commit, "queries": {
        q: {"median": round(statistics.median(v), 3),
            "runs": [round(x, 3) for x in v]}
        for q, v in sorted(runs.items())}}
print(json.dumps(out, indent=1))
