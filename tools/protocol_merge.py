#!/usr/bin/env python3
"""Merge the r11 ProtocolBench JSON line and the r10-tree Profile
readings into one bench/protocol_r{N}.json record (VERDICT r10 item 6:
the protocol class needs its own committed ledger, r10 AND r11)."""
import json, re

r11 = json.loads(open("target/protocol_bench.json").read().strip())
r10 = {}
try:
    for m in re.finditer(r"^(\S+)\s+median=\s*([\d.]+)", open("/tmp/ab/protocol_r10.out").read(), re.M):
        r10[m.group(1)] = float(m.group(2))
except FileNotFoundError:
    pass
print(json.dumps({
    "metric": "protocol_ledger",
    "sf": r11.get("sf"),
    "r10": {"commit": "43c97e3", "note": "r10 tree via Profile (median of 3, same noop sink)",
            "queries": r10, "total": round(sum(r10.values()), 3)},
    "r11": {"commit": "HEAD", "note": "graft.ProtocolBench (median of 3)",
            "queries": r11.get("queries", {}),
            "total": r11.get("value"), "worst": r11.get("worst"),
            "worst_query": r11.get("worst_query")},
}, indent=1))
