#!/usr/bin/env python3
"""Merge two independent bench_full.json runs by per-query MIN (the
stall-robust cold number: each run is REPS=1, so a noisy-neighbor stall
in one run is screened by the other). Also carries forward the 'bytes'
attribution map from whichever run won each query.

Usage: python3 dev/r16_merge_runs.py run1.json run2.json out.json
"""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
out = dict(a)
qs = {}
bytes_map = {}
for q in set(a["queries"]) | set(b["queries"]):
    va = a["queries"].get(q)
    vb = b["queries"].get(q)
    if va is None or (vb is not None and vb < va):
        qs[q] = vb
        if q in b.get("bytes", {}):
            bytes_map[q] = b["bytes"][q]
    else:
        qs[q] = va
        if q in a.get("bytes", {}):
            bytes_map[q] = a["bytes"][q]
out["queries"] = qs
out["bytes"] = bytes_map
out["value"] = round(sum(qs.values()), 3)
# Recompute every run-level summary that must describe the MERGED map
# (r16 advice: carrying run A's counters verbatim can contradict it —
# e.g. a query that failed only in A keeps a 'failed' flag while also
# carrying run B's timing).
out["n_queries"] = len(qs)
# failed only if failed in BOTH runs (a success in either run supplied
# a real timing above)
failed = sorted(set(a.get("failed", [])) & set(b.get("failed", [])))
if "failed" in out or failed:
    out["failed"] = failed
if "n_failed" in out or failed:
    out["n_failed"] = len(failed)
# per-run stall observations don't describe the merged mins — drop them
for k in ("stalls", "n_stalled"):
    out.pop(k, None)
out["merged_from"] = [sys.argv[1], sys.argv[2]]
json.dump(out, open(sys.argv[3], "w"))
print(f"merged {len(qs)} queries -> {sys.argv[3]}")
