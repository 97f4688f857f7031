#!/usr/bin/env python3
"""Scaling-slope report: per-query time ratios between two bench runs.

Usage:
  python3 dev/scale_check.py <bench_small.json> <bench_big.json> \
      [factor] [out.json]

The inputs are `target/bench_full.json` files from two graft.Bench runs
at different scale factors under IDENTICAL settings (same CPUS, same
code, same reps). `factor` (default 10) is the data-size ratio; the
report classifies each query's time ratio against it:

  sublinear   ratio <  0.5 × factor   (fixed costs amortizing)
  linear      ratio <  1.5 × factor   (the target at this plan shape)
  superlinear otherwise               (root-cause before shipping)

Writes a JSON report (default SCALE_r13.json) with per-query ratios and
the classification counts. A sub-second small-scale time makes the
ratio jitter-dominated; those rows are tagged `subsecond_base` so a
2.5× on a 0.15 s query is not read as a slope.
"""
import json
import sys

small_p = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf01.json"
big_p = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_sf1.json"
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
out_p = sys.argv[4] if len(sys.argv) > 4 else "SCALE_r13.json"

small = json.load(open(small_p))
big = json.load(open(big_p))
qs = sorted(set(small["queries"]) & set(big["queries"]))

rows = {}
counts = {"sublinear": 0, "linear": 0, "superlinear": 0}
for q in qs:
    a, b = small["queries"][q], big["queries"][q]
    ratio = round(b / a, 2) if a > 0 else None
    if ratio is None:
        cls = "n/a"
    elif ratio < 0.5 * factor:
        cls = "sublinear"
    elif ratio < 1.5 * factor:
        cls = "linear"
    else:
        cls = "superlinear"
    if cls in counts:
        counts[cls] += 1
    rows[q] = {
        "small_s": a, "big_s": b, "ratio": ratio, "class": cls,
        "subsecond_base": a < 1.0,
    }

report = {
    "what": ("builder-local scaling-slope measurement: graft.Bench at two "
             "scale factors under identical settings; ratio = big/small "
             "per-query wall time (min of reps)"),
    "small": small.get("sf"), "big": big.get("sf"), "factor": factor,
    "n_queries": len(qs), "classes": counts,
    "per_query": rows,
}
json.dump(report, open(out_p, "w"), indent=1)
for q in sorted(rows, key=lambda q: -(rows[q]["ratio"] or 0)):
    r = rows[q]
    print(f"{q:26s} {r['small_s']:8.3f} -> {r['big_s']:9.3f}  "
          f"x{r['ratio']:<7} {r['class']}"
          + ("  (subsecond base)" if r["subsecond_base"] else ""))
print(f"== {counts}  -> {out_p}")
