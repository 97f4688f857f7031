#!/usr/bin/env python3
"""Mechanical registry report: query -> file:line -> gate -> last status.

Regenerates the coverage table SURVEY/VERDICT audits by hand: scans the
query sources for GraftQuery registrations, pairs each with its gate
(oracle SQL vs spec-only) and the latest driver correctness result.

Usage: python3 dev/registry_report.py [--md]
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERY_GLOB = os.path.join(ROOT, "src/main/scala/graft/queries/*.scala")

# ---- query name -> file:line from the sources ------------------------
locations = {}
for path in sorted(glob.glob(QUERY_GLOB)):
    rel = os.path.relpath(path, ROOT)
    lines = open(path).read().splitlines()
    for i, line in enumerate(lines):
        if "GraftQuery(" not in line:
            continue
        # the name literal is on this line or the next
        for j in (i, i + 1):
            if j < len(lines):
                m = re.search(r'"(q_[a-z0-9_]+)"', lines[j])
                if m:
                    locations[m.group(1)] = f"{rel}:{j + 1}"
                    break

# ---- latest correctness run ------------------------------------------
corr_files = sorted(
    glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")),
    key=lambda p: int(
        re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(p)).group(1)))
corr, corr_name = {}, "none"
if corr_files:
    corr_name = os.path.basename(corr_files[-1])
    corr = json.load(open(corr_files[-1]))

# ---- oracle set: prefer a fresh verify dump, else the correctness file
oracle = set()
osql = os.path.join(ROOT, "target/verify_out/oracle_sql.json")
if os.path.exists(osql):
    oracle = set(json.load(open(osql)))
elif corr:
    oracle = {q for q, r in corr.items() if r.get("err") != "no_oracle"}

def status(q):
    r = corr.get(q)
    if r is None:
        return "NEW (not in %s)" % corr_name
    if r.get("err") == "no_oracle":
        return "spec-gated (rows=%s)" % r.get("spark_rows")
    if r.get("hash_match"):
        return "pass"
    return "FAIL %s" % json.dumps(
        {k: r[k] for k in ("rows_match", "schema_match", "hash_match")})

rows = []
for q in sorted(set(locations) | set(corr)):
    gate = "oracle" if q in oracle else "spec"
    rows.append((q, locations.get(q, "?? (not found in sources)"),
                 gate, status(q)))

md = "--md" in sys.argv
if md:
    print("| query | location | gate | last status (%s) |" % corr_name)
    print("|---|---|---|---|")
    for q, loc, gate, st in rows:
        print(f"| `{q}` | `{loc}` | {gate} | {st} |")
else:
    w = max(len(r[0]) for r in rows)
    wl = max(len(r[1]) for r in rows)
    for q, loc, gate, st in rows:
        print(f"{q:<{w}}  {loc:<{wl}}  {gate:<6}  {st}")

n_oracle = sum(1 for r in rows if r[2] == "oracle")
n_pass = sum(1 for r in rows if r[3] == "pass")
n_fail = sum(1 for r in rows if r[3].startswith("FAIL"))
n_new = sum(1 for r in rows if r[3].startswith("NEW"))
print(f"\n== {len(rows)} queries | {n_oracle} oracle-gated | "
      f"{n_pass} pass | {n_fail} fail | {n_new} new since {corr_name}",
      file=sys.stderr)
