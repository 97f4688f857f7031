#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 dev/check_oracle.py [sfDir] [outDir]

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL in DuckDB over views on the fixture tables, sorts columns by
name, and compares shape, dtypes, and values cell-by-cell. Strict by
design — stricter than the driver's hash compare, so passing here should
imply passing there.
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
n_pass, n_fail = 0, 0
for name in sorted(oracle):
    sql = oracle[name]
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1
        continue
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"columns spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
    else:
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if got.shape != exp.shape:
            problems.append(f"shape spark={got.shape} oracle={exp.shape}")
        else:
            for c in got.columns:
                a, b = got[c], exp[c]
                if str(a.dtype) != str(b.dtype):
                    problems.append(f"dtype[{c}] spark={a.dtype} oracle={b.dtype}")
                av, bv = a.values, b.values
                if a.dtype == object:
                    neq = np.array([str(x) != str(y) for x, y in zip(av, bv)])
                elif np.issubdtype(a.dtype, np.floating):
                    # BITWISE compare: the driver hashes raw bytes, so
                    # -0.0 vs 0.0 (equal under ==) must count as a diff.
                    # NaN payloads equal-if-both-NaN (engines agree on the
                    # canonical quiet NaN; pd.isna masks them out).
                    ab = np.ascontiguousarray(av, dtype=np.float64).view(np.uint64)
                    bb = np.ascontiguousarray(bv, dtype=np.float64).view(np.uint64)
                    neq = (ab != bb) & ~(pd.isna(av) & pd.isna(bv))
                else:
                    try:
                        neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
                    except Exception:
                        neq = np.array([x != y for x, y in zip(av, bv)])
                if neq.any():
                    i = int(np.argmax(neq))
                    problems.append(
                        f"values[{c}] {int(neq.sum())}/{len(a)} differ; "
                        f"first@{i}: spark={av[i]!r} oracle={bv[i]!r}")
                if np.issubdtype(a.dtype, np.floating):
                    # -0.0 anywhere (even bit-matching on both sides) is a
                    # latent hazard: a partition/fixture change can flip the
                    # sign bit on one engine only. Normalize with +0.0 at
                    # the query (hazard class 4, SURVEY §7.4).
                    for side, vals in (("spark", av), ("oracle", bv)):
                        nz = (np.ascontiguousarray(vals, dtype=np.float64)
                              .view(np.uint64) == 0x8000000000000000)
                        if nz.any():
                            problems.append(
                                f"negzero[{c}] {int(nz.sum())} cells are "
                                f"-0.0 on {side} — add +0.0 after ROUND")
    if problems:
        print(f"FAIL {name}: " + " | ".join(problems))
        n_fail += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1

declared = set(oracle)
dumped = {p.split("/")[-1] for p in glob.glob(f"{OUT}/*") if not p.endswith(".json")}
extra = dumped - declared
if extra:
    print(f"note: dumped without oracle (rows-only check): {sorted(extra)}")
print(f"== {n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
