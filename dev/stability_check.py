#!/usr/bin/env python3
"""Whole-registry partition-stability compare.

Usage: python3 dev/stability_check.py dirA dirB

Compares two graft.Verify output dirs (e.g. produced with
SPARK_GRAFT_CPUS=1 vs =32): per query, sorted-by-all-columns frames
must match cell-for-cell. Any mismatch in an ORACLE query is a
partitioning-dependence bug of exactly the class that made
q_feature_scale driver-red in r10; mismatches in approximation-sketch
queries (HLL / approx-percentile / CMS) may be legitimate merge-order
effects and are reported separately.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd


def frames_equal_bitwise(da, db):
    """df.equals, except float64 columns compare BITWISE (NaN-masked):
    the driver hashes raw bytes, so -0.0 vs 0.0 must count as a diff.

    Caveat (round-12 ADVICE): frames arrive here AFTER sort_values,
    which orders -0.0 and 0.0 as EQUAL — two runs emitting the same
    multiset with -0.0/+0.0 swapped across tie rows can sort into
    different row orders and be flagged DIFFER even though the row sets
    are bitwise-identical as multisets. Conservative in the right
    direction (the driver's sorted-bytes hash is equally
    order-sensitive), but if a tie-heavy query ever reports DIFFER on a
    signed-zero column, check for this before diagnosing real
    instability — the fix is nz() at the query, not here."""
    if da.shape != db.shape or list(da.columns) != list(db.columns):
        return False
    for c in da.columns:
        a, b = da[c], db[c]
        if np.issubdtype(a.dtype, np.floating) and \
                np.issubdtype(b.dtype, np.floating):
            ab = np.ascontiguousarray(a.values, dtype=np.float64).view(np.uint64)
            bb = np.ascontiguousarray(b.values, dtype=np.float64).view(np.uint64)
            if (((ab != bb) & ~(pd.isna(a.values) & pd.isna(b.values))).any()):
                return False
        elif not a.equals(b):
            return False
    return True


A, B = sys.argv[1], sys.argv[2]
oracle = set(json.load(open(os.path.join(A, "oracle_sql.json"))))
# q_hll_sketch left OUT since r12: its final union folds per-group
# sketches in sorted order (scalar hll_union), making the estimate
# partition-stable — a diff there is a regression, not merge-order noise.
SKETCHY = {"q_hll_distinct", "q_approx_percentile",
           "q_freq_sketch", "q_incr_distinct"}

con = duckdb.connect()
names = sorted(d for d in os.listdir(A)
               if os.path.isdir(os.path.join(A, d))
               and os.path.isdir(os.path.join(B, d)))
n_ok = n_bad = n_sketch = 0
for q in names:
    fa = sorted(glob.glob(f"{A}/{q}/*.parquet"))
    fb = sorted(glob.glob(f"{B}/{q}/*.parquet"))
    if not fa or not fb:
        print(f"SKIP {q}: missing output ({len(fa)}/{len(fb)})")
        continue
    try:
        da = con.execute(f"SELECT * FROM read_parquet({fa!r})").df()
        db = con.execute(f"SELECT * FROM read_parquet({fb!r})").df()
        cols = sorted(da.columns)
        da, db = da[cols], db[cols]
        # list/struct columns load as object arrays pandas cannot sort —
        # stringify for ORDERING only (equality still compares the
        # stringified frames, which is exact for identical values)
        try:
            da = da.sort_values(cols, na_position="first").reset_index(drop=True)
            db = db.sort_values(cols, na_position="first").reset_index(drop=True)
        except TypeError:
            da = da.astype(str).sort_values(cols).reset_index(drop=True)
            db = db.astype(str).sort_values(cols).reset_index(drop=True)
        same = da.shape == db.shape and frames_equal_bitwise(da, db)
        detail = ""
        if not same and da.shape == db.shape:
            neq = (da.astype(str).values != db.astype(str).values)
            detail = f"; {int(neq.sum())} cells differ, first col(s): " + \
                ", ".join(c for i, c in enumerate(cols) if neq[:, i].any())
    except Exception as e:
        print(f"ERR  {q}: {e}")
        n_bad += 1
        continue
    if same:
        n_ok += 1
    elif q in SKETCHY:
        n_sketch += 1
        print(f"SKETCH-DIFF {q} (approximation merge order — expected class)")
    else:
        n_bad += 1
        gate = "ORACLE" if q in oracle else "rows-only"
        print(f"DIFF {q} [{gate}]: shapes {da.shape} vs {db.shape}{detail}")

print(f"\n== {n_ok} stable, {n_bad} DIFFER, {n_sketch} sketch-class diffs "
      f"over {len(names)} queries")
sys.exit(1 if n_bad else 0)
