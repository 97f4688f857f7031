#!/usr/bin/env python3
"""Assemble SCALE_r19.json — the r18 verdict's item 2 done criterion:
re-emit the third-decade (sf10 -> sf30, factor 3) rows on the SHIPPED
tree, because the hamming core changed after SCALE_r18_sf30.json was
measured (a8cd3eb value-keyed pairs + class-level labels +
Md5SimHashText kernel, e0926d8 avro converters). Reads the same-session
/tmp/r19_*.json solo-leg bench dumps produced by dev/r19_scale_sweep.sh.

Usage: python3 dev/r19_sf30_artifact.py   (attribution notes are edited
in place here after reading the numbers)
"""
import json
import os

def load(p):
    if not os.path.exists(p):
        return {}, {}
    d = json.load(open(p))
    return d.get("queries", {}), d.get("bytes", {})

def best(paths, q):
    wall, byt = None, None
    for p in paths:
        qs, bs = load(p)
        if q in qs and (wall is None or qs[q] < wall):
            wall, byt = qs[q], bs.get(q)
    return wall, byt

QUERIES = ["q_dedup_keep_best", "q_dup_clusters", "q_media_curate"]
SF10 = [f"/tmp/r19_sf10_{q}_{i}.json" for q in QUERIES for i in (1, 2)]
SF30 = [f"/tmp/r19_sf30_{q}_{i}.json" for q in QUERIES for i in (1, 2)]

out = {
    "what": ("r19 re-emit of the third-decade sweep on the shipped tree "
             "(VERDICT r18 item 2): SCALE_r18_sf30.json was measured by "
             "the interrupted r18 build session BEFORE the r18-opt/r19 "
             "rounds rewrote hammingNearDupPairs (value-keyed pairs), "
             "hammingNearDupClusters (class-level labels + fingerprint "
             "persist) and the replayable SimHash (Md5SimHashText native "
             "kernel), so its zero-spill / work-linear rows were "
             "unmeasured on the code that ships. Same protocol as r18: "
             "SOLO legs - one query per JVM so pair-graph shuffle temp "
             "never accumulates and walls carry no cross-query cache "
             "warmth; COLD REPS=1 x2 independent runs per leg, min per "
             "query; CPUS=32, 64g driver, SHUFFLE=128@sf10/256@sf30; "
             "media memos pre-built; fixtures generated SINGLE-STEP from "
             "sf0.1 (factor 100 / 300)."),
    "factor": 3.0,
    "method_notes": (
        "sf10 rows are min of 2 independent cold runs; sf30 rows are "
        "min of ONE cold run (run2 cut deliberately for session wall "
        "budget — conservative direction: a stalled sf30 leg can only "
        "OVERSTATE the ratio). This session's host ran heavily "
        "contended: the sf10 legs reproduced SCALE_r18_sf30's shuffle "
        "bytes EXACTLY (9.88 vs 9.87 GB) at ~5x the wall — compare "
        "shuffle/spill columns and the within-session wall ratios, "
        "never walls across sessions."),
    "attribution_notes": {
        "q_dedup_keep_best, q_dup_clusters": (
            "Work-linear on the shipped tree: shuffle 9.88 -> 32.2 GB "
            "= 3.26x at 3x data — bit-for-bit the r18 ratio (the "
            "PPJoin candidate algebra is unchanged; r18-opt only moved "
            "WHICH job materializes the cache) — with ZERO spill both "
            "decades. Wall ratios 1.70x / 2.57x at 3x data (r18: "
            "2.76x / 3.70x) — sublinear, the extra dup_clusters wall "
            "is the CC step over the 3x pair graph as in SCALE_r17_cc."),
        "q_media_curate": (
            "Wall SUBLINEAR at 1.77x (r18: 1.82x) — decode+fingerprint "
            "dominate and parallelize per item; the r19 class-level "
            "label path + Md5SimHashText kernel did not disturb the "
            "slope. Shuffle ratio reads 27.7x but BOTH absolute terms "
            "are smaller than r18's (sf10 0.19 vs 0.33 GB — the r19 "
            "single-join labels removed a support-level shuffle; sf30 "
            "5.24 vs 5.5 GB), zero spill at 64g both decades. The sf30 "
            "term is the text simhash stage's multi-index candidates "
            "(support ~= corpus for real documents, ~B*(n/B)^2 at the "
            "fixed radius-1-sound keyspace — the r18 density-bound "
            "analysis, unchanged); it stays bucket-partitioned and "
            "crosses decode cost only around ~10^7 docs, with the "
            "corpus_curate ordering (exact+text dedup BEFORE the media "
            "composite) as the shipped 100 TB mitigation."),
    },
    "per_query": {},
}
for q in QUERIES:
    w10, b10 = best(SF10, q)
    w30, b30 = best(SF30, q)
    row = {"sf10_s": w10, "sf30_s": w30}
    if w10 and w30:
        row["wall_ratio"] = round(w30 / w10, 2)
    if b10 and b30:
        row["shuffle_ratio"] = round(b30["shr"] / max(1, b10["shr"]), 2)
        row["spill_sf10"] = b10.get("spill")
        row["spill_sf30"] = b30.get("spill")
        row["bytes_sf10"] = b10
        row["bytes_sf30"] = b30
    out["per_query"][q] = row

json.dump(out, open("SCALE_r19.json", "w"), indent=1)
print(json.dumps({q: {k: v for k, v in r.items() if not k.startswith("bytes")}
                  for q, r in out["per_query"].items()}, indent=1))
