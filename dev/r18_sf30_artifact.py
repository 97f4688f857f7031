#!/usr/bin/env python3
"""Assemble SCALE_r18_sf30.json — the r17 verdict's items 1+2 done
criteria: third-decade (sf10 -> sf30, factor 3) rows for the two
pair-cluster queries the r17 sweep could not run (q_dup_clusters /
q_dedup_keep_best, now on the TWO-TIER PPJoin verify) and the
q_media_curate re-measure under the DISTINCT-FIRST hamming core.
Reads the same-session /tmp/r18_*.json solo-leg bench dumps.

Usage: python3 dev/r18_sf30_artifact.py   (attribution notes are
edited in place here after reading the numbers)
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
SF10 = [f"/tmp/r18_sf10_{q}_{i}.json" for q in QUERIES for i in (1, 2)]
SF30 = [f"/tmp/r18_sf30_{q}_{i}.json" for q in QUERIES for i in (1, 2)]

out = {
    "what": ("r18 third-decade evidence (VERDICT r17 items 1+2 done "
             "criteria): q_dup_clusters / q_dedup_keep_best at sf10 vs "
             "sf30 under the two-tier PPJoin verify (r17 could not run "
             "them at sf30 - the one-tier string verify needed ~45 GB "
             "shuffle temp vs ~60 GB free disk), and q_media_curate "
             "re-measured under the distinct-first hamming core (r17 "
             "measured 9.83x shuffle at 3x data at the old member-level "
             "banding). SOLO legs - one query per JVM, so pair-graph "
             "shuffle temp never accumulates across queries and walls "
             "carry no cross-query cache warmth (method change vs the "
             "r17 combined legs, noted for comparability). COLD REPS=1 "
             "x2 runs per leg, min per query; CPUS=32, 64g driver, "
             "SHUFFLE=128@sf10/256@sf30; media memos pre-built. sf30 "
             "fixture generated SINGLE-STEP from sf0.1 at factor 300 "
             "(the r17 ScaleGen composition lesson)."),
    "factor": 3.0,
    "attribution_notes": {
        "q_dedup_keep_best, q_dup_clusters": ("NOW MEASURED (r17 could "
            "not run them at sf30 at all). The two-tier verify cut the "
            "sf10 pair pipeline from 15.0 GB shuffle / 63-66 s (r17 "
            "one-tier, SCALE_r17_cc) to 9.87 GB / 42-43 s solo; at sf30 "
            "the same plan runs 32.2 GB shuffle with ZERO spill. Ratios: "
            "wall 2.76x / 3.70x at 3x data, shuffle 3.26x both - "
            "work-linear: the PPJoin candidate volume itself grows "
            "~3.2-3.3x by the prefix-df algebra (identical to r17's "
            "q_containment 3.24x). q_dup_clusters' extra wall vs "
            "keep_best is the CC step over the 3x pair graph, measured "
            "linear for both the driver and contraction paths in "
            "SCALE_r17_cc."),
        "q_media_curate": ("wall SUBLINEAR (1.82x; r17 measured 2.97x) - "
            "decode+fingerprint dominate and parallelize per item. "
            "Shuffle ratio 16.7x BUT the absolute term is 0.33 -> 5.5 GB "
            "with ZERO spill (r17 at the member-level banding: 9.83x on "
            "a far larger base with 84 GB of spill at 64g). The media "
            "stages are no longer superlinear - the distinct-first core "
            "bands over the dHash/afp SUPPORT, which saturates (BandAudit) "
            "- the residual term is the TEXT simhash stage, whose support "
            "~= corpus because real documents are distinct: multi-index "
            "candidates grow ~ B*(n/B)^2 at the FIXED radius-1-sound "
            "keyspace B = 4*2^16 (the density bound of multi-index "
            "hashing - chunks cannot widen at maxHamming=7 without "
            "breaking radius-1 soundness, and two-level sub-chunk keys "
            "were measured and rejected in r18's BandAudit work). At "
            "sf30's 1.5M docs the term is 5.5 GB, perfectly "
            "bucket-partitioned, zero-spill; it crosses the decode cost "
            "only around ~10^7 docs. The 100 TB mitigation is the "
            "corpus_curate ORDERING already shipped: exact dedup + text "
            "near-dup run BEFORE the media composite, capping the "
            "simhash support the way the media supports self-cap."),
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
        row["spill_sf30"] = b30.get("spill")
        row["bytes_sf10"] = b10
        row["bytes_sf30"] = b30
    out["per_query"][q] = row

json.dump(out, open("SCALE_r18_sf30.json", "w"), indent=1)
print(json.dumps({q: {k: v for k, v in r.items() if not k.startswith("bytes")}
                  for q, r in out["per_query"].items()}, indent=1))
