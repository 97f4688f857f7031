#!/usr/bin/env python3
"""Assemble SCALE_r17_sf30.json — third-decade (sf10 -> sf30, factor 3)
evidence for the 7 linear-class rows the r16 verdict named. Reads the
same-session /tmp/t3*.json bench dumps (sf10 base + sf30 legs) and
writes per-query wall + bytes ratios with attribution notes.

Usage: python3 dev/r17_sf30_artifact.py
"""
import json
import os

def load(p):
    if not os.path.exists(p):
        return {}, {}
    d = json.load(open(p))
    return d.get("queries", {}), d.get("bytes", {})

def best(paths, q):
    """(min wall, bytes-of-winner) across run files that have q."""
    wall, byt = None, None
    for p in paths:
        qs, bs = load(p)
        if q in qs and (wall is None or qs[q] < wall):
            wall, byt = qs[q], bs.get(q)
    return wall, byt

SF10 = ["/tmp/t3_sf10_1.json", "/tmp/t3_sf10_2.json",
        "/tmp/cc_sf10_driver_a1.json", "/tmp/cc_sf10_driver_a2.json",
        "/tmp/cc_sf10_driver_m1.json", "/tmp/cc_sf10_driver_1.json"]
SF30 = ["/tmp/t3b_sf30_1.json", "/tmp/t3b_sf30_2.json",
        "/tmp/t3b_sf30m_1.json", "/tmp/t3b_sf30m_2.json",
        "/tmp/t3c_q_ngram_jaccard.json", "/tmp/t3c_q_dup_clusters.json",
        "/tmp/t3d_q_containment.json", "/tmp/t3d_q_corpus_curate.json",
        "/tmp/t3d_q_dup_clusters.json", "/tmp/t3d_q_dedup_keep_best.json"]

QUERIES = ["q_containment", "q_containment_against", "q_corpus_curate",
           "q_ngram_jaccard", "q_media_curate", "q_dup_clusters",
           "q_dedup_keep_best"]

out = {
    "what": ("r17 THIRD-decade spot evidence (VERDICT r16 item 4): the 7 "
             "linear-class rows at sf10 vs sf30 (factor 3), same-session, "
             "cold REPS=1, per-query min across runs, CPUS=32, "
             "SHUFFLE=128@sf10/256@sf30, 64-96g driver. sf30 generated "
             "SINGLE-STEP from sf0.1 at factor 300 — composing ScaleGen "
             "(sf10->sf30) breaks vocabulary disjointness and measured "
             "9-10x fake superlinearity before the method was fixed "
             "(ScaleGen scaladoc now documents it)."),
    "factor": 3.0,
    "attribution_notes": {
        "q_containment": ("wall 3.76x at shuffle 3.24x - work linear; the "
            "residual is fixed per-partition overhead at SHUFFLE=256. The "
            "batched 64g run spilled 25.9 GB and read 5.7x wall; the solo "
            "96g run has ZERO spill - at 100 TB this is executor-memory "
            "sizing, not plan shape."),
        "q_containment_against": "1.27x wall for 3x data - the frozen-reference probe cost is O(probe side), strongly sublinear as designed.",
        "q_media_curate": ("wall LINEAR (2.97x) because decode+fingerprint "
            "dominate; shuffle grew 9.8x (84 GB spill at 64g) = the "
            "hamming-band bucket populations tripling, so within-bucket "
            "candidate pairs grow quadratically at FIXED banding width - "
            "the documented fixed-banding cost knob (same reasoning as "
            "autoPlanes ~ log n for LSH; auto-chunks for the multimodal "
            "bands is the r18 candidate). Off the critical path here."),
        "q_dup_clusters, q_dedup_keep_best": ("NOT MEASURED at sf30: their "
            "15 GB@sf10 pair-graph shuffle becomes ~45 GB write + read "
            "temp at sf30, exceeding this box's ~60 GB free disk (No "
            "space left on device, twice, incl. solo runs). Work "
            "linearity for the family is evidenced by the other pair "
            "queries' 3.1x shuffle ratios and their own sf1->sf10 decade "
            "rows (SCALE_r17_cc.json: 6.9x/3.5x forced-distributed, at or "
            "below the driver path) - an environment bound, not a plan "
            "defect."),
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
        row["bytes_sf10"] = b10
        row["bytes_sf30"] = b30
    out["per_query"][q] = row

json.dump(out, open("SCALE_r17_sf30.json", "w"), indent=1)
print(json.dumps({q: {k: v for k, v in r.items() if not k.startswith("bytes")}
                  for q, r in out["per_query"].items()}, indent=1))
