#!/bin/bash
# r19 OPTIMIZATION-round bench protocol (BASELINE.md host-variance rule):
# same-session INTERLEAVED runs at sf0.1 over the TOUCHED-QUERY SET plus
# three untouched sentinels (q_scan_count / q_agg_group / q_lateral — a
# live gauge of host noise during the A/B), REPS=3 min per leg —
# optimized run1 -> inherited round-start tree (3e409eb, the sealed r18
# verdict commit) scratch-clone run -> optimized run2
# (dev/r19_opt_merge.py assembles BENCH_r19_opt_local.json).
#
# Subset rather than full-registry legs this round: this session's host
# runs 1.5-5x hot (sf10 solo legs reproduced r18's shuffle bytes exactly
# at 5x the wall), so per-query interleaved ratios are the only signal
# worth buying; the full-registry comparison is the driver's own
# PERF_r19 job.
set -x
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
QS=q_simhash_pairs,q_media_curate,q_media_curate_text,q_image_near_dup,q_audio_near_dup,q_video_near_dup,q_dedup_against,q_bm25_index,q_bm25_log,q_ann_topk_pq,q_avro_roundtrip,q_avro_decimal,q_incr_join,q_scan_count,q_agg_group,q_lateral
export SPARK_GRAFT_BENCH_ONLY=$QS
export SPARK_GRAFT_BENCH_REPS=3

sbt -batch "runMain graft.Bench" > /tmp/r19_opt_run1.txt 2>&1
cp target/bench_full.json /tmp/bench_r19_opt1.json

if [ ! -d /tmp/r19_inherited ]; then
  git clone -q /root/repo /tmp/r19_inherited
  git -C /tmp/r19_inherited checkout -q 3e409eb
fi
(cd /tmp/r19_inherited && SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_ONLY=$QS SPARK_GRAFT_BENCH_REPS=3 \
  sbt -batch "runMain graft.Bench" > /tmp/r19_inherited_run.txt 2>&1 && \
  cp target/bench_full.json /tmp/bench_r19_inherited.json)

sbt -batch "runMain graft.Bench" > /tmp/r19_opt_run2.txt 2>&1
cp target/bench_full.json /tmp/bench_r19_opt2.json
echo AB_DONE
