#!/bin/bash
# r18 end-of-round bench protocol (BASELINE.md host-variance rule):
# same-session INTERLEAVED full-registry runs at sf0.1 —
# r18 run1 -> r17 sealed tree (b52d1a3) scratch-clone full run -> r18
# run2 — then per-query min-of-runs on r18 vs the r17 leg
# (dev/r18_merge_final.py assembles BENCH_r18_final_local.json).
set -x
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1

sbt -batch "runMain graft.Bench" > /tmp/r18_final_run1.txt 2>&1
cp target/bench_full.json /tmp/bench_r18_full.json

if [ ! -d /tmp/r17_sealed ]; then
  git clone -q /root/repo /tmp/r17_sealed
  git -C /tmp/r17_sealed checkout -q b52d1a3
fi
(cd /tmp/r17_sealed && SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" > /tmp/r17_sealed_run.txt 2>&1 && \
  cp target/bench_full.json /tmp/bench_r17_sealed.json)

sbt -batch "runMain graft.Bench" > /tmp/r18_final_run2.txt 2>&1
cp target/bench_full.json /tmp/bench_r18_full2.json
echo AB_DONE
