#!/bin/bash
# r18 OPTIMIZATION-round bench protocol (BASELINE.md host-variance rule):
# same-session INTERLEAVED full-registry runs at sf0.1 —
# optimized run1 -> inherited tree (6d07c88, round start) scratch-clone
# full run -> optimized run2 — then per-query min-of-runs on the
# optimized tree vs the inherited leg
# (dev/r18_opt_merge.py assembles BENCH_r18_opt_local.json).
set -x
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1

sbt -batch "runMain graft.Bench" > /tmp/r18_opt_run1.txt 2>&1
cp target/bench_full.json /tmp/bench_r18_opt1.json

if [ ! -d /tmp/r18_inherited ]; then
  git clone -q /root/repo /tmp/r18_inherited
  git -C /tmp/r18_inherited checkout -q 6d07c88
fi
(cd /tmp/r18_inherited && SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" > /tmp/r18_inherited_run.txt 2>&1 && \
  cp target/bench_full.json /tmp/bench_r18_inherited.json)

sbt -batch "runMain graft.Bench" > /tmp/r18_opt_run2.txt 2>&1
cp target/bench_full.json /tmp/bench_r18_opt2.json
echo AB_DONE
