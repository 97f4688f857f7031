#!/bin/bash
# r19 re-emit of the sf30 sweep (VERDICT r18 item 2): the hamming core
# shipped CHANGED after SCALE_r18_sf30.json was measured (a8cd3eb
# value-keyed pairs + class-level labels + Md5SimHashText kernel), so the
# 32.2 GB zero-spill / work-linear rows were unmeasured on the shipped
# tree. Same protocol as dev/r18_scale_sweep.sh: SOLO legs, COLD
# REPS=1 x 2 runs per leg, min per query; CPUS=32, 64g driver,
# SHUFFLE=128@sf10 / 256@sf30; media memos pre-built; fixtures generated
# SINGLE-STEP from sf0.1 (factor 100 / 300).
set -x
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=64g

[ -d target/scale/sf10 ] || sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 target/scale/sf10 100" > /tmp/r19_gen_sf10.txt 2>&1
[ -d target/scale/sf30 ] || sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 target/scale/sf30 300" > /tmp/r19_gen_sf30.txt 2>&1

# media memo prebuilds (one-time synthetic-encode cost out of the slope)
SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_SHUFFLE=128 \
  SPARK_GRAFT_BENCH_ONLY=q_media_curate SPARK_GRAFT_BENCH_REPS=1 \
  sbt -batch "runMain graft.Bench" > /tmp/r19_prebuild_sf10.txt 2>&1
SPARK_GRAFT_SF_DIR=target/scale/sf30 SPARK_GRAFT_SHUFFLE=256 \
  SPARK_GRAFT_BENCH_ONLY=q_media_curate SPARK_GRAFT_BENCH_REPS=1 \
  sbt -batch "runMain graft.Bench" > /tmp/r19_prebuild_sf30.txt 2>&1

for i in 1 2; do
  for q in q_dedup_keep_best q_dup_clusters q_media_curate; do
    SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_SHUFFLE=128 \
      SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_REPS=1 \
      sbt -batch "runMain graft.Bench" > /tmp/r19_sf10_${q}_run$i.txt 2>&1
    cp target/bench_full.json /tmp/r19_sf10_${q}_$i.json
  done
done
for i in 1 2; do
  for q in q_dedup_keep_best q_dup_clusters q_media_curate; do
    SPARK_GRAFT_SF_DIR=target/scale/sf30 SPARK_GRAFT_SHUFFLE=256 \
      SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_REPS=1 \
      sbt -batch "runMain graft.Bench" > /tmp/r19_sf30_${q}_run$i.txt 2>&1
    cp target/bench_full.json /tmp/r19_sf30_${q}_$i.json
  done
done
echo SWEEP_DONE
