#!/bin/bash
# r18 third-decade sweep (VERDICT r17 item 2 + item 1 done-criterion):
# q_dup_clusters / q_dedup_keep_best (two-tier PPJoin verify) and
# q_media_curate (distinct-first hamming core) at sf10 vs sf30, factor 3.
# SOLO legs — one query per JVM — so the pair queries' shuffle temp can
# never accumulate across queries (the r17 sf30 disk failure mode), and
# per-query walls carry no cross-query cache warmth. COLD REPS=1 x 2
# independent runs per leg, min per query. Media memos pre-built
# (throwaway legs) so one-time synthetic-encode cost stays out of the
# slope. CPUS=32 (sealed-artifact protocol), 64g driver, SHUFFLE=128 at
# sf10 / 256 at sf30.
set -x
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=64g

# media memo prebuild (sf10 memo was built by the probe run; sf30 may
# have a stale-keyed r17 memo -> rebuild under the current key)
SPARK_GRAFT_SF_DIR=target/scale/sf30 SPARK_GRAFT_SHUFFLE=256 \
  SPARK_GRAFT_BENCH_ONLY=q_media_curate SPARK_GRAFT_BENCH_REPS=1 \
  sbt -batch "runMain graft.Bench" > /tmp/r18_prebuild_sf30.txt 2>&1

for i in 1 2; do
  for q in q_dedup_keep_best q_dup_clusters q_media_curate; do
    SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_SHUFFLE=128 \
      SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_REPS=1 \
      sbt -batch "runMain graft.Bench" > /tmp/r18_sf10_${q}_run$i.txt 2>&1
    cp target/bench_full.json /tmp/r18_sf10_${q}_$i.json
  done
done
for i in 1 2; do
  for q in q_dedup_keep_best q_dup_clusters q_media_curate; do
    SPARK_GRAFT_SF_DIR=target/scale/sf30 SPARK_GRAFT_SHUFFLE=256 \
      SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_REPS=1 \
      sbt -batch "runMain graft.Bench" > /tmp/r18_sf30_${q}_run$i.txt 2>&1
    cp target/bench_full.json /tmp/r18_sf30_${q}_$i.json
  done
done
echo SWEEP_DONE
