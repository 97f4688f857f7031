#!/bin/bash
# r16 second-decade sweep (VERDICT r15 items 1+3): top-of-floor queries,
# sf1 vs sf10, COLD (REPS=1) x 2 independent runs per scale, media memos
# pre-built so one-time synthetic-encode cost stays out of the slope.
# Method change vs r15 documented in SCALE_r16.json: REPS=1 because the
# two-tier containment verify persists its survivor set, so a warm rep 2
# would measure the cached tier-2 path, not the operator.
set -x
QS="q_bm25_log,q_media_curate,q_ann_topk_pq,q_apply_changes,q_avro_roundtrip,q_ngram_jaccard,q_join_bucketed,q_bm25_index,q_incr_join,q_compact,q_avro_decimal,q_dedup_against,q_rrf,q_incr_distinct,q_bigram_logprob,q_scd2,q_change_feed,q_ttl_expire,q_incr_agg,q_clone_diverge,q_dedup_keep_best,q_ann_topk_pca,q_wap_publish,q_ann_topk_q8,q_corpus_curate,q_zorder,q_dup_clusters,q_containment,q_containment_against"
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=64g

# pre-build media memos (throwaway runs; fingerprint format changed r16)
SPARK_GRAFT_SF_DIR=target/scale/sf1 SPARK_GRAFT_BENCH_ONLY=q_media_curate SPARK_GRAFT_BENCH_REPS=1 \
  sbt -batch "runMain graft.Bench" > /tmp/prebuild_sf1.txt 2>&1
SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_SHUFFLE=128 SPARK_GRAFT_BENCH_ONLY=q_media_curate SPARK_GRAFT_BENCH_REPS=1 \
  sbt -batch "runMain graft.Bench" > /tmp/prebuild_sf10.txt 2>&1

for i in 1 2; do
  SPARK_GRAFT_SF_DIR=target/scale/sf1 SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_BENCH_REPS=1 \
    sbt -batch "runMain graft.Bench" > /tmp/sweep_sf1_run$i.txt 2>&1
  cp target/bench_full.json /tmp/sweep_sf1_$i.json
done
for i in 1 2; do
  SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_SHUFFLE=128 SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_BENCH_REPS=1 \
    sbt -batch "runMain graft.Bench" > /tmp/sweep_sf10_run$i.txt 2>&1
  cp target/bench_full.json /tmp/sweep_sf10_$i.json
done
echo SWEEP_DONE
