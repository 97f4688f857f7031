package graft

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Scale-design invariants asserted on the PHYSICAL plans of declared
  * queries — the properties that decide whether a plan survives a 100×
  * scale-up, pinned so a refactor can't silently regress them:
  * filters reach the scan, projections prune the read schema, top-k never
  * globally sorts, small dimensions broadcast, aggregations are
  * partial-before-shuffle. */
class PlanInvariantsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sfDir)
    df.collect() // let AQE finalize
    // keep only the final adaptive plan: the "Initial Plan" echo AQE
    // appends would double-count scans/exchanges in line-count asserts
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q_filter: the predicate is pushed into the parquet scan") {
    val plan = executedPlan("q_filter")
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"), plan)
  }

  test("q_project: the scan reads only the projected columns") {
    val plan = executedPlan("q_project")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // q_project selects a 3-column slice of the 16-column lineitem
    assert(!read.contains("l_comment") && !read.contains("l_shipmode"), read)
  }

  test("q_topk and q_sim_topk: top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(executedPlan("q_topk").contains("TakeOrderedAndProject"))
    assert(executedPlan("q_sim_topk").contains("TakeOrderedAndProject"))
  }

  test("q_join_broadcast: the small dimension is broadcast, no shuffle join") {
    val plan = executedPlan("q_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q_agg_group: aggregation is partial before the shuffle (map-side combine)") {
    val plan = executedPlan("q_agg_group")
    assert(plan.contains("partial_"), plan)
  }

  test("q_exists: EXISTS decorrelates to a semi join, never a per-row subquery") {
    val plan = executedPlan("q_exists")
    assert(plan.contains("LeftSemi"), plan)
  }

  test("q_join_asof_near: both directional scans reuse ONE shuffle of the " +
    "union (two window sorts, a single exchange on the equi key)") {
    val plan = executedPlan("q_join_asof_near")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"nearest as-of must shuffle the union once, found $exchanges:\n$plan")
    assert("\\bWindow\\b".r.findAllIn(plan).length >= 2,
      s"expected two window scans over the shared exchange:\n$plan")
  }

  test("q_reservoir_sample: the sample aggregates partially map-side, " +
    "never a window sort") {
    val plan = executedPlan("q_reservoir_sample")
    assert(plan.contains("partial_graft_top_k"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q_tfidf: both aggregation levels are partial before their shuffles") {
    val plan = executedPlan("q_tfidf")
    assert(plan.contains("partial_"), plan)
  }

  test("q_tfidf: the measured switch broadcasts the (small) vocabulary side") {
    val plan = executedPlan("q_tfidf")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q_snapshot_diff: the diff is one join, no nested-loop fallback") {
    val plan = executedPlan("q_snapshot_diff")
    assert(plan.contains("FullOuter"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_quality: referential integrity broadcasts the dimension") {
    val plan = executedPlan("q_quality")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q_heavy_hitters: exact top-k runs as partial agg + " +
    "TakeOrderedAndProject, never a global sort") {
    val plan = executedPlan("q_heavy_hitters")
    assert(plan.contains("partial_"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q_profile: the one-pass profile scans lineitem once") {
    val plan = executedPlan("q_profile")
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
  }

  test("q_token_budget: doc-level cumsum partitions by (lang, uq) — " +
    "never one task per language — and candidate buckets broadcast") {
    val plan = executedPlan("q_token_budget")
    // the per-doc window must partition by (lang, uq) so no task ever
    // holds a whole language; the only per-lang window runs over the
    // bounded bucket aggregate. Candidate buckets join back by broadcast
    // (they are budget-bounded), and the only range exchange allowed is
    // the final presentation ORDER BY the oracle contract requires.
    assert(plan.contains("hashpartitioning(lang") &&
      plan.linesIterator.exists(l =>
        l.contains("hashpartitioning(lang") && l.contains("uq")), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.linesIterator.count(_.contains("rangepartitioning")) <= 1, plan)
  }

  test("q_mixture_sample: the per-lang rate table broadcasts and the " +
    "corpus itself never shuffles") {
    val plan = executedPlan("q_mixture_sample")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the only exchanges: the tiny rate aggregate's shuffle, its
    // broadcast, and the presentation ORDER BY — never a hash exchange
    // of the documents scan itself
    assert(plan.linesIterator.count(_.contains("hashpartitioning")) <= 1, plan)
  }

  test("q_seq_pack: the packing cumsum partitions by shard — never one " +
    "global single-task window") {
    val plan = executedPlan("q_seq_pack")
    assert(plan.contains("hashpartitioning(shard"), plan)
  }

  test("q_outliers: the per-group fence table broadcasts into the " +
    "detection scan") {
    val plan = executedPlan("q_outliers")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q_unigram_logprob: the vocabulary side broadcasts through the " +
    "measured switch") {
    val plan = executedPlan("q_unigram_logprob")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q_cluster_assign: assignment is a narrow fold — the only " +
    "exchanges are the centroid aggregate and the confusion-count " +
    "aggregate, never a corpus join") {
    val plan = executedPlan("q_cluster_assign")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      plan.take(3000))
  }

  test("q_temp_sample: per-group rates broadcast into a scan filter; " +
    "the corpus side never sort-merge shuffles") {
    val plan = executedPlan("q_temp_sample")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("q_rrf: every rank window is partitioned (no single-partition " +
    "window over a pool)") {
    val plan = executedPlan("q_rrf")
    val lines = plan.linesIterator.toIndexedSeq
    val bad = lines.zipWithIndex.exists { case (l, i) =>
      l.contains("Window") &&
        lines.slice(i + 1, i + 5).exists(_.contains("Exchange SinglePartition"))
    }
    assert(!bad, "single-partition window in q_rrf:\n" + plan.take(3000))
  }

  test("q_pagerank: every iteration's contribution aggregate is partial " +
    "before its shuffle") {
    val plan = executedPlan("q_pagerank")
    assert(plan.contains("partial_"), plan.take(3000))
  }

  test("q_epoch_sample: copy materialization is a narrow explode — the " +
    "only exchange is the oracle's final ORDER BY") {
    val plan = executedPlan("q_epoch_sample")
    assert(plan.contains("Generate explode"), plan.take(3000))
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"$exchanges exchanges:\n${plan.take(3000)}")
    assert(plan.contains("rangepartitioning"), plan.take(3000))
  }

  test("q_quality_clf: scoring is a narrow projection — no join, no " +
    "aggregate, only the final ORDER BY exchanges") {
    val plan = executedPlan("q_quality_clf")
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("HashAggregate"), plan.take(3000))
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"$exchanges exchanges:\n${plan.take(3000)}")
  }

  test("runtime bloom-filter pruning: a selective dim filter injects a " +
    "bloom filter into the fact scan of a shuffle join") {
    // At 100 TB the pre-shuffle row cull from a runtime bloom filter is
    // the difference between shuffling the whole fact table and shuffling
    // the ~matching slice. Thresholds are tuned down because the fixture
    // is tiny; a real cluster hits the defaults (10 MB creation side).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val dim = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter"), plan.take(4000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
