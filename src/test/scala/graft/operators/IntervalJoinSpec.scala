package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naivePairs(
      left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (lid, ls, le) <- left
      (rid, rs, re) <- right
      if ls <= re && rs <= le
    } yield (lid, rid)).toSet

  // deterministic pseudo-random intervals without java.util.Random state
  private def intervals(n: Int, seed: Long, maxLen: Long): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      val h = java.lang.Long.rotateLeft((i + 1) * 0x9e3775b9L ^ seed, i % 31)
      val start = math.abs(h) % 100000L
      val len = math.abs(h >> 7) % maxLen
      (i.toLong, start, start + len)
    }

  test("overlapJoin equals the naive theta join on random intervals, " +
    "each overlapping pair exactly once") {
    for (maxLen <- Seq(10L, 500L, 20000L)) {
      val l = intervals(80, seed = 1, maxLen)
      val r = intervals(60, seed = 2, maxLen)
      val lDf = l.toDF("lid", "ls", "le")
      val rDf = r.toDF("rid", "rs", "re")
      // bucket width deliberately SMALLER than many intervals so pairs
      // share multiple buckets and the dedup rule is actually exercised
      val got = IntervalJoin.overlapJoin(lDf, rDf, "ls", "le", "rs", "re",
          bucketWidth = 256L)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"maxLen=$maxLen: duplicate pairs emitted")
      assert(got.toSet == naivePairs(l, r), s"maxLen=$maxLen: pair set differs")
    }
  }

  test("closed-interval semantics: boundary touch and zero-length " +
    "intervals overlap; bucket-boundary starts are kept") {
    // r starts exactly where l ends, on a bucket boundary (width 10)
    val l = Seq((1L, 0L, 10L), (2L, 25L, 25L)).toDF("lid", "ls", "le")
    val r = Seq((1L, 10L, 12L), (2L, 25L, 25L), (3L, 26L, 30L))
      .toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(l, r, "ls", "le", "rs", "re", 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 2L)))
  }

  test("disjoint sides produce no pairs even when they share buckets") {
    val l = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val r = Seq((1L, 20L, 30L)).toDF("rid", "rs", "re")
    // width 1000: both intervals in bucket 0, no overlap
    assert(IntervalJoin.overlapJoin(l, r, "ls", "le", "rs", "re", 1000L)
      .count() == 0L)
  }

  test("plan is an equi join on the bucket id, not a nested loop") {
    val l = intervals(50, 3, 300).toDF("lid", "ls", "le")
    val r = intervals(50, 4, 300).toDF("rid", "rs", "re")
    val plan = IntervalJoin.overlapJoin(l, r, "ls", "le", "rs", "re", 128L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join must not plan as a nested loop:\n$plan")
  }
}
