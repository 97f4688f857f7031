package graft.functions

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ε-bound for the approx_percentile sketch (mirror of the
  * q_hll_distinct pattern: the rows-only query's semantics are pinned
  * here). With accuracy=1000 the rank error is ≤ 1/1000, so the
  * approximate p50 must land between the exact 0.45 and 0.55
  * percentiles — a deliberately generous envelope that survives fixture
  * regeneration. */
class ApproxPercentileSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("approx_percentile lands within the exact-percentile envelope per group") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val rows = li.groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"),
        expr("percentile(l_extendedprice, 0.45)").as("lo"),
        expr("percentile(l_extendedprice, 0.55)").as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(a >= lo && a <= hi,
        s"group ${r.get(0)}: approx p50 $a outside exact [$lo, $hi]")
    }
  }

  test("multi-quantile form returns ordered deciles") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val d = li.agg(expr("approx_percentile(l_extendedprice, array(0.1, 0.5, 0.9), 1000)"))
      .head().getSeq[Double](0)
    assert(d.length == 3 && d(0) <= d(1) && d(1) <= d(2))
  }
}
