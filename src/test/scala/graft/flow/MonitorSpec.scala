package graft.flow

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MonitorSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("scoped monitor only records work inside its monitored block") {
    val monA = Monitor.attach(spark, scopedOnly = true)
    val monB = Monitor.attach(spark, scopedOnly = true)
    try {
      monA.monitored {
        spark.range(0, 50000).toDF("v").groupBy(col("v") % 10).count().collect()
      }
      monB.monitored {
        spark.range(0, 10).toDF("v").select(sum("v")).collect()
      }
      monA.await(); monB.await()
      val aStages = monA.report().map(_.stageId).toSet
      val bStages = monB.report().map(_.stageId).toSet
      assert(aStages.nonEmpty && bStages.nonEmpty)
      assert((aStages intersect bStages).isEmpty) // no cross-talk
    } finally { monA.detach(); monB.detach() }
  }

  test("monitor captures stage metrics incl. shuffle volume (A22)") {
    val mon = Monitor.attach(spark)
    try {
      spark.range(0, 100000).toDF("v")
        .groupBy(col("v") % 100).agg(count(lit(1)))
        .collect()
      mon.await() // listener bus is async
      val stages = mon.report()
      assert(stages.nonEmpty)
      assert(stages.map(_.tasks).sum > 0)
      assert(mon.totalShuffleBytes > 0) // the groupBy shuffled
    } finally mon.detach()
  }
}
