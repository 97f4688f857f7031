package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("broadcastIfSmall broadcasts a measured-small side and falls back " +
    "to a shuffle join above the threshold") {
    val big = (1 to 2000).map(i => (i.toLong, s"x$i")).toDF("k", "a")
    val side = (1 to 100).map(i => (i.toLong, i * 2)).toDF("k", "b")
      .groupBy("k").sum("b") // aggregate: static size estimate is useless

    // pin the automatic thresholds off so the assertions exercise the
    // MEASURED switch, not Catalyst's/AQE's own size-based conversion
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try {
      val small = big.join(Joins.broadcastIfSmall(side, maxRows = 1000), "k")
      small.collect()
      assert(small.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))

      val large = big.join(Joins.broadcastIfSmall(side, maxRows = 10), "k")
      large.collect()
      assert(!large.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "side above the measured threshold must not be hint-broadcast")
      // both paths compute the same join
      assert(small.count() == 100 && large.count() == 100)

      // BYTE cap: a side that passes the row gate but whose sampled
      // bytes exceed maxBytes must shuffle — row count alone
      // under-constrains memory for wide rows
      val wide = (1 to 50).map(i => (i.toLong, "y" * 100000)).toDF("k", "w")
        .groupBy("k").agg(org.apache.spark.sql.functions.first("w").as("w"))
      val byteCapped = big.join(
        Joins.broadcastIfSmall(wide, maxRows = 1000, maxBytes = 1024L), "k")
      byteCapped.collect()
      assert(!byteCapped.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "side above the byte cap must not be hint-broadcast")
      assert(byteCapped.count() == 50)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
