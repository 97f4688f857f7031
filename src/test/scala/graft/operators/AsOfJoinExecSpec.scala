package graft.operators

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom physical as-of join (AsOfJoinNode/Strategy/Exec) must agree
  * exactly with the union+window formulation that the oracle already
  * validates, across partitionings. */
class AsOfJoinExecSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def clicksAndBuys = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
    (clicks, buys)
  }

  test("custom exec matches the window formulation on the events fixture") {
    val (clicks, buys) = clicksAndBuys
    val viaWindow = AsOfJoin.asof(clicks, buys, Seq("user_id"), "ts", "ts",
      Seq("purchase_value"))
      .select("event_id", "purchase_value").orderBy("event_id").collect().toSeq
    val viaExec = AsOfJoin.asofMerge(clicks, buys, Seq("user_id"), "ts", "ts",
      Seq("purchase_value"))
      .select("event_id", "purchase_value").orderBy("event_id").collect().toSeq
    assert(viaExec.size == viaWindow.size && viaExec == viaWindow)
  }

  test("custom exec is robust to adversarial input partitioning") {
    val (clicks, buys) = clicksAndBuys
    val expected = AsOfJoin.asof(clicks, buys, Seq("user_id"), "ts", "ts",
      Seq("purchase_value"))
      .select("event_id", "purchase_value").orderBy("event_id").collect().toSeq
    val out = AsOfJoin.asofMerge(
      clicks.repartition(7), buys.repartition(3), Seq("user_id"), "ts", "ts",
      Seq("purchase_value"))
      .select("event_id", "purchase_value").orderBy("event_id").collect().toSeq
    assert(out == expected)
  }

  test("simultaneous right row is visible; null keys and ts never match") {
    val left = Seq(
      (1L, "a", 100L), (2L, "a", 50L), (3L, null.asInstanceOf[String], 100L)
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", 100L, 9.0),                           // exactly simultaneous with id=1
      ("a", 60L, 5.0),
      (null.asInstanceOf[String], 10L, 1.0)       // null key: matches nothing
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asofMerge(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(9.0)) // ts == ts counts (DuckDB ASOF >= semantics)
    assert(out(2L).isEmpty)       // nothing at or before t=50
    assert(out(3L).isEmpty)       // null key joins nothing
  }

  test("mismatched timestamp or key types fail at analysis, not mid-merge") {
    val left = Seq((1L, "a", 100L)).toDF("id", "k", "t")
    val rightBadTs = Seq(("a", "not-a-long", 9.0)).toDF("k", "t", "v")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asofMerge(left, rightBadTs, Seq("k"), "t", "t", Seq("v"))
    }
    assert(e1.getMessage.contains("timestamp type mismatch"))
    val rightBadKey = Seq((5, 100L, 9.0)).toDF("k", "t", "v")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asofMerge(left, rightBadKey, Seq("k"), "t", "t", Seq("v"))
    }
    assert(e2.getMessage.contains("key type mismatch"))
  }

  test("the plan contains the custom operator and no Window/Union") {
    val (clicks, buys) = clicksAndBuys
    val q = AsOfJoin.asofMerge(clicks, buys, Seq("user_id"), "ts", "ts",
      Seq("purchase_value"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Union"), plan)
  }
}
