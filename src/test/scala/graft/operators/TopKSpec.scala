package graft.operators

import graft.flow.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("heap top-k matches the row_number window formulation exactly") {
    val o = graft.sources.Tables.orders(spark, sfDir)
    val viaAgg = TopK.perKey(o, Seq("o_orderpriority"),
      Seq("o_totalprice", "o_orderkey"), k = 5)
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey".desc)
      .collect().toSeq
    val w = Window.partitionBy("o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".desc)
    val viaWindow = o
      .select($"o_orderpriority", $"o_totalprice", $"o_orderkey",
        row_number().over(w).as("rn"))
      .filter($"rn" <= 5).drop("rn")
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey".desc)
      .collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("smallest mode and short groups (fewer than k rows) behave") {
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L)
    ).toDF("k", "v")
    val out = TopK.perKey(df, Seq("k"), Seq("v"), k = 2, desc = false)
      .as[(String, Long)].collect().toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 9L)))
  }

  test("plan aggregates partially on the map side — no window sort anywhere") {
    val o = graft.sources.Tables.orders(spark, sfDir)
    val q = TopK.perKey(o, Seq("o_orderpriority"),
      Seq("o_totalprice", "o_orderkey"), k = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_top_k"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("deterministic reservoir sample: k rows per group, stable across " +
    "runs and equal to the window formulation") {
    val o = graft.sources.Tables.orders(spark, sfDir)
    val s1 = TopK.sampleKPerKey(o, Seq("o_orderpriority"), Seq("o_orderkey"), k = 4)
      .as[(String, Long)].collect().toSet
    val s2 = TopK.sampleKPerKey(o, Seq("o_orderpriority"), Seq("o_orderkey"), k = 4)
      .as[(String, Long)].collect().toSet
    assert(s1 == s2, "sample must be reproducible")
    assert(s1.groupBy(_._1).forall(_._2.size == 4))
    // same cut as the window spelling (the oracle formulation)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(md5($"o_orderkey".cast("string")), $"o_orderkey")
    val viaWindow = o
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 4)
      .select("o_orderpriority", "o_orderkey").as[(String, Long)].collect().toSet
    assert(s1 == viaWindow)
    // and it merges: a partial sample of a partial sample is the sample
    val partial = TopK.sampleKPerKey(o, Seq("o_orderpriority"), Seq("o_orderkey"), k = 16)
    val refined = TopK.sampleKPerKey(partial, Seq("o_orderpriority"), Seq("o_orderkey"), k = 4)
      .as[(String, Long)].collect().toSet
    assert(refined == s1)
  }
}
