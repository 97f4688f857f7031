package graft.operators

import java.nio.file.Files

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed layout: a join between two same-bucketing tables plans with
  * ZERO exchanges and no per-query sort (layout paid once), and its
  * result equals the plain shuffle join bit for bit. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("co-located join: no exchange on either side, result equals the " +
    "shuffled join") {
    val dir = tmp("graft_bucket")
    val sf = "/root/testdata/sf0.001"
    val orders = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "graft_b_orders", s"$dir/o", 8,
      Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "graft_b_lineitem", s"$dir/l", 8,
      Seq("o_orderkey"))

    // force the non-broadcast path so the assertion tests BUCKETING, not
    // a broadcast accidentally hiding the shuffle
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark,
        "graft_b_orders", "graft_b_lineitem", Seq("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val joinSection = plan.split("HashAggregate")(0)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle its inputs:\n$plan")

      val plain = orders.join(lineitem, "o_orderkey")
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      assert(joined.orderBy("o_custkey").collect().toSeq ==
        plain.orderBy("o_custkey").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    }
  }

  test("mismatched bucket counts do NOT co-locate — the contract is " +
    "same-bucketing, and the join still answers correctly via shuffle") {
    val dir = tmp("graft_bucket_mism")
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "va")
    val b = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "graft_b_a8", s"$dir/a", 8, Seq("k"))
    Bucketing.writeBucketed(b, "graft_b_b4", s"$dir/b", 4, Seq("k"))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.colocatedJoin(spark, "graft_b_a8", "graft_b_b4", Seq("k"))
      assert(j.count() == 2) // correct, just not exchange-free
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_b_a8")
      spark.sql("DROP TABLE IF EXISTS graft_b_b4")
    }
  }
}
