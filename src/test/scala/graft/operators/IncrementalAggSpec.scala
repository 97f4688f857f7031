package graft.operators

import java.nio.file.Files

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalAggSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshStore(): String =
    Files.createTempDirectory("graft_incragg").toString + "/agg"

  test("incremental maintenance equals direct aggregation over all batches") {
    val path = freshStore()
    val batches = Seq(
      Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)),
      Seq(("a", 5.0), ("c", -2.0)),
      Seq(("b", 0.5), ("c", 7.0), ("c", 7.0)))
    batches.foreach { b =>
      IncrementalAgg.update(spark, path, b.toDF("k", "v"), Seq("k"), "v")
    }
    val got = IncrementalAgg.withAvg(spark.read.parquet(path))
      .select("k", "n", "sum", "min", "max", "avg")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1)

    val want = batches.flatten.toDF("k", "v").groupBy("k").agg(
      count("v").as("n"), sum("v").as("sum"),
      min("v").as("min"), max("v").as("max"), avg("v").as("avg"))
      .select("k", "n", "sum", "min", "max", "avg")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1)

    assert(got.toSeq == want.toSeq)
  }

  test("keys only in the store or only in the batch pass through unchanged") {
    val path = freshStore()
    IncrementalAgg.update(spark, path, Seq(("old", 2.0)).toDF("k", "v"), Seq("k"), "v")
    val out = IncrementalAgg.update(spark, path,
      Seq(("new", 9.0)).toDF("k", "v"), Seq("k"), "v")
      .select("k", "n", "sum").as[(String, Long, Double)].collect().toSet
    assert(out == Set(("old", 1L, 2.0), ("new", 1L, 9.0)))
  }

  test("composite keys merge null-safely") {
    val path = freshStore()
    IncrementalAgg.update(spark, path,
      Seq((Option("x"), Option.empty[String], 1.0)).toDF("k1", "k2", "v"),
      Seq("k1", "k2"), "v")
    val out = IncrementalAgg.update(spark, path,
      Seq((Option("x"), Option.empty[String], 4.0)).toDF("k1", "k2", "v"),
      Seq("k1", "k2"), "v")
    // the NULL-keyed group merges (null-safe join), not duplicates
    assert(out.count() == 1)
    assert(out.select("n").as[Long].head() == 2L)
  }

  test("distinct sketch: incremental folds estimate like a one-shot " +
    "sketch, track exact cardinality closely, and shape mismatches " +
    "fail loudly") {
    val path = freshStore()
    // 3 batches, overlapping user ids per key: exact distinct is
    // |union|, NOT the sum of per-batch counts
    val batches = Seq(
      (0 until 400).map(i => ("a", i.toDouble, s"u${i % 200}")),
      (0 until 400).map(i => ("a", i.toDouble, s"u${100 + i % 200}")),
      (0 until 300).map(i => ("b", i.toDouble, s"v$i")))
    batches.foreach { b =>
      IncrementalAgg.update(spark, path, b.toDF("k", "v", "user"),
        Seq("k"), "v", distinctCol = Some("user"))
    }
    val got = IncrementalAgg.withDistinct(IncrementalAgg.readStore(spark, path))
      .select("k", "approx_distinct").as[(String, Long)].collect().toMap
    val exact = batches.flatten.toDF("k", "v", "user")
      .groupBy("k").agg(countDistinct("user").as("d"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, d) =>
      val e = got(k)
      assert(math.abs(e - d).toDouble / d <= 0.02, s"$k: est $e vs exact $d")
    }
    // fold associativity: incremental union == one-shot sketch estimate
    val oneShot = batches.flatten.toDF("k", "v", "user")
      .groupBy("k").agg(hll_sketch_estimate(hll_sketch_agg(col("user"))).as("d"))
      .as[(String, Long)].collect().toMap
    assert(got == oneShot, s"incremental $got vs one-shot $oneShot")
    // a store built WITH the sketch refuses an update without it (and
    // vice versa) instead of silently changing shape
    val e1 = intercept[IllegalArgumentException] {
      IncrementalAgg.update(spark, path,
        Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), "v")
    }
    assert(e1.getMessage.contains("rebuild the store"))
    val plain = freshStore()
    IncrementalAgg.update(spark, plain, Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), "v")
    val e2 = intercept[IllegalArgumentException] {
      IncrementalAgg.update(spark, plain,
        Seq(("a", 1.0, "u")).toDF("k", "v", "user"), Seq("k"), "v",
        distinctCol = Some("user"))
    }
    assert(e2.getMessage.contains("rebuild the store"))
  }
}
