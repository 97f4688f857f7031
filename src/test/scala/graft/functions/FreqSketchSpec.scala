package graft.functions

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_freq_sketch's count-min-sketch guarantee (rows-only query):
  * a CMS never undercounts, overcounts by at most ε·N (with the sketch's
  * confidence), and sketches built per partition and MERGED answer like
  * one sketch over the whole stream — the mergeability that makes it the
  * 100 TB frequency path (fixed-size arrays cross the shuffle, not
  * terms). */
class FreqSketchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def terms = graft.sources.Tables
    .documents(spark, "/root/testdata/sf0.001")
    .select(explode(split(col("text"), " ")).as("term"))

  test("estimates bound the exact counts: exact <= est <= exact + eps*N") {
    val n = terms.count()
    val skBytes = terms
      .agg(expr("count_min_sketch(term, 0.001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes))

    val exact = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    val slack = (0.001 * n).ceil.toLong
    exact.foreach { case (t, ex) =>
      val est = cms.estimateCount(t)
      assert(est >= ex, s"CMS undercounted '$t': est=$est exact=$ex")
      assert(est <= ex + slack,
        s"CMS overcounted '$t' beyond eps*N: est=$est exact=$ex slack=$slack")
    }
  }

  test("per-partition sketches merged == one sketch over everything") {
    val whole = terms
      .agg(expr("count_min_sketch(term, 0.001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    // same aggregate over a repartitioned stream: partial sketches built
    // on different partitions must merge to the identical table (CMS add
    // is commutative + associative counter addition)
    val shuffled = terms.repartition(7)
      .agg(expr("count_min_sketch(term, 0.001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val a = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(whole))
    val b = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(shuffled))
    val probes = terms.distinct().collect().map(_.getString(0))
    probes.foreach { t =>
      assert(a.estimateCount(t) == b.estimateCount(t),
        s"partitioning changed the estimate for '$t'")
    }
  }
}
