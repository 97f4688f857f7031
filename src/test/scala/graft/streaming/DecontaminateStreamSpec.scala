package graft.streaming

import graft.flow.SparkTestSession
import graft.operators.Decontaminate
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gate for streaming benchmark decontamination: an incremental feed
  * gated against a FROZEN benchmark must pass, across micro-batches,
  * EXACTLY what the oracle-proven batch operator passes on the union —
  * and the only cross-batch state is the benchmark hash cache, released
  * to session baseline afterwards. */
class DecontaminateStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("cross-batch survivors equal batch clean() on the union; frozen " +
    "benchmark state releases to baseline") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the q_decontaminate corpus split: benchmark = doc_id % 97 == 0
    // (8-gram overlap planted by the fixture's repeated templates)
    val benchmark = docs.filter(col("doc_id") % 97 === 0)
    val stream = docs.filter(col("doc_id") % 97 =!= 0)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

    val want = Decontaminate.clean(
        docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
        benchmark, "text", n = 8)
      .select("doc_id").as[Long].collect().toSet

    def cachedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val baselineIds = cachedIds

    val batches = Seq(
      stream.filter(_._1 % 3 == 0),
      stream.filter(_._1 % 3 == 1),
      stream.filter(_._1 % 3 == 2))
    assert(batches.forall(_.nonEmpty))

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val survived = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cachedAfterBatch = List.empty[Int]
    val (q, release) = StreamOps.decontaminateStream(
      mem.toDF().toDF("doc_id", "text"), benchmark,
      tmp("graft_dec_ck"), "doc_id", "text", "text", n = 8) { (clean, _) =>
      survived ++= clean.select("doc_id").as[Long].collect()
      cachedAfterBatch ::= cachedIds.size
    }
    try {
      for (b <- batches) { mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    assert(survived.size == survived.distinct.size)
    assert(survived.toSet == want,
      s"stream-vs-batch drift: extra=${survived.toSet -- want} " +
        s"missing=${want -- survived.toSet}")
    assert(want.nonEmpty && survived.size < stream.size,
      "fixture must exercise both pass and drop paths")

    assert(cachedAfterBatch.distinct.size == 1,
      s"per-batch cache growth: $cachedAfterBatch")
    release()
    assert(cachedIds == baselineIds,
      s"release() must return to baseline (leftover=${cachedIds -- baselineIds})")
  }

  test("cleanAgainstFrozen is per-doc pure: any batch split passes the " +
    "same ids") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val benchmark = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val frozen = Decontaminate.freezeBenchmark(benchmark, "text", n = 8)
    try {
      val whole = Decontaminate.cleanAgainstFrozen(corpus, "doc_id", "text", frozen)
        .select("doc_id").as[Long].collect().toSet
      val parts = Seq(
        corpus.filter((col("doc_id") / 2).cast("long") % 2 === 0),
        corpus.filter((col("doc_id") / 2).cast("long") % 2 === 1))
      val got = parts.flatMap(p =>
        Decontaminate.cleanAgainstFrozen(p, "doc_id", "text", frozen)
          .select("doc_id").as[Long].collect()).toSet
      assert(got == whole)
    } finally frozen.release()
  }
}
