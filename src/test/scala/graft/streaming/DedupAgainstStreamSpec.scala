package graft.streaming

import graft.flow.SparkTestSession
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gate for the streaming cross-corpus dedup-against (VERDICT r14 item
  * 7): an incremental feed gated against a FROZEN reference corpus must
  * admit, across micro-batches, EXACTLY what the proven batch operator
  * admits on the union — and the only cross-batch state is the fixed
  * frozen-reference cache, released to session baseline afterwards (the
  * PpjoinReleaseSpec discipline). */
class DedupAgainstStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("cross-batch admissions equal the batch operator on the union; " +
    "frozen state is fixed-size and releases to baseline") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // even ids stream in, odd ids are the frozen reference — the exact
    // q_dedup_against corpus split, so the batch side is oracle-proven
    val evens = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val reference = docs.filter(col("doc_id") % 2 === 1)

    // the union-side expected answer, via the oracle-proven BATCH
    // operator — computed BEFORE the baseline snapshot because
    // dedupAgainst retains its internal candidate cache by design
    val want = Dedup.dedupAgainst(
        docs.filter(col("doc_id") % 2 === 0), reference,
        "doc_id", "text", shingleN = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet

    def cachedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val baselineIds = cachedIds

    // three deterministic micro-batches
    val batches = Seq(
      evens.filter(_._1 % 3 == 0),
      evens.filter(_._1 % 3 == 1),
      evens.filter(_._1 % 3 == 2))
    assert(batches.forall(_.nonEmpty))

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cachedAfterBatch = List.empty[Int]
    val (q, release) = StreamOps.dedupAgainstStream(
      mem.toDF().toDF("doc_id", "text"), reference,
      tmp("graft_das_ck"), "doc_id", "text",
      shingleN = 3, threshold = 0.5) { (adm, _) =>
      admitted ++= adm.select("doc_id").as[Long].collect()
      cachedAfterBatch ::= cachedIds.size
    }
    try {
      for (b <- batches) { mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    // exactness: union of per-batch admissions == batch dedupAgainst on
    // the union (no corpus-side bucket overflows at fixture scale, the
    // regime where the decomposition is exact by construction)
    assert(admitted.size == admitted.distinct.size, "no doc admitted twice")
    assert(admitted.toSet == want,
      s"stream-vs-batch drift: extra=${admitted.toSet -- want} " +
        s"missing=${want -- admitted.toSet}")
    assert(want.nonEmpty && admitted.size < evens.size,
      "fixture must exercise both admit and drop paths")

    // bounded state: the persisted-RDD count is FLAT across batches (the
    // frozen cache only — per-batch candidates/admitted are released
    // inside the trigger), and release() returns it to session baseline
    assert(cachedAfterBatch.distinct.size == 1,
      s"per-batch cache growth: $cachedAfterBatch")
    release()
    assert(cachedIds == baselineIds,
      s"release() must return to baseline (leftover=${cachedIds -- baselineIds})")
  }

  test("dedupAgainstFrozen decisions are per-doc pure: any batch split " +
    "admits the same ids (batch-boundary invariance)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val reference = docs.filter(col("doc_id") % 2 === 1)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val frozen = Dedup.freezeReference(reference, "doc_id", "text")
    try {
      val whole = Dedup.dedupAgainstFrozen(corpus, frozen)
      val wholeIds = whole.select("doc_id").as[Long].collect().toSet
      whole.unpersist()
      // a different split than the streaming test: two halves by parity
      // of doc_id/2 — decisions must not move across the boundary
      val parts = Seq(
        corpus.filter((col("doc_id") / 2).cast("long") % 2 === 0),
        corpus.filter((col("doc_id") / 2).cast("long") % 2 === 1))
      val got = parts.flatMap { p =>
        val a = Dedup.dedupAgainstFrozen(p, frozen)
        val ids = a.select("doc_id").as[Long].collect().toSet
        a.unpersist()
        ids
      }.toSet
      assert(got == wholeIds)
    } finally frozen.release()
  }
}
