package graft.streaming

import graft.flow.SparkTestSession
import graft.operators.{CommitLog, Expectations}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming WAP: good batches publish, bad batches quarantine in full
  * with their audit report, nothing is silently dropped, replays are
  * idempotent. */
class WapStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val checks = Seq(
    Expectations.Unique("k"), Expectations.Complete("v", 1.0))

  test("good batches publish, a violating batch lands in quarantine " +
    "with its report, the store never sees it") {
    val store = tmp("graft_wapq_s") + "/s"
    val quarantine = tmp("graft_wapq_q")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Option[String])]
    val q = StreamOps.wapStream(
      mem.toDF().toDF("k", "v"), store, tmp("graft_wapq_ck"),
      checks, quarantine)
    try {
      mem.addData((1L, Some("a")), (2L, Some("b")))
      q.processAllAvailable()
      // batch with a NULL v: Complete(v) fails
      mem.addData((3L, None), (4L, Some("d")))
      q.processAllAvailable()
      mem.addData((5L, Some("e")))
      q.processAllAvailable()

      val kept = CommitLog.read(spark, new Path(store)).get
        .select("k").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 5L))
      val quarantined = spark.read.parquet(s"$quarantine/batch=1/data")
        .select("k").as[Long].collect().toSet
      assert(quarantined == Set(3L, 4L))
      val failedChecks = spark.read.parquet(s"$quarantine/batch=1/report")
        .filter(!$"passed").select("check_name").as[String].collect().toSet
      assert(failedChecks == Set("complete(v)"))
    } finally q.stop()
  }

  test("replayed accepted batches are skipped; a replayed refused batch " +
    "re-quarantines idempotently") {
    val store = tmp("graft_wapr") + "/s"
    val quarantine = tmp("graft_wapr_q")
    val good = Seq((1L, "a")).toDF("k", "v")
    assert(StreamOps.applyWapBatchOnce(good, store, 0L, checks, quarantine))
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = CommitLog.currentVersion(fs, new Path(store))
    assert(!StreamOps.applyWapBatchOnce(good, store, 0L, checks, quarantine))
    assert(CommitLog.currentVersion(fs, new Path(store)) == v)

    val bad = Seq((1L, "dup-key")).toDF("k", "v") // duplicates existing k=1
    assert(!StreamOps.applyWapBatchOnce(bad, store, 1L, checks, quarantine))
    assert(!StreamOps.applyWapBatchOnce(bad, store, 1L, checks, quarantine))
    assert(spark.read.parquet(s"$quarantine/batch=1/data").count() == 1)
    assert(CommitLog.currentVersion(fs, new Path(store)) == v)
  }
}
