package graft.streaming

import graft.flow.SparkTestSession
import graft.operators.CommitLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CDC replication: each micro-batch lands upserts + deletes
  * in one atomic commit, replays skip on the batchId high-water mark,
  * and the replica tracks the resolved change history exactly. */
class CdcStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def state(store: String): Map[Long, String] =
    CommitLog.read(spark, new Path(store)).get
      .select("k", "v").as[(Long, String)].collect().toMap

  private def fs =
    new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a stream of change batches maintains the replica; every batch " +
    "is ONE commit") {
    val dir = tmp("graft_cdcs") + "/r"
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, String)]
    val q = StreamOps.cdcStream(
      mem.toDF().toDF("k", "v", "seq", "op"), dir,
      tmp("graft_cdcs_ck"), Seq("k"), "seq", "op")
    try {
      // batch 0: bootstrap inserts
      mem.addData((1L, "a1", 1L, "I"), (2L, "b1", 1L, "I"), (3L, "c1", 1L, "I"))
      q.processAllAvailable()
      assert(state(dir) == Map(1L -> "a1", 2L -> "b1", 3L -> "c1"))
      val v1 = CommitLog.currentVersion(fs, new Path(dir))

      // batch 1: update 1 (late row loses), delete 2, insert 4
      mem.addData((1L, "a2", 3L, "U"), (1L, "late", 2L, "U"),
        (2L, "x", 2L, "D"), (4L, "d1", 1L, "I"))
      q.processAllAvailable()
      assert(state(dir) == Map(1L -> "a2", 3L -> "c1", 4L -> "d1"))
      assert(CommitLog.currentVersion(fs, new Path(dir)) == v1 + 1,
        "upserts and deletes of one batch must be ONE commit")
    } finally q.stop()
  }

  test("replayed batch ids are skipped; empty batches publish nothing") {
    val dir = tmp("graft_cdcr") + "/r"
    val feed1 = Seq((1L, "a", 1L, "I")).toDF("k", "v", "seq", "op")
    assert(StreamOps.applyCdcBatchOnce(feed1, dir, 0L, Seq("k"), "seq", "op"))
    val v = CommitLog.currentVersion(fs, new Path(dir))
    // replay of batch 0 with different (stale) content must be a no-op
    val stale = Seq((1L, "CLOBBER", 99L, "U")).toDF("k", "v", "seq", "op")
    assert(!StreamOps.applyCdcBatchOnce(stale, dir, 0L, Seq("k"), "seq", "op"))
    assert(CommitLog.currentVersion(fs, new Path(dir)) == v)
    assert(state(dir) == Map(1L -> "a"))
    // empty batch: nothing published, id not consumed destructively
    val empty = Seq.empty[(Long, String, Long, String)].toDF("k", "v", "seq", "op")
    assert(!StreamOps.applyCdcBatchOnce(empty, dir, 1L, Seq("k"), "seq", "op"))
    assert(CommitLog.currentVersion(fs, new Path(dir)) == v)
    // the next real batch still applies
    val feed2 = Seq((2L, "b", 1L, "I")).toDF("k", "v", "seq", "op")
    assert(StreamOps.applyCdcBatchOnce(feed2, dir, 2L, Seq("k"), "seq", "op"))
    assert(state(dir) == Map(1L -> "a", 2L -> "b"))
  }
}
