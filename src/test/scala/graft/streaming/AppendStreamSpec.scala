package graft.streaming

import java.nio.file.Files

import graft.flow.SparkTestSession
import graft.operators.CommitLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once streaming append into a commit-log table: e2e through
  * MemoryStream, replay skip, blind-append concurrency (two add-only
  * commits racing from the same base both land), and constraint
  * enforcement on appended rows. */
class AppendStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("MemoryStream e2e: batches append exactly-once, fastCount tracks, " +
    "the store self-describes") {
    val base = tmp("graft_append_e2e")
    val store = s"$base/t"
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.appendStream(
      in.toDF().toDF("k", "v"), store, s"$base/ckpt")()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val p = new Path(store)
    val out = CommitLog.read(spark, p).get
    assert(out.select("k").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(CommitLog.fastCount(fs, p, CommitLog.currentVersion(fs, p)).contains(3L))
  }

  test("a replayed batchId is skipped (crash after commit, before " +
    "checkpoint advance)") {
    val store = tmp("graft_append_replay") + "/t"
    val b = Seq((1L, "a")).toDF("k", "v")
    assert(StreamOps.appendBatchOnce(b, store, batchId = 0))
    assert(!StreamOps.appendBatchOnce(b, store, batchId = 0)) // replay
    assert(StreamOps.appendBatchOnce(b, store, batchId = 1))
    assert(CommitLog.read(spark, new Path(store)).get.count() == 2)
  }

  test("the high-water mark survives maintenance commits at the tip " +
    "(bounded meta walk, not tipMeta)") {
    val store = tmp("graft_append_maint") + "/t"
    StreamOps.appendBatchOnce(
      (1L to 20L).map(k => (k, k * 3)).toDF("k", "x"), store, batchId = 0)
    graft.operators.Optimize.zorder(spark, store, Seq("x"), numFiles = 2)
    // optimize's commit is now the tip; replay of batch 0 must STILL skip
    assert(!StreamOps.appendBatchOnce(
      Seq((99L, 99L)).toDF("k", "x"), store, batchId = 0))
    assert(StreamOps.appendBatchOnce(
      Seq((99L, 99L)).toDF("k", "x"), store, batchId = 1))
  }

  test("two blind appends racing into the SAME partition dir from the " +
    "same base BOTH land (Delta's add-only rule); a non-blind writer on " +
    "that dir still conflicts") {
    val store = tmp("graft_append_blind") + "/t"
    val p = new Path(store)
    StreamOps.appendBatchOnce(
      Seq((1L, "a", "px")).toDF("k", "v", "p"), store, 0, Seq("p"))
    val base = CommitLog.currentVersion(fs, p)

    // two writers stage against the SAME base and commit one after the
    // other — the second sees the first's commit in its OCC window, and
    // both write into partition dir p=px
    def stageAndCommit(row: (Long, String, String), blind: Boolean): Long = {
      val staging = graft.operators.Swap.Suffix.staging(
        p, graft.operators.Swap.newTag())
      Seq(row).toDF("k", "v", "p").write.partitionBy("p")
        .parquet(staging.toString)
      CommitLog.commitStaged(spark, p, staging, base, Nil,
        wholeStore = false, blindAppend = blind)
    }
    assert(stageAndCommit((2L, "b", "px"), blind = true) == base + 1)
    // same base, same dir, lands after the first: blind → no conflict
    assert(stageAndCommit((3L, "c", "px"), blind = true) == base + 2)
    assert(CommitLog.read(spark, p).get.count() == 3)
    // the same racing commit WITHOUT the blind flag conflicts on p=px
    intercept[CommitLog.ConflictException] {
      stageAndCommit((4L, "d", "px"), blind = false)
    }
  }

  test("CHECK constraints apply to appended batches") {
    val store = tmp("graft_append_chk") + "/t"
    StreamOps.appendBatchOnce(Seq((1L, 5.0)).toDF("k", "price"), store, 0)
    CommitLog.setConstraint(spark, new Path(store), "pos", "price > 0")
    intercept[CommitLog.ConstraintException] {
      StreamOps.appendBatchOnce(Seq((2L, -1.0)).toDF("k", "price"), store, 1)
    }
    // the refused batch recorded no high-water: a corrected retry under
    // the SAME batchId applies
    assert(StreamOps.appendBatchOnce(Seq((2L, 1.0)).toDF("k", "price"), store, 1))
  }
}
