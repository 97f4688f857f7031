package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class IncrementalJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ij").toString

  private def viewRows(view: String): Set[(Long, String, Long, String)] =
    IncrementalJoin.readView(spark, view).get
      .select("k", "lval", "rk", "rval")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet

  private def l(rows: (Long, String)*) = rows.toDF("k", "lval")
  private def r(rows: (Long, String)*) = rows.toDF("rk", "rval")

  test("first refresh materializes the full join; deltas on either side compose") {
    val (left, right, view) = (tmp() + "/L", tmp() + "/R", tmp() + "/V")
    IncrementalJoin.appendTable(spark, left, l(1L -> "a", 2L -> "b"))
    IncrementalJoin.appendTable(spark, right, r(1L -> "x", 3L -> "y"))
    IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    assert(viewRows(view) == Set((1L, "a", 1L, "x")))

    // left-side delta joins against the FULL right snapshot
    IncrementalJoin.appendTable(spark, left, l(3L -> "c"))
    IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    assert(viewRows(view) == Set((1L, "a", 1L, "x"), (3L, "c", 3L, "y")))

    // right-side delta joins against the OLD left snapshot (no dup of
    // the ΔL ⋈ ΔR pairs already covered by the previous refresh)
    IncrementalJoin.appendTable(spark, right, r(2L -> "z"))
    IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    assert(viewRows(view) ==
      Set((1L, "a", 1L, "x"), (3L, "c", 3L, "y"), (2L, "b", 2L, "z")))
  }

  test("simultaneous appends on both sides refresh to exactly the full recompute") {
    val (left, right, view) = (tmp() + "/L", tmp() + "/R", tmp() + "/V")
    IncrementalJoin.appendTable(spark, left, l(1L -> "a1", 2L -> "a2"))
    IncrementalJoin.appendTable(spark, right, r(2L -> "b2", 3L -> "b3"))
    IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    IncrementalJoin.appendTable(spark, left, l(3L -> "a3", 4L -> "a4"))
    IncrementalJoin.appendTable(spark, right, r(1L -> "b1", 4L -> "b4"))
    IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    // full recompute ground truth: every key 1..4 matched once
    assert(viewRows(view) == Set(
      (1L, "a1", 1L, "b1"), (2L, "a2", 2L, "b2"),
      (3L, "a3", 3L, "b3"), (4L, "a4", 4L, "b4")))
    // duplicate-join keys multiply, not dedup: append a second match
    IncrementalJoin.appendTable(spark, right, r(1L -> "b1bis"))
    IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    assert(viewRows(view).count(_._1 == 1L) == 2)
  }

  test("a no-change refresh publishes nothing and keeps the version") {
    val (left, right, view) = (tmp() + "/L", tmp() + "/R", tmp() + "/V")
    IncrementalJoin.appendTable(spark, left, l(1L -> "a"))
    IncrementalJoin.appendTable(spark, right, r(1L -> "x"))
    val v1 = IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    val v2 = IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    assert(v1 == v2)
  }

  test("a rewritten (non-append-only) source refuses the delta refresh loudly") {
    val (left, right, view) = (tmp() + "/L", tmp() + "/R", tmp() + "/V")
    IncrementalJoin.appendTable(spark, left, l(1L -> "a", 2L -> "b"))
    IncrementalJoin.appendTable(spark, right, r(1L -> "x"))
    IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    // whole-store rewrite of the left source (a compaction's shape)
    val leftP = new org.apache.hadoop.fs.Path(left)
    val fs = leftP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = Swap.Suffix.staging(leftP, Swap.newTag())
    l(1L -> "a", 2L -> "b").coalesce(1).write.parquet(staging.toString)
    CommitLog.commitStaged(spark, leftP, staging,
      CommitLog.currentVersion(fs, leftP), Nil, wholeStore = true)
    IncrementalJoin.appendTable(spark, left, l(3L -> "c"))
    val e = intercept[IllegalArgumentException] {
      IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    }
    assert(e.getMessage.contains("rebuild"))
  }

  test("view version pinning time-travels the materialization") {
    val (left, right, view) = (tmp() + "/L", tmp() + "/R", tmp() + "/V")
    IncrementalJoin.appendTable(spark, left, l(1L -> "a"))
    IncrementalJoin.appendTable(spark, right, r(1L -> "x"))
    val v1 = IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    IncrementalJoin.appendTable(spark, left, l(2L -> "b"))
    IncrementalJoin.appendTable(spark, right, r(2L -> "y"))
    IncrementalJoin.refresh(spark, left, right, view, "k", "rk")
    assert(viewRows(view).size == 2)
    val pinned = IncrementalJoin.readView(spark, view, Some(v1)).get.count()
    assert(pinned == 1L)
  }
}
