package graft.streaming

import graft.flow.SparkTestSession
import graft.operators.IncrementalJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming incremental-join maintenance: left-side micro-batches land
  * in the source log exactly once, and the materialized view always
  * equals the one-shot join of everything ingested so far. */
class IncrementalJoinStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def viewSet(view: String): Set[(Long, String, Long, String)] =
    IncrementalJoin.readView(spark, view)
      .map(_.select("k", "lv", "rk", "rv").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet)
      .getOrElse(Set.empty)

  test("streamed left batches keep the view equal to the one-shot join") {
    val base = tmp("graft_ijs")
    val (left, right, view) = (base + "/L", base + "/R", base + "/V")
    IncrementalJoin.appendTable(spark, right,
      Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("rk", "rv"))
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.incrementalJoinStream(
      mem.toDF().toDF("k", "lv"), left, right, view, "k", "rk",
      tmp("graft_ijs_ck"))
    try {
      mem.addData((1L, "a"), (9L, "nomatch")); q.processAllAvailable()
      assert(viewSet(view) == Set((1L, "a", 1L, "x")))

      mem.addData((2L, "b"), (3L, "c")); q.processAllAvailable()
      assert(viewSet(view) ==
        Set((1L, "a", 1L, "x"), (2L, "b", 2L, "y"), (3L, "c", 3L, "z")))

      // a RIGHT-side append between triggers is picked up by the next one
      IncrementalJoin.appendTable(spark, right, Seq((9L, "late")).toDF("rk", "rv"))
      mem.addData((7L, "d")); q.processAllAvailable()
      assert(viewSet(view).contains((9L, "nomatch", 9L, "late")),
        "old left row must join the late right append")
    } finally q.stop()
  }

  test("replayed batch ids skip the append; the refresh still heals the view") {
    val base = tmp("graft_ijr")
    val (left, right, view) = (base + "/L", base + "/R", base + "/V")
    IncrementalJoin.appendTable(spark, right, Seq((1L, "x")).toDF("rk", "rv"))
    val b0 = Seq((1L, "a")).toDF("k", "lv")
    assert(StreamOps.applyJoinBatchOnce(b0, left, right, view, "k", "rk", 0L))
    val v = viewSet(view)
    assert(v == Set((1L, "a", 1L, "x")))
    // replay of batch 0: append skipped, view unchanged
    assert(!StreamOps.applyJoinBatchOnce(b0, left, right, view, "k", "rk", 0L))
    assert(viewSet(view) == v)

    // crash window: a batch APPENDED to the source but the view refresh
    // never ran — the replayed trigger skips the duplicate append and
    // its unconditional refresh catches the view up
    IncrementalJoin.appendTable(spark, left, Seq((2L, "b")).toDF("k", "lv"),
      meta = Map("ijBatchId" -> "1"))
    IncrementalJoin.appendTable(spark, right, Seq((2L, "y")).toDF("rk", "rv"))
    assert(!StreamOps.applyJoinBatchOnce(
      Seq((2L, "b")).toDF("k", "lv"), left, right, view, "k", "rk", 1L))
    assert(viewSet(view) == Set((1L, "a", 1L, "x"), (2L, "b", 2L, "y")))
  }
}
