package graft.streaming

import java.sql.Timestamp

import graft.flow.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Ev(ts: Timestamp, user: String, value: Double)

class StreamOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def t(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minutes%02d:00")

  test("tumbling window aggregation groups by hour bucket (batch form)") {
    import spark.implicits._
    val df = Seq(Ev(t(5), "a", 1.0), Ev(t(15), "a", 2.0), Ev(t(45), "b", 3.0)).toDF()
    val out = StreamOps.tumbling(df, "ts", "30 minutes", col("user"))(
      count(lit(1)).as("n"), sum("value").as("sv"))
      .select("user", "n", "sv").orderBy("user", "sv").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("a", 2L, 3.0), ("b", 1L, 3.0)))
  }

  test("sliding window places each event in window/slide overlapping windows") {
    import spark.implicits._
    val df = Seq(Ev(t(10), "a", 1.0)).toDF()
    val out = StreamOps.sliding(df, "ts", "20 minutes", "5 minutes")(count(lit(1)).as("n"))
    assert(out.count() == 4)
  }

  test("session window merges events within gap, splits across it") {
    import spark.implicits._
    val df = Seq(Ev(t(0), "a", 1.0), Ev(t(4), "a", 1.0), Ev(t(30), "a", 1.0)).toDF()
    val out = StreamOps.session(df, "ts", "10 minutes", col("user"))(count(lit(1)).as("n"))
    assert(out.select("n").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("watermark drops late data in a streaming aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = StreamOps.tumbling(
      StreamOps.watermarked(mem.toDF(), "ts", "10 minutes"),
      "ts", "10 minutes")(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      // batch 1: events up to 00:50 → watermark advances to 00:40
      mem.addData(Ev(t(5), "a", 1.0), Ev(t(50), "a", 1.0))
      q.processAllAvailable()
      // batch 2: a 00:06 straggler — behind the watermark, must be dropped;
      // plus 00:55 (open window)
      mem.addData(Ev(t(6), "a", 1.0), Ev(t(55), "a", 1.0))
      q.processAllAvailable()
      // close all windows so they emit
      mem.addData(Ev(Timestamp.valueOf("2024-01-01 02:00:00"), "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wm_out")
        .select(col("window.start").cast("string"), col("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows("2024-01-01 00:00:00") == 1) // straggler NOT counted
      assert(rows("2024-01-01 00:50:00") == 2)
    } finally q.stop()
  }

  test("late-but-within-watermark rows still count; only beyond-watermark drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = StreamOps.tumbling(
      StreamOps.watermarked(mem.toDF(), "ts", "30 minutes"),
      "ts", "10 minutes")(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_late_out").start()
    try {
      mem.addData(Ev(t(50), "a", 1.0)) // watermark → 00:20
      q.processAllAvailable()
      // 00:45 is BEHIND max event time but AHEAD of the watermark: counted
      mem.addData(Ev(t(45), "a", 1.0), Ev(t(46), "a", 1.0))
      q.processAllAvailable()
      // close all windows
      mem.addData(Ev(Timestamp.valueOf("2024-01-01 03:00:00"), "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wm_late_out")
        .select(col("window.start").cast("string"), col("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows("2024-01-01 00:40:00") == 2) // late 45 & 46 both counted
      assert(rows("2024-01-01 00:50:00") == 1)
    } finally q.stop()
  }

  test("streaming dedup within watermark removes duplicate keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dedup = StreamOps.dedupStream(mem.toDF(), "ts", "10 minutes", "user")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dd_out").start()
    try {
      mem.addData(Ev(t(1), "a", 1.0), Ev(t(2), "a", 2.0), Ev(t(3), "b", 3.0))
      q.processAllAvailable()
      mem.addData(Ev(t(4), "a", 4.0))
      q.processAllAvailable()
      assert(spark.table("dd_out").count() == 2) // one per distinct user
    } finally q.stop()
  }

  test("stream-stream join matches rows within the time bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = StreamOps.streamStreamJoin(
      clicks.toDF().select(col("ts").as("cts"), col("user"), col("value").as("cv")),
      buys.toDF().select(col("ts").as("bts"), col("user").as("buser"), col("value").as("bv"))
        .withColumnRenamed("buser", "user"),
      "user", "cts", "bts", within = "10 MINUTES", maxDelay = "1 minute")
    val q = joined.select("user", "cv", "bv").writeStream
      .outputMode("append").format("memory").queryName("ssj_out").start()
    try {
      clicks.addData(Ev(t(0), "a", 1.0), Ev(t(40), "a", 2.0))
      buys.addData(Ev(t(5), "a", 100.0), Ev(t(59), "b", 200.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_out").as[(String, Double, Double)].collect().toSet
      // click@0 pairs with buy@5 (within 10m); click@40 pairs with nothing
      // (buy@5 too old, buy@59 wrong user)
      assert(rows == Set(("a", 1.0, 100.0)))
    } finally q.stop()
  }

  test("stream-stream join: beyond-watermark late row is dropped, timely late row joins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = StreamOps.streamStreamJoin(
      clicks.toDF().select(col("ts").as("cts"), col("user"), col("value").as("cv")),
      buys.toDF().select(col("ts").as("bts"), col("user").as("u2"), col("value").as("bv"))
        .withColumnRenamed("u2", "user"),
      "user", "cts", "bts", within = "10 MINUTES", maxDelay = "10 minutes")
    val q = joined.select("user", "cv", "bv").writeStream
      .outputMode("append").format("memory").queryName("ssj_late_out").start()
    try {
      // batch 1 advances BOTH watermarks to 00:50 via far-future rows
      clicks.addData(Ev(t(0), "a", 1.0), Ev(Timestamp.valueOf("2024-01-01 01:00:00"), "zc", 0.0))
      buys.addData(Ev(Timestamp.valueOf("2024-01-01 01:00:00"), "zb", 0.0))
      q.processAllAvailable()
      // batch 2: buy@00:05 for user a is 45 min behind the watermark —
      // dropped, even though it would satisfy the ±10 min join bound
      buys.addData(Ev(t(5), "a", 100.0))
      q.processAllAvailable()
      val afterLate = spark.table("ssj_late_out").count()
      assert(afterLate == 0, "beyond-watermark row must not join")
      // batch 3: click+buy near the current watermark frontier both land
      clicks.addData(Ev(Timestamp.valueOf("2024-01-01 01:01:00"), "b", 2.0))
      buys.addData(Ev(Timestamp.valueOf("2024-01-01 01:02:00"), "b", 200.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_late_out").as[(String, Double, Double)].collect().toSet
      assert(rows == Set(("b", 2.0, 200.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: state outlives the delay window until eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dedup = StreamOps.dedupStream(mem.toDF(), "ts", "10 minutes", "user")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dd_wm_out").start()
    try {
      def aRows: Long = spark.table("dd_wm_out").filter(col("user") === "a").count()
      mem.addData(Ev(t(0), "a", 1.0)) // first 'a'; state expires at 00:10
      q.processAllAvailable()
      // advance watermark EXACTLY to the expiry boundary: wm = 00:10
      mem.addData(Ev(t(20), "z", 0.0)) // wm := 00:20 - 10m = 00:10
      q.processAllAvailable()
      // duplicate at ts == wm == expiry: Spark evicts strictly-greater
      // only, so the state is still live at the boundary → dropped.
      // (Pinned behavior — the contract guarantees dedup only WITHIN the
      // delay, so either outcome at the boundary would be conformant.)
      mem.addData(Ev(t(10), "a", 2.0))
      q.processAllAvailable()
      assert(aRows == 1, s"boundary duplicate should still dedup, got $aRows row(s)")
      // advance the watermark STRICTLY past the expiry (00:30 > 00:10).
      // Eviction LAGS one batch: a batch's state cleanup runs with the
      // watermark computed from PRIOR batches, so run one more batch at
      // the same max event time to let the cleanup see wm=00:30.
      mem.addData(Ev(t(40), "z2", 0.0)) // after this batch wm := 00:30
      q.processAllAvailable()
      mem.addData(Ev(t(40), "z3", 0.0)) // runs WITH wm=00:30 → evicts 'a'
      q.processAllAvailable()
      // 'a' can now re-emit: its dedup state is gone. ts must be STRICTLY
      // above the watermark — this operator drops ts == wm as late
      // (probed: an 00:30 row at wm 00:30 never surfaced), unlike the
      // windowed aggregation above which keeps exactly-at-watermark rows.
      mem.addData(Ev(t(35), "a", 4.0))
      q.processAllAvailable()
      assert(aRows == 2, s"post-eviction 'a' should re-emit, got $aRows row(s)")
      // a STRICTLY-late duplicate (behind the watermark) is dropped
      mem.addData(Ev(t(5), "a", 3.0))
      q.processAllAvailable()
      assert(aRows == 2)
    } finally q.stop()
  }

  test("session windows merge across micro-batches in a real stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = StreamOps.session(
      StreamOps.watermarked(mem.toDF(), "ts", "10 minutes"),
      "ts", "5 minutes", col("user"))(count(lit(1)).as("n"))
    val q = agg.select(col("user"), col("session_window.start").cast("string").as("ss"),
        col("n"))
      .writeStream.outputMode("append").format("memory").queryName("sw_out").start()
    try {
      // batch 1 opens a session [00:00, 00:04]; batch 2 EXTENDS it (00:07
      // within the 5-minute gap of 00:04) — merging state across batches
      mem.addData(Ev(t(0), "a", 1.0), Ev(t(4), "a", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(t(7), "a", 1.0), Ev(t(30), "a", 1.0)) // 00:30 = new session
      q.processAllAvailable()
      // close everything so append mode emits
      mem.addData(Ev(Timestamp.valueOf("2024-01-01 02:00:00"), "z", 0.0))
      q.processAllAvailable()
      val rows = spark.table("sw_out").filter(col("user") === "a")
        .select("ss", "n").as[(String, Long)].collect().toMap
      assert(rows("2024-01-01 00:00:00") == 3) // one merged 3-event session
      assert(rows("2024-01-01 00:30:00") == 1)
    } finally q.stop()
  }

  test("stateful dispatcher maintains per-key state across micro-batches (A13)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // NoTimeout is a conscious choice here: the test key space is bounded.
    val counts = StreamOps.runningCounts(mem.toDS(), (e: Ev) => e.user,
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
    val q = counts.toDF("user", "n").writeStream.outputMode("update")
      .format("memory").queryName("rc_out").start()
    try {
      mem.addData(Ev(t(1), "a", 1.0), Ev(t(2), "a", 1.0), Ev(t(3), "b", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(t(4), "a", 1.0))
      q.processAllAvailable()
      val last = spark.table("rc_out").groupBy("user").agg(max("n").as("n"))
        .as[(String, Long)].collect().toMap
      assert(last == Map("a" -> 3L, "b" -> 1L))
    } finally q.stop()
  }

  test("runningCounts rejects EventTimeTimeout (state would silently never expire)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val e = intercept[IllegalArgumentException] {
      StreamOps.runningCounts(mem.toDS(), (ev: Ev) => ev.user,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout())
    }
    assert(e.getMessage.contains("EventTimeTimeout"))
  }

  test("train/val/test assignment is stream-identical: the same doc gets " +
    "the same label through a stream as in batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ids = (1L to 200L)
    val batchLabels = ids.toDF("doc_id")
      .select(col("doc_id"), graft.operators.Splits.split(col("doc_id")).as("split"))
      .as[(Long, String)].collect().toMap
    val mem = MemoryStream[Long]
    val streamed = scala.collection.mutable.Map[Long, String]()
    val q = mem.toDF().toDF("doc_id")
      .select(col("doc_id"), graft.operators.Splits.split(col("doc_id")).as("split"))
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        streamed.synchronized {
          df.as[(Long, String)].collect().foreach { case (k, v) => streamed(k) = v }
        }
      }.start()
    try {
      mem.addData(ids.take(100): _*)
      q.processAllAvailable()
      mem.addData(ids.drop(100): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(streamed.toMap == batchLabels)
    // sanity: all three splits actually occur at n=200
    assert(batchLabels.values.toSet == Set("train", "val", "test"))
  }
}
