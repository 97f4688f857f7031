package graft.streaming

import java.sql.Timestamp

import graft.flow.SparkTestSession
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, OutputMode, TTLConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Per-key running max over transformWithState (the v2 arbitrary-state
  * API): one lazily-initialized state variable per key — the closest
  * modern analog to DataDispatcher's one-child-flow-per-key. */
class MaxProcessor extends StatefulProcessor[String, Ev, (String, Double)] {
  @transient private var maxState: org.apache.spark.sql.streaming.ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    maxState = getHandle.getValueState[Double](
      "max", Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[Ev],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Double)] = {
    val prev = if (maxState.exists()) maxState.get() else Double.MinValue
    val m = math.max(prev, rows.map(_.value).max)
    maxState.update(m)
    Iterator((key, m))
  }
}

/** Same running max but with a processing-time TTL on the state — an idle
  * key's max expires and restarts, the bounded-state discipline StreamOps
  * requires of every stateful op. */
class TtlMaxProcessor(ttlMillis: Long) extends StatefulProcessor[String, Ev, (String, Double)] {
  @transient private var maxState: org.apache.spark.sql.streaming.ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    maxState = getHandle.getValueState[Double](
      "max", Encoders.scalaDouble, TTLConfig(java.time.Duration.ofMillis(ttlMillis)))

  override def handleInputRows(
      key: String,
      rows: Iterator[Ev],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Double)] = {
    val prev = if (maxState.exists()) maxState.get() else Double.MinValue
    val m = math.max(prev, rows.map(_.value).max)
    maxState.update(m)
    Iterator((key, m))
  }
}

class TransformWithStateSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("transformWithState keeps per-key state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val out = StreamOps.dispatchStatefulV2(
        mem.toDS(), (e: Ev) => e.user, new MaxProcessor,
        TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user", "mx").writeStream.outputMode("update")
        .format("memory").queryName("tws_out").start()
      try {
        mem.addData(
          Ev(Timestamp.valueOf("2024-01-01 00:01:00"), "a", 5.0),
          Ev(Timestamp.valueOf("2024-01-01 00:02:00"), "b", 7.0))
        q.processAllAvailable()
        mem.addData(Ev(Timestamp.valueOf("2024-01-01 00:03:00"), "a", 3.0))
        q.processAllAvailable()
        val last = spark.table("tws_out").groupBy("user")
          .agg(max("mx").as("mx")).as[(String, Double)].collect().toMap
        assert(last == Map("a" -> 5.0, "b" -> 7.0)) // max survives batch 2
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("value-state TTL expires idle keys: the running max restarts after the TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val out = StreamOps.dispatchStatefulV2(
        mem.toDS(), (e: Ev) => e.user, new TtlMaxProcessor(ttlMillis = 1000),
        TimeMode.ProcessingTime(), OutputMode.Update())
      val q = out.toDF("user", "mx").writeStream.outputMode("update")
        .format("memory").queryName("tws_ttl_out").start()
      try {
        // ProcessingTime time mode keeps firing empty micro-batches for
        // timer/TTL evaluation, so processAllAvailable never quiesces —
        // poll the sink with a deadline instead.
        def awaitRows(n: Long): Unit = {
          val deadline = System.currentTimeMillis() + 60000
          while (spark.table("tws_ttl_out").count() < n &&
            System.currentTimeMillis() < deadline) Thread.sleep(200)
          assert(spark.table("tws_ttl_out").count() >= n,
            s"sink never reached $n rows")
        }
        mem.addData(Ev(Timestamp.valueOf("2024-01-01 00:01:00"), "a", 9.0))
        awaitRows(1)
        Thread.sleep(3000) // idle well past the 1 s TTL
        mem.addData(Ev(Timestamp.valueOf("2024-01-01 00:02:00"), "a", 3.0))
        awaitRows(2)
        val vals = spark.table("tws_ttl_out").select("mx").as[Double].collect().toSet
        // first batch emitted 9.0; second emitted 3.0 BECAUSE the 9.0
        // state expired — an un-expired state would re-emit 9.0
        assert(vals == Set(9.0, 3.0), s"got $vals")
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
