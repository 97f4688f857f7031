package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unbounded-source ingest — the Kafka-shaped gap, closed with the only
  * unbounded source this offline environment has: Spark's built-in
  * `rate-micro-batch` generator. The reference is a push-stream library
  * (callers `Post` into a live pipeline forever); everything else in this
  * repo streams from FILES, which are unbounded-in-practice but arrive in
  * closed batches. This demo is the genuinely-unbounded form: a source
  * that never ends, consumed with the exact operator chain a Kafka topic
  * would get — parse → watermark → windowed aggregate → sink — so
  * swapping `format("rate-micro-batch")` for `format("kafka")` (plus
  * serde) is the ONLY change a real deployment needs.
  *
  * `rate-micro-batch` over plain `rate`: batch contents are a pure
  * function of (startTimestamp, rowsPerBatch, batch id), not of wall
  * clock, so tests assert exact rows instead of sleeping and hoping.
  *
  * Scale notes: the rate source partitions via `numPartitions` (a real
  * Kafka source inherits topic partitions); the windowed aggregate's
  * state is keyed by (window, user) and bounded by the watermark —
  * nothing here accumulates unbounded state or funnels through one task.
  */
object RateIngest {

  /** The unbounded event stream: `rowsPerBatch` synthetic events per
    * micro-batch, shaped like the fixture `events` table (ts, user_id,
    * event_type, value). Deterministic: row `value` n maps to user
    * n % `users`, event type n % 3, at startTime + n×`stepMs`. */
  def events(
      spark: SparkSession,
      rowsPerBatch: Int = 100,
      users: Int = 8,
      stepMs: Long = 250L,
      numPartitions: Int = 4): DataFrame =
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("startTimestamp", 0L)
      .option("numPartitions", numPartitions)
      .load()
      .select(
        timestamp_millis(col("value") * stepMs).as("ts"),
        pmod(col("value"), lit(users.toLong)).cast("long").as("user_id"),
        element_at(
          array(lit("view"), lit("click"), lit("purchase")),
          (pmod(col("value"), lit(3L)) + 1).cast("int")).as("event_type"),
        (col("value") % 97).cast("double").as("value"))

  /** The standing query: per-user tumbling-window event counts and value
    * sums, late data bounded by `maxDelay`. Composes the SAME StreamOps
    * building blocks the file-streaming paths use — the source is the
    * only thing that changed. */
  def windowedActivity(
      events: DataFrame,
      windowLen: String = "10 seconds",
      maxDelay: String = "5 seconds"): DataFrame =
    StreamOps.tumbling(
      StreamOps.watermarked(events, "ts", maxDelay),
      "ts", windowLen, col("user_id"))(
      count(lit(1)).as("n_events"),
      sum(col("value")).as("value_sum"))
      .select(
        col("window.start").as("win_start"),
        col("user_id"), col("n_events"), col("value_sum"))

  /** Run the demo end-to-end for `batches` micro-batches into an
    * in-memory sink table and return the collected rows. Append mode +
    * watermark: only windows the watermark has closed emit, exactly the
    * contract a downstream parquet sink would see. */
  def runDemo(
      spark: SparkSession,
      name: String,
      batches: Int = 5,
      rowsPerBatch: Int = 100): DataFrame = {
    val q = windowedActivity(events(spark, rowsPerBatch))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
    // poll progress, don't processAllAvailable(): an unbounded source
    // always has a next batch, so "all available" never arrives
    try {
      val deadline = System.currentTimeMillis() + 120000L
      while (q.recentProgress.count(_.numInputRows > 0) < batches &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally q.stop()
    spark.table(name)
  }
}
