package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * Lineage: the reference (gridsum/DataflowEx) has no built-in sources —
  * data enters pipelines via `Post`/`SendAsync` from user code
  * [ref: Gridsum.DataflowEx.Demo]. In a Spark-native engine the source IS a
  * first-class operator: `spark.read.parquet` with schema pruning and
  * predicate pushdown handled by Catalyst/DataSource V2.
  *
  * Scale notes (100 TB posture):
  *  - Parquet scans are split by `spark.sql.files.maxPartitionBytes`
  *    (default 128 MiB) — a 100 TB table yields ~800k input splits, which a
  *    1000-executor cluster consumes fine; nothing here collects to the
  *    driver.
  *  - Column pruning + filter pushdown reach the scan automatically because
  *    every loader returns the raw DataFrame lazily (no caching, no
  *    materialization).
  */
object Tables {

  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  /** Generic parquet loader: `sfDir/name.parquet`. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS) which Spark
    * 4.x refuses to read natively ([PARQUET_TYPE_ILLEGAL]). We read nanos
    * as long and truncate to microseconds with integer division (NOT double
    * division — epoch-nanos ≈ 1.7e18 exceeds double's 2^53 mantissa, so
    * `/ 1000.0` would corrupt the low microseconds), matching DuckDB's
    * ns→µs truncation exactly. Emitted as TIMESTAMP_NTZ for oracle parity
    * with DuckDB's naive TIMESTAMP.
    *
    * The NTZ value is built by offsetting an NTZ epoch literal — a
    * timezone-INDEPENDENT path. (The tempting
    * `cast(timestamp_micros(x) as timestamp_ntz)` renders the instant in
    * the session timezone: correct under the harness's UTC sessions,
    * silently shifted anywhere else.)
    *
    * Session side effect: `nanosAsLong` stays set for the session
    * afterwards (it must hold when the lazy scan actually executes, so it
    * cannot be restored here). Any later read of a DIFFERENT nanos-
    * timestamp parquet in the same session will get a long column rather
    * than an error — convert it the same way this loader does.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts",
        expr("timestampadd(MICROSECOND, ts div 1000, timestamp_ntz'1970-01-01 00:00:00')"))
  }
}
