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

  /** `events.parquet` — schema-sniffing loader for the `ts` column.
    *
    * The driver has shipped this fixture in two physical encodings across
    * rounds:
    *  - INT64 TIMESTAMP(NANOS): Spark 4.x refuses to read it natively
    *    ([PARQUET_TYPE_ILLEGAL]); with `nanosAsLong=true` it decodes as a
    *    raw `LongType` of epoch-nanos.
    *  - INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads this
    *    natively as `TimestampNTZType` (the round-9 regeneration,
    *    parquet-cpp-arrow 16.1.0).
    * A loader hard-wired to either encoding breaks silently when the
    * fixture is regenerated (round 9 lost 18 oracle rows this way), so we
    * sniff the DECODED Spark type of `ts` and branch:
    *  - `LongType` → nanos: truncate to µs with integer division (NOT
    *    double division — epoch-nanos ≈ 1.7e18 exceeds double's 2^53
    *    mantissa, so `/ 1000.0` would corrupt the low microseconds),
    *    matching DuckDB's ns→µs truncation, then offset an NTZ epoch
    *    literal — a timezone-INDEPENDENT construction. (The tempting
    *    `cast(timestamp_micros(x) as timestamp_ntz)` renders the instant
    *    in the session timezone: correct under the harness's UTC
    *    sessions, silently shifted anywhere else.)
    *  - `TimestampNTZType` → pass through untouched; DuckDB reads the
    *    same file as naive TIMESTAMP, so parity is free.
    *  - `TimestampType` (isAdjustedToUTC=true, not seen from the driver
    *    yet) → strip the zone via `to_utc_timestamp`-free reinterpretation:
    *    DuckDB reads TIMESTAMPTZ parquet as the UTC wall clock, so we
    *    rebuild NTZ from the UTC epoch-micros, independent of the session
    *    timezone.
    *
    * The sniff costs one footer read (schema only, no row groups) —
    * negligible even on a 100 TB table, where the footer sample is one
    * file.
    *
    * Session side effect: `nanosAsLong` stays set for the session
    * afterwards (it must hold when the lazy scan actually executes, so it
    * cannot be restored here). It is harmless for micros fixtures — the
    * flag only affects TIMESTAMP(NANOS) columns.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          expr("timestampadd(MICROSECOND, ts div 1000, timestamp_ntz'1970-01-01 00:00:00')"))
      case TimestampNTZType => raw
      case TimestampType =>
        raw.withColumn("ts",
          expr("timestampadd(MICROSECOND, unix_micros(ts), timestamp_ntz'1970-01-01 00:00:00')"))
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts column decoded as unexpected type $other — " +
            "update graft.sources.Tables.events for the new fixture encoding")
    }
  }
}
