package graft.flow

import org.apache.spark.sql.DataFrame

/** Sink stages — DataflowEx A15 `DbBulkInserter` / A17 `MultiDbBulkInserter`
  * parity (SURVEY.md §2.1).
  *
  * The reference batches rows (BatchBlock) and bulk-loads into SQL Server,
  * optionally sharding across target databases by a profile function.
  * Spark-natively bulk loading IS the writer path (columnar parquet/orc
  * commit protocol), JDBC batching is an option, and sharding is
  * `partitionBy` — files fan out by key with no driver-side key table.
  *
  * Scale notes: writers run one task per partition — repartition to size
  * output files (~128 MB–1 GB each at 100 TB; thousands of tiny files is
  * the classic failure). `sortWithinPartitions` before write gives
  * run-length-friendly parquet encodings on low-cardinality columns.
  */
object Sinks {

  /** Bulk columnar sink (the DbBulkInserter analog in this environment). */
  def parquet(df: DataFrame, path: String, mode: String = "overwrite",
      targetPartitions: Option[Int] = None): Unit =
    targetPartitions.fold(df)(df.repartition(_)).write.mode(mode).parquet(path)

  def orc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  def csv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** A17 sharded sink: one directory per key value (`k=v/part-*.parquet`).
    * The sharding "profile function" is any Column — materialize it first
    * if derived. */
  def partitionedParquet(df: DataFrame, path: String, shardCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(shardCols: _*).parquet(path)

  /** Bucketed table sink: pre-shuffles data into `buckets` hash buckets on
    * `bucketCols` so later equi-joins and aggregations on those keys read
    * co-located buckets and skip the shuffle entirely — the 100 TB answer
    * to "this fact-fact join shuffles 100 TB every run": pay the shuffle
    * once at write time. Requires a table catalog (`saveAsTable`). */
  def bucketedTable(df: DataFrame, table: String, buckets: Int, bucketCols: String*): Unit = {
    require(bucketCols.nonEmpty, "bucketedTable needs at least one bucket column")
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** A15 JDBC bulk sink: batched inserts (`batchsize` ≙ BatchBlock size,
    * `maxConnections` caps concurrent connections, one per partition).
    * Round-trip-tested against embedded Derby (JdbcSpec). */
  def jdbc(df: DataFrame, url: String, table: String, batchSize: Int = 10000,
      maxConnections: Int = 8, mode: String = "append",
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.coalesce(maxConnections)
      .write.mode(mode)
      .option("batchsize", batchSize)
      .jdbc(url, table, props)
}
