package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the co-located-join primitive: write both
  * sides bucketed (and sorted) on the join key ONCE, and every
  * subsequent equi-join between them plans with NO exchange on either
  * side (the bucketed scan already reports the right hash
  * distribution) and no sort for the merge. At 100 TB this converts
  * the recurring fact⋈fact shuffle — the single most expensive step in
  * a repeated pipeline — into a one-time layout cost, exactly the same
  * trade the commit-log store makes for scans.
  *
  * Both sides MUST use the same bucket count and key order; Spark only
  * co-locates identical bucketings (it will not align 8 vs 16 buckets).
  * Bucket counts should be sized so one bucket of the LARGER table fits
  * an executor core's working set (buckets = parallelism grain for
  * every downstream join).
  *
  * Tables register in the session catalog with their files at an
  * explicit `path` (external), so no state lands in a global warehouse
  * and the data outlives the catalog entry.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted table at `path`. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      buckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty && buckets > 0)
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketing tables. The plan contract (asserted in
    * BucketingSpec): zero `Exchange` on the join inputs — the scans'
    * bucket distribution satisfies the join's requirement. */
  def colocatedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)
}
