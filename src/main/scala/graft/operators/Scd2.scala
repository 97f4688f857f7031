package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance: the history-keeping form
  * of the A18 dimension contract (DimUpsert keeps only current rows; SCD2
  * keeps every version with a validity interval).
  *
  * Store schema = natural key + attribute columns + bookkeeping:
  * `valid_from` (timestamp this version took effect), `valid_to` (NULL =
  * open/current), `is_current`. Applying a batch:
  *  - a key whose attributes CHANGED closes the current version
  *    (`valid_to` = batch time) and appends a new open one;
  *  - an unchanged key is untouched (no version churn);
  *  - a brand-new key appends its first open version;
  *  - keys absent from the batch are untouched (batches are deltas).
  *
  * Scale notes: attribute comparison happens on the CURRENT slice only
  * (`is_current`), joined on the natural key — dimension-sized, not
  * fact-sized. History rows (`is_current = false`) pass through
  * untouched; the store rewrite reuses Merge's staged-swap protocol shape
  * (write staging fully, then swap) so readers never see a half-applied
  * batch.
  */
object Scd2 {

  /** Apply one delta batch to the SCD2 store at `path`. `batchTs` is the
    * effectivity timestamp ("yyyy-MM-dd HH:mm:ss"); passing it explicitly
    * (not now()) keeps replays deterministic.
    * @return the updated store, read back. */
  def apply(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      keyCol: String,
      batchTs: String): DataFrame = {
    val attrCols = batch.columns.filterNot(_ == keyCol).toSeq
    require(attrCols.nonEmpty, "SCD2 needs at least one attribute column")
    // one version per key per batch — same multi-match rule as SQL MERGE
    val dup = batch.groupBy(keyCol).agg(count(lit(1)).as("graft_n"))
      .filter(col("graft_n") > 1).limit(1).count()
    require(dup == 0, s"batch has multiple rows for the same $keyCol")
    val ts = to_timestamp(lit(batchTs))
    val asVersion = batch
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))

    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(target)) {
      asVersion.write.parquet(path)
      return spark.read.parquet(path)
    }

    val store = spark.read.parquet(path)
    val current = store.filter(col("is_current"))
    val history = store.filter(!col("is_current"))

    // attribute-change detection on the current slice: null-safe equality
    // per attribute (a NULL→value or value→NULL flip IS a change)
    val changedPred = attrCols
      .map(a => !(col(s"cur.$a") <=> col(s"b.$a")))
      .reduce(_ || _)
    val joined = current.as("cur")
      .join(batch.as("b"), col(s"cur.$keyCol") === col(s"b.$keyCol"), "left")
    // current versions to CLOSE: matched by the batch with changed attrs
    val closed = joined
      .filter(col(s"b.$keyCol").isNotNull && changedPred)
      .select(col("cur.*"))
      .withColumn("valid_to", ts)
      .withColumn("is_current", lit(false))
    // current versions kept open: unmatched, or matched-but-unchanged
    val keptOpen = joined
      .filter(col(s"b.$keyCol").isNull || !changedPred)
      .select(col("cur.*"))
    // batch rows that open a NEW version: new keys, or changed keys
    val changedKeys = closed.select(col(keyCol))
    val newVersions = asVersion.join(
      current.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(asVersion.join(changedKeys, Seq(keyCol), "left_semi"))

    val updated = history
      .unionByName(closed)
      .unionByName(keptOpen)
      .unionByName(newVersions)

    // staged write + swap (Merge's protocol): never overwrite the store
    // while the plan that produced `updated` still scans it
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val staging = new org.apache.hadoop.fs.Path(path + ".staging-" + tag)
    val retired = new org.apache.hadoop.fs.Path(path + ".old-" + tag)
    updated.write.parquet(staging.toString)
    if (!fs.rename(target, retired)) {
      fs.delete(staging, true)
      throw new java.io.IOException(s"could not retire $target")
    }
    if (!fs.rename(staging, target)) {
      fs.rename(retired, target)
      throw new java.io.IOException(s"could not swap $staging into place")
    }
    fs.delete(retired, true)
    spark.read.parquet(path)
  }

  /** Point-in-time lookup: the version of each key valid at `asOf`. */
  def asOf(store: DataFrame, asOfTs: String): DataFrame = {
    val ts = to_timestamp(lit(asOfTs))
    store.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
  }
}
