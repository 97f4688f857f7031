package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-grain CHANGE DATA FEED over a commit-log store — the Delta
  * "change data feed" / Iceberg "changelog scan" counterpart: ask a
  * versioned store "what changed between version A and version B" and get
  * one row per inserted / updated / deleted key per version, without
  * replaying full snapshots.
  *
  * How a commit's row-level delta is recovered: the manifest already
  * records exactly which files the commit added and which it logically
  * removed, and data files are immutable — so the rows that changed at
  * version v are fully contained in `added(v) ∪ removed(v)`. The feed
  * reads ONLY those files and diffs them keyed ([[SnapshotDiff]]): rows
  * carried over by a partition rewrite appear identically on both sides
  * and cancel out; what remains is the true row-level change set. This is
  * the "compute CDC from the file diff" strategy production table formats
  * use when no explicit change files were written.
  *
  * Scale notes (100 TB): cost per version is O(files touched by that
  * commit), never O(table) — a partition-scoped merge that rewrote one of
  * 10k partitions feeds one partition's files into the diff. The diff
  * itself is one key-shuffle join per version, output is change-sized.
  * Version windows are bounded by the caller; each version's diff is an
  * independent job (no cross-version state).
  *
  * Retention contract: the feed reads files that may be logically removed
  * at the tip, which is exactly why [[CommitLog.vacuum]] defers physical
  * deletion — a feed window must lie within the vacuum retention horizon,
  * same as any time-travel read.
  */
object ChangeFeed {

  val VersionCol = "graft_version"
  val ChangeCol = "change_type"

  /** Changes per version in `(fromVersion, toVersion]`, keyed by
    * `keyCols`: `graft_version`, the key, the non-key attributes (NEW
    * values for insert/update, OLD values for delete) and `change_type`
    * ∈ insert/update/delete. Unchanged carried-over rows emit nothing.
    *
    * Schema evolution inside the window is handled per version: the side
    * written before an evolution is null-extended to the evolved shape
    * before the diff (evolution is add-only), and the union across
    * versions aligns to the widest schema.
    */
  def between(
      spark: SparkSession,
      store: Path,
      fromVersion: Long,
      toVersion: Long,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "change feed needs key columns")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tip = CommitLog.currentVersion(fs, store)
    require(fromVersion >= 0 && toVersion <= tip && fromVersion <= toVersion,
      s"version window ($fromVersion, $toVersion] outside store history 0..$tip")

    val perVersion: Seq[DataFrame] =
      ((fromVersion + 1) to toVersion).flatMap { v =>
        val m = CommitLog.readManifest(fs, store, v)
        val oldDf = CommitLog.readFilesAt(spark, store, v - 1, m.removed)
        val newDf = CommitLog.readFilesAt(spark, store, v, m.added)
        diffSides(spark, oldDf, newDf, keyCols)
          .map(_.withColumn(VersionCol, lit(v)))
      }

    perVersion match {
      case Seq() =>
        // empty window: an empty frame with the key + change columns so
        // callers can union/write it without special-casing
        val schema = org.apache.spark.sql.types.StructType(
          keyCols.map(k => org.apache.spark.sql.types.StructField(
            k, org.apache.spark.sql.types.StringType)) :+
            org.apache.spark.sql.types.StructField(
              ChangeCol, org.apache.spark.sql.types.StringType) :+
            org.apache.spark.sql.types.StructField(
              VersionCol, org.apache.spark.sql.types.LongType))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case ds => ds.reduce(_.unionByName(_, allowMissingColumns = true))
    }
  }

  /** Changes since `fromVersion` up to the current tip, plus the tip
    * version itself — the incremental-consumer loop: persist the returned
    * tip, pass it back as `fromVersion` next poll. */
  def since(
      spark: SparkSession,
      store: Path,
      fromVersion: Long,
      keyCols: Seq[String]): (DataFrame, Long) = {
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tip = CommitLog.currentVersion(fs, store)
    (between(spark, store, fromVersion, tip, keyCols), tip)
  }

  /** One version's diff. A commit with only adds (first load, append) is
    * all inserts; only removes (pure delete / retire) all deletes; both
    * sides → keyed diff with carried rows cancelling. */
  private def diffSides(
      spark: SparkSession,
      oldDf: Option[DataFrame],
      newDf: Option[DataFrame],
      keyCols: Seq[String]): Option[DataFrame] = (oldDf, newDf) match {
    case (None, None) => None
    case (None, Some(n)) => Some(n.withColumn(ChangeCol, lit("insert")))
    case (Some(o), None) => Some(o.withColumn(ChangeCol, lit("delete")))
    case (Some(o), Some(n)) =>
      // evolution is add-only: null-extend the narrower side to the other
      val aligned = alignTo(o, n)
      Some(SnapshotDiff.diff(aligned._1, aligned._2, keyCols))
  }

  /** Null-extend each frame with the columns only the other has (typed
    * from that other side), so SnapshotDiff's equal-schema contract holds
    * across an in-window schema evolution. */
  private def alignTo(a: DataFrame, b: DataFrame): (DataFrame, DataFrame) = {
    def extend(x: DataFrame, donor: DataFrame): DataFrame = {
      val have = x.columns.toSet
      donor.schema.fields.filterNot(f => have.contains(f.name)).foldLeft(x) {
        (acc, f) => acc.withColumn(f.name, lit(null).cast(f.dataType))
      }
    }
    (extend(a, b), extend(b, a))
  }
}
