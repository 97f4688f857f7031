package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for parquet stores — the table-maintenance pass
  * every trickle-ingested store needs: thousands of per-batch files turn
  * a 100 TB scan into a listing + task-scheduling bottleneck (one task
  * per tiny file) long before I/O matters.
  *
  * Protocol: stage the rewritten files FULLY, row-count-check them, then
  * swap via two renames (same crash posture as Merge: a failure leaves
  * either the old store or the old store in a hidden `.graft-old-<tag>-`
  * sibling, never a half store). Staging/retired dirs are dot-prefixed
  * so Spark/Hadoop readers skip them — a partition compaction stages
  * INSIDE the store root, and a visible staged copy would read as a
  * bogus partition with duplicated rows. Data content is preserved
  * exactly; file layout is not (that is the point). Use [[Layout]]
  * writers instead when the rewrite should also re-order rows.
  */
object Compact {

  /** files and bytes before/after, for the caller's telemetry. */
  final case class CompactStats(
      filesBefore: Int, filesAfter: Int, bytes: Long, rows: Long)

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(spark: SparkSession, dir: Path) =
    fsOf(spark, dir).listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Exact row count from the parquet FOOTERS — driver-side metadata
    * reads, no cluster job. Both the no-op stats and the pre/post-swap
    * parity check use this: compaction must never need a full data scan
    * just to count (at 100 TB the no-op probe would otherwise cost as
    * much as the rewrite it avoids). */
  private def footerRows(
      spark: SparkSession,
      files: Array[org.apache.hadoop.fs.FileStatus]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    files.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Footer-based row count summed across several dirs — for callers
    * (e.g. StreamOps' batch-partition folds) that need the same
    * no-cluster-job parity check over a set of partition dirs. */
  private[graft] def footerRowsIn(spark: SparkSession, dirs: Seq[Path]): Long =
    dirs.map(d => footerRows(spark, dataFiles(spark, d))).sum

  /** Same footer-only count over an explicit FILE list (a commit-log
    * snapshot's files, which need no directory listing at all). */
  private[graft] def footerRowsOf(spark: SparkSession, files: Seq[Path]): Long =
    files.map(p =>
      footerRows(spark, Array(fsOf(spark, p).getFileStatus(p)))).sum

  /** Compact one flat parquet dir to ~`targetFileBytes` files. Returns the
    * stats; no-ops (and skips the rewrite entirely) when the dir already
    * has ≤ the target file count. Recovers an interrupted previous swap
    * first (see [[Swap.recoverWholeDir]]) — a crash between the swap's two
    * renames leaves the store path missing with the row-count-checked
    * rewrite fully staged, and completing the rename loses nothing. The
    * [[Swap.Hidden]] dot-prefixed sibling naming matters here: a partition
    * compaction stages INSIDE the store root, and a visible staged copy
    * would read as a bogus partition with duplicated rows. */
  def compactDir(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L << 20,
      lease: Option[Swap.Lease] = None): CompactStats = {
    val target = new Path(dir)
    val fs = fsOf(spark, target)
    // lone staging without a retired pair is unknown provenance for a
    // compaction (the store is never first-written through a stage)
    Swap.recoverWholeDir(spark, target, Swap.Hidden, allowLoneStaging = false)
    val files = dataFiles(spark, target)
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val before = footerRows(spark, files)
    if (files.length <= nOut)
      return CompactStats(files.length, files.length, bytes, before)

    val tag = Swap.newTag()
    val staging = Swap.Hidden.staging(target, tag)
    val retired = Swap.Hidden.retired(target, tag)
    // repartition, not coalesce: coalesce folds into the SCAN tasks and
    // would chain the read parallelism to nOut; repartition keeps the
    // read wide and only funnels at the write.
    spark.read.parquet(dir).repartition(nOut).write.parquet(staging.toString)
    val after = footerRows(spark, dataFiles(spark, staging))
    if (after != before) {
      fs.delete(staging, true)
      throw new IllegalStateException(
        s"compaction row mismatch for $dir: $before -> $after (store untouched)")
    }
    Swap.commitWholeDir(fs, target, staging, retired, lease)
    CompactStats(files.length, dataFiles(spark, target).length, bytes, before)
  }

  /** Compact a hive-partitioned store: each `pcol=v` dir compacts
    * independently, and ONLY dirs holding more than `maxFilesPerDir`
    * files rewrite — trickle ingest concentrates small files in hot
    * partitions, and cold partitions keep their files (and their
    * modification identity) untouched. Returns per-partition stats for
    * the dirs that were rewritten. */
  def compactStore(
      spark: SparkSession,
      storePath: String,
      pcol: String,
      targetFileBytes: Long = 128L << 20,
      maxFilesPerDir: Int = 8,
      lease: Option[Swap.Lease] = None): Map[String, CompactStats] = {
    val root = new Path(storePath)
    val fs = fsOf(spark, root)
    // A store fed only empty batches so far has no directory yet (apply()
    // skips on empty prepare); a maintenance tick then must be a no-op,
    // not a FileNotFoundException that crash-loops the stream.
    if (!fs.exists(root)) return Map.empty
    // the STORE-root lease covers every slice-dir swap below; acquire one
    // here only when the caller (e.g. Scd2.maintain) doesn't already hold it
    def run(l: Swap.Lease): Map[String, CompactStats] =
      fs.listStatus(root)
        // dot-prefixed staging/retired leftovers are invisible to Spark
        // reads and are NOT partitions — never compact (or recurse into)
        // them from here; compactDir's own recovery handles them
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(pcol + "="))
        .filter(s => dataFiles(spark, s.getPath).length > maxFilesPerDir)
        .map { s =>
          s.getPath.getName ->
            compactDir(spark, s.getPath.toString, targetFileBytes, Some(l))
        }.toMap
    lease match {
      case Some(l) => run(l)
      case None => Swap.withStoreLease(spark, root)(run)
    }
  }

  /** Compact a COMMIT-LOG-backed hive-partitioned store ([[CommitLog]]):
    * each fragmented partition rewrites into ~target-sized files and
    * commits its own manifest (removed = the partition's live files,
    * added = the compacted ones), so compaction is just another
    * optimistic writer — it runs lock-free beside ingest into OTHER
    * partitions, and a race on the SAME partition resolves to one winner
    * (the loser's ConflictException here is swallowed per partition:
    * maintenance losing to ingest is the correct outcome, the partition
    * just stays fragmented until the next tick). File liveness comes
    * from the manifest, never listStatus — a log store's dirs may hold
    * since-removed files awaiting vacuum and orphans from crashed
    * writers, and compacting THOSE back in would resurrect deleted
    * rows. */
  def compactLogStore(
      spark: SparkSession,
      storePath: String,
      pcol: String,
      targetFileBytes: Long = 128L << 20,
      maxFilesPerDir: Int = 8): Map[String, CompactStats] = {
    val root = new Path(storePath)
    val fs = fsOf(spark, root)
    val readVersion = CommitLog.currentVersion(fs, root)
    val live = CommitLog.snapshotFiles(fs, root, readVersion)
    val byDir = live.groupBy(f => f.takeWhile(_ != '/'))
      .filter { case (d, fls) => d.startsWith(pcol + "=") && fls.length > maxFilesPerDir }
    byDir.flatMap { case (dirName, rels) =>
      val files = rels.map(r => fs.getFileStatus(new Path(root, r))).toArray
      val bytes = files.map(_.getLen).sum
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      val before = footerRows(spark, files)
      if (files.length <= nOut) None
      else {
        val staging = Swap.Hidden.staging(root, Swap.newTag())
        spark.read
          .option("basePath", root.toString)
          .parquet(files.map(_.getPath.toString): _*)
          .drop(pcol) // partition col re-materializes from the dir name
          .repartition(nOut)
          .write.parquet(new Path(staging, dirName).toString)
        val after = footerRows(spark, dataFiles(spark, new Path(staging, dirName)))
        if (after != before) {
          fs.delete(staging, true)
          throw new IllegalStateException(
            s"compaction row mismatch for $storePath/$dirName: " +
              s"$before -> $after (store untouched)")
        }
        try {
          CommitLog.commitStaged(spark, root, staging, readVersion,
            Seq(dirName), wholeStore = false)
          Some(dirName -> CompactStats(files.length, nOut, bytes, before))
        } catch {
          case _: CommitLog.ConflictException => None // ingest won; next tick
        }
      }
    }
  }
}
