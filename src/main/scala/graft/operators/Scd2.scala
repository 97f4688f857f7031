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
  * Key matching is NULL-SAFE (`<=>`): a NULL natural key — dubious but
  * possible in source data — is ONE key value, matched and versioned like
  * any other; with plain `=` it would never match itself and every batch
  * would append another open version for it.
  *
  * Scale notes: attribute comparison happens on the CURRENT slice only
  * (`is_current`), joined on the natural key — dimension-sized, not
  * fact-sized. The store is laid out in SLICES (hive partitions on a
  * synthetic column): `open` holds all current versions; `c<yyyy-MM>`
  * holds the versions CLOSED in that month. A batch rewrites exactly two
  * slice dirs — `open` and the batch month's closed slice — with Merge's
  * staged-write + dir-swap protocol; a 100 TB-era dimension's history
  * accumulated over years is untouched on disk by a trickle batch, and
  * never even scanned (the read is partition-pruned to the two touched
  * slices).
  */
object Scd2 {

  /** Synthetic hive-partition column carrying the slice a version lives
    * in. Present only on disk / raw reads; [[apply]] and [[read]] return
    * the logical schema without it. */
  val SliceCol = "graft_slice"
  private[graft] val OpenSlice = "open"
  /** Closed-version slice for a batch timestamp: its calendar month. */
  private def closedSlice(batchTs: String): String = "c" + batchTs.substring(0, 7)

  /** Recover an interrupted store rewrite before any read or write: the
    * legacy-layout migration uses the whole-dir swap (crash window =
    * store path missing, staged copy complete) and every batch apply
    * uses the marker-gated partition-dir swap (crash window = hot slice
    * dirs retired, staged replacements not yet moved in). Without this,
    * a crash mid-swap leaves the store with NO open slice and the next
    * apply() silently reopens every key as new — corruption, not an
    * error. After recovery, a sliced store that still lacks an open
    * slice has unknown provenance: fail loudly. */
  def recover(spark: SparkSession, path: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = Swap.fsOf(spark, target)
    // log-backed stores have no swap crash states to recover: nothing is
    // visible until a manifest CAS, so every on-disk snapshot is complete
    if (CommitLog.isLog(fs, target)) return
    // allowLoneStaging=false: SCD2's FIRST write is direct (apply writes
    // the initial sliced store without staging), so a lone staging with
    // the store missing is unknown provenance, not a fresh store.
    Swap.recoverWholeDir(spark, target, Swap.Suffix, allowLoneStaging = false)
    if (!fs.exists(target)) return
    Swap.recoverDirs(spark, target, Swap.Suffix)
    // maintain() compacts SLICE dirs via the Hidden-naming whole-dir
    // swap (staging sits INSIDE the store root); a crash between its two
    // renames leaves that slice dir missing with `.graft-staging-…` /
    // `.graft-old-…` siblings. Roll those forward here too — otherwise a
    // mechanically recoverable store fails the open-slice check below
    // and bricks the stream until manual repair (maintain() itself calls
    // recover() first, so it could never reach Compact's own recovery).
    // ONE listing serves both this scan and the slice check below;
    // re-list only when recovery actually acted on a slice dir.
    val listed = fs.listStatus(target)
    val recoveredSlices = listed.map(_.getPath.getName)
      .flatMap(Swap.Hidden.parse(_).map(_._2))
      .distinct
      .filter(_.startsWith(SliceCol + "="))
    recoveredSlices.foreach { sliceName =>
      Swap.recoverWholeDir(spark, new org.apache.hadoop.fs.Path(target, sliceName),
        Swap.Hidden, allowLoneStaging = false)
    }
    val slices = (if (recoveredSlices.nonEmpty) fs.listStatus(target) else listed)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(SliceCol + "="))
      .map(_.getPath.getName)
    if (slices.nonEmpty && !slices.contains(SliceCol + "=" + OpenSlice))
      throw new IllegalStateException(
        s"SCD2 store $path has closed slices [${slices.mkString(",")}] but no " +
          s"$SliceCol=$OpenSlice dir and no recoverable swap leftovers — " +
          "current versions are missing; restore the store manually")
  }

  /** The raw sliced store — commit-log snapshot when the store is
    * log-backed (crash-safe by construction, no recovery pass), legacy
    * recovered-directory read otherwise. */
  private def readSliced(spark: SparkSession, path: String): DataFrame = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = Swap.fsOf(spark, target)
    if (CommitLog.isLog(fs, target))
      CommitLog.read(spark, target).getOrElse(
        throw new IllegalStateException(s"SCD2 log store $path is empty"))
    else {
      recover(spark, path)
      spark.read.parquet(path)
    }
  }

  /** The store with the slice column dropped — the logical SCD2 table. */
  def read(spark: SparkSession, path: String): DataFrame =
    readSliced(spark, path).drop(SliceCol)

  /** Apply one delta batch to the SCD2 store at `path`. `batchTs` is the
    * effectivity timestamp ("yyyy-MM-dd HH:mm:ss"); passing it explicitly
    * (not now()) keeps replays deterministic.
    * @return the updated store, read back. */
  def apply(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      keyCol: String,
      batchTs: String,
      log: Option[Boolean] = None): DataFrame = {
    val attrCols = batch.columns.filterNot(_ == keyCol).toSeq
    require(attrCols.nonEmpty, "SCD2 needs at least one attribute column")
    require(!batch.columns.contains(SliceCol),
      s"$SliceCol is reserved for the store layout")
    // one version per key per batch — same multi-match rule as SQL MERGE.
    // groupBy buckets NULL keys together, so duplicate NULLs are caught too.
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
    val logMode = CommitLog.isLog(fs, target) ||
      (!fs.exists(target) && log.getOrElse(CommitLog.confEnabled(spark)))
    // Legacy mode: the whole cycle (recover → read → stage → swap) runs
    // under the store's single-writer lease: a second concurrent apply
    // fails at acquire instead of staging against a store the first is
    // rewriting. Log mode: optimistic concurrency on the two touched
    // slice dirs — two applies race on `open` by construction, so one
    // wins and the other gets a ConflictException to re-run; what the
    // log buys SCD2 is lock-free coexistence with readers (snapshot
    // pinning) and with maintenance on disjoint slices.
    def withProtocol[T](f: Option[Swap.Lease] => T): T =
      if (logMode) f(None)
      else Swap.withStoreLease(spark, target)(l => f(Some(l)))
    withProtocol { lease =>
    if (!logMode) recover(spark, path)
    val readVersion = if (logMode) CommitLog.currentVersion(fs, target) else 0L
    val hasData =
      if (logMode) readVersion > 0 &&
        CommitLog.snapshotFiles(fs, target, readVersion).nonEmpty
      else fs.exists(target)
    if (!hasData) {
      val first = asVersion.withColumn(SliceCol, lit(OpenSlice))
      if (logMode) {
        val staging = Swap.Suffix.staging(target, Swap.newTag())
        first.write.partitionBy(SliceCol).parquet(staging.toString)
        CommitLog.commitStaged(spark, target, staging, readVersion,
          Nil, wholeStore = true)
      } else first.write.partitionBy(SliceCol).parquet(path)
      return read(spark, path)
    }
    if (!logMode) lease.foreach(migrateLegacyLayout(spark, fs, path, _))

    val slice = closedSlice(batchTs)
    val store =
      if (logMode) CommitLog.read(spark, target, Some(readVersion)).get
      else spark.read.parquet(path)
    // partition-pruned reads: only the open slice (current versions) and
    // this month's closed slice are ever scanned; other history slices
    // stay cold
    val current = store.filter(col(SliceCol) === OpenSlice).drop(SliceCol)
    val sliceRows = store.filter(col(SliceCol) === slice).drop(SliceCol)

    // attribute-change detection on the current slice: null-safe equality
    // per attribute (a NULL→value or value→NULL flip IS a change)
    val changedPred = attrCols
      .map(a => !(col(s"cur.$a") <=> col(s"b.$a")))
      .reduce(_ || _)
    // graft_matched (never NULL on the batch side) tells matched from
    // unmatched — `b.key IS NOT NULL` can't, now that NULL is a valid key
    val joined = current.as("cur")
      .join(batch.withColumn("graft_matched", lit(true)).as("b"),
        col(s"cur.$keyCol") <=> col(s"b.$keyCol"), "left")
    val matched = col("graft_matched").isNotNull
    // current versions to CLOSE: matched by the batch with changed attrs
    val closed = joined
      .filter(matched && changedPred)
      .select(col("cur.*"))
      .withColumn("valid_to", ts)
      .withColumn("is_current", lit(false))
    // current versions kept open: unmatched, or matched-but-unchanged
    val keptOpen = joined
      .filter(!matched || !changedPred)
      .select(col("cur.*"))
    // batch rows that open a NEW version: new keys, or changed keys
    val changedKeys = closed.select(col(keyCol).as("graft_k"))
    val currentKeys = current.select(col(keyCol).as("graft_k"))
    val newVersions = asVersion
      .join(currentKeys, col(keyCol) <=> col("graft_k"), "left_anti")
      .unionByName(
        asVersion.join(changedKeys, col(keyCol) <=> col("graft_k"), "left_semi"))

    val updated = sliceRows.unionByName(closed)
      .withColumn(SliceCol, lit(slice))
      .unionByName(
        keptOpen.unionByName(newVersions).withColumn(SliceCol, lit(OpenSlice)))

    // staged write, then commit: log mode publishes a manifest retiring
    // the two touched slice dirs' files (OCC-checked against commits
    // since readVersion); legacy mode swaps the dirs behind the intent
    // marker (once it lands, any crash rolls FORWARD via recover();
    // before it, the store is untouched and a half staging is discarded).
    val tag = Swap.newTag()
    val staging = Swap.Suffix.staging(target, tag)
    val retired = Swap.Suffix.retired(target, tag)
    val touchedSlices = Seq(OpenSlice, slice).distinct.map(SliceCol + "=" + _)
    updated.write.partitionBy(SliceCol).parquet(staging.toString)
    if (logMode) {
      CommitLog.commitStaged(spark, target, staging, readVersion,
        touchedSlices, wholeStore = false)
      CommitLog.read(spark, target).get.drop(SliceCol)
    } else {
      Swap.commitDirs(fs, target, staging, retired, touchedSlices, lease)
      // not read(): recovery already ran at entry and the swap just
      // committed — re-running it would pay two more store listings plus a
      // parent-dir sibling scan on EVERY trickle batch for nothing
      spark.read.parquet(path).drop(SliceCol)
    }
    }
  }

  /** One-time migration of a store written before the sliced layout
    * (flat parquet, no `graft_slice=` dirs): derive each row's slice and
    * rewrite once with the staged-swap protocol. */
  private def migrateLegacyLayout(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      path: String,
      lease: Swap.Lease): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val sliced = fs.listStatus(target)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith(SliceCol + "="))
    if (sliced) return
    val legacy = spark.read.parquet(path)
    // a non-current version with NULL valid_to would land in the hive
    // default partition, which asOfStore's slice pruning silently drops
    // from every point-in-time read — reject the malformed store instead
    val malformed = legacy
      .filter(!col("is_current") && col("valid_to").isNull).limit(1).count()
    require(malformed == 0,
      s"legacy SCD2 store $path has closed versions with NULL valid_to — " +
        "cannot derive their slice; repair the store before migrating")
    val withSlice = legacy.withColumn(SliceCol,
      when(col("is_current"), lit(OpenSlice))
        .otherwise(concat(lit("c"), date_format(col("valid_to"), "yyyy-MM"))))
    val tag = Swap.newTag()
    val staging = Swap.Suffix.staging(target, tag)
    val retired = Swap.Suffix.retired(target, tag)
    withSlice.write.partitionBy(SliceCol).parquet(staging.toString)
    Swap.commitWholeDir(fs, target, staging, retired, Some(lease))
  }

  /** Table maintenance: compact slice dirs that trickle batches have
    * fragmented. Every apply() stages a fresh rewrite of the open slice
    * plus this month's closed slice, so a store fed one small batch at a
    * time accumulates small files in exactly those hot dirs — the
    * listing/task-scheduling small-file failure mode Compact exists for.
    * Cold month slices keep their files untouched (Compact skips dirs at
    * or under `maxFilesPerDir`). Content-preserving, crash-safe (each
    * slice dir swaps whole via the row-count-checked staged swap), and
    * safe to run between batches of a live scd2Stream — single-writer
    * per store, like every parquet store here. */
  def maintain(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L << 20,
      maxFilesPerDir: Int = 8): Map[String, Compact.CompactStats] = {
    val target = new org.apache.hadoop.fs.Path(path)
    if (CommitLog.isLog(Swap.fsOf(spark, target), target))
      // per-slice manifest commits; OCC lets maintenance run beside
      // writers on other slices and lose politely on the hot ones
      Compact.compactLogStore(spark, path, SliceCol, targetFileBytes, maxFilesPerDir)
    else Swap.withStoreLease(spark, target) { lease =>
      recover(spark, path)
      Compact.compactStore(
        spark, path, SliceCol, targetFileBytes, maxFilesPerDir, Some(lease))
    }
  }

  /** Point-in-time lookup: the version of each key valid at `asOf`. */
  def asOf(store: DataFrame, asOfTs: String): DataFrame = {
    val ts = to_timestamp(lit(asOfTs))
    store.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
  }

  /** Point-in-time lookup straight off the sliced store, partition-pruned:
    * a version valid at T is either open, or closed AFTER T — i.e. lives
    * in a `c<yyyy-MM>` slice with month ≥ month(T) (slice names are
    * zero-padded, so the lexicographic string comparison on the partition
    * column prunes at planning time). History closed before T's month —
    * the bulk of a years-old dimension — is never scanned. */
  def asOfStore(spark: SparkSession, path: String, asOfTs: String): DataFrame = {
    val pruned = readSliced(spark, path)
      .filter(col(SliceCol) === OpenSlice ||
        col(SliceCol) >= lit(closedSlice(asOfTs)))
      .drop(SliceCol)
    asOf(pruned, asOfTs)
  }
}
