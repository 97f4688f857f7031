package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-style MERGE into a parquet store — the store-level form of the
  * A18 dimension-maintenance contract (DimUpsert covers the lookup+mint
  * side; this covers `MERGE INTO target USING source`): source rows whose
  * key matches an existing target row REPLACE it (whole-row update),
  * unmatched source rows are INSERTED, untouched target rows are kept.
  *
  * Write protocol: the merged result is written to a staging directory
  * next to the target, then swapped in with two FS renames — readers never
  * observe a half-written store, and a crash mid-merge leaves either the
  * old store or the new one, not a mix. (A table format with a
  * transaction log — Delta/Iceberg — would make the swap atomic under
  * concurrent writers too; single-writer parquet is the environment's
  * stand-in, mirroring how DimUpsert models the reference's SQL dim.)
  *
  * Scale notes (100 TB): the only fact-sized operations are one left-anti
  * shuffle join on the key columns and the rewrite itself. MERGE on a
  * parquet store rewrites the whole table by construction; when the store
  * is partitioned, pass `prunePartitions` so only partitions that can
  * contain a source key are rewritten (classic partition-scoped merge) —
  * everything else is untouched at the FS level.
  */
object Merge {

  /** Merge `source` into the parquet store at `targetPath` by `keyCols`.
    *
    * Source must have the target's schema (checked by field name) and at
    * most one row per key (checked — SQL MERGE raises on multiple matches
    * rather than picking one nondeterministically).
    *
    * Store modes: a store with a `_log/` dir is COMMIT-LOG backed
    * (see [[CommitLog]]) — reads pin a snapshot version, writes publish
    * manifests with optimistic concurrency, and partition-scoped merges
    * on DISJOINT partitions may run concurrently with no lock. A store
    * without one uses the legacy staged-swap + single-writer-lease
    * protocol. New stores pick the log when `log = Some(true)` or the
    * session default `spark.graft.store.commitLog` is set.
    *
    * @param prunePartitions partition column to scope the rewrite: only
    *   target partitions the merge can change — those the source writes
    *   into plus, when the partition value is not part of the key, those
    *   holding a matched key whose partition value moved — are read,
    *   merged and swapped; others are left untouched on disk. The column
    *   must be one the store was `partitionBy`'d on; NULL partition
    *   values are rejected in this mode.
    * @param evolveSchema when true, the source may carry NEW columns:
    *   they are appended to the store's schema and existing rows read
    *   back NULL for them (parquet's schema-merge semantics). Columns may
    *   only be added, never dropped — source must still contain every
    *   target column.
    * @return the merged frame (read back from the swapped-in store).
    */
  def into(
      spark: SparkSession,
      targetPath: String,
      source: DataFrame,
      keyCols: Seq[String],
      prunePartitions: Option[String] = None,
      evolveSchema: Boolean = false,
      log: Option[Boolean] = None): DataFrame = {
    require(keyCols.nonEmpty, "MERGE needs at least one key column")

    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(targetPath)
    val fs = target.getFileSystem(hconf)

    val logMode = CommitLog.isLog(fs, target) ||
      (!fs.exists(target) && log.getOrElse(CommitLog.confEnabled(spark)))

    // Legacy mode: the whole merge cycle (recover → read → stage → swap)
    // runs under the store's single-writer lease — a second concurrent
    // merge fails loudly at acquire instead of interleaving staged swaps.
    // Log mode needs neither lease nor recovery: nothing is visible until
    // the manifest CAS, and concurrent DISJOINT merges are the feature.
    def withProtocol[T](f: Option[Swap.Lease] => T): T =
      if (logMode) f(None)
      else Swap.withStoreLease(spark, target)(l => f(Some(l)))

    withProtocol { lease =>

    if (!logMode) {
      // recover any interrupted previous merge before reading the store:
      // whole-dir swap crash window (store path missing, staged copy
      // complete) and partition-scoped swap crash window (touched dirs
      // retired, staged replacements pending behind the intent marker)
      // allowLoneStaging=false: Merge's FIRST write is direct (the
      // insert-all below, no staging), so a lone staging sibling with the
      // store missing is unknown provenance — treating it as "fresh" would
      // silently rebuild from this one batch and discard whatever the
      // staging holds. Fail loudly instead (Swap's documented contract).
      Swap.recoverWholeDir(spark, target, Swap.Suffix, allowLoneStaging = false)
      if (fs.exists(target)) Swap.recoverDirs(spark, target, Swap.Suffix)
    }

    // OCC anchor: the snapshot version this merge's computation reads;
    // commitStaged checks every later commit for partition overlap
    val readVersion = if (logMode) CommitLog.currentVersion(fs, target) else 0L
    val hasData =
      if (logMode) readVersion > 0 &&
        CommitLog.snapshotFiles(fs, target, readVersion).nonEmpty
      else fs.exists(target)

    if (!hasData) {
      // nothing to match: MERGE degenerates to insert-all
      if (logMode) {
        // lay out by the prune column from the FIRST write: a mixed
        // flat+partitioned store reads ambiguously (root files have the
        // column as data, partition dirs as a path), so the layout is
        // fixed at creation and partition-scoped merges find real dirs
        val staging = Swap.Suffix.staging(target, Swap.newTag())
        val w = source.write
        prunePartitions.fold(w)(w.partitionBy(_)).parquet(staging.toString)
        CommitLog.commitStaged(spark, target, staging, readVersion,
          Nil, wholeStore = true, schema = Some(source.schema))
        return CommitLog.read(spark, target).get
      }
      // same layout rule as log mode: partition the store from its first
      // write when a prune column is declared — a later partition-scoped
      // merge against a flat store would otherwise leave a mixed layout
      // whose directory read silently drops the root-level files
      val w = source.write
      prunePartitions.fold(w)(w.partitionBy(_)).parquet(targetPath)
      return spark.read.parquet(targetPath)
    }

    // With schema evolution the store may hold files of BOTH schemas
    // (partition-scoped merges rewrite only touched partitions), so the
    // read must union footers rather than sample one — otherwise the
    // evolved columns silently vanish depending on which file Spark picks
    // for inference. mergeSchema costs one footer read per file; only
    // paid when evolution is on. Log mode pins the read to the OCC base
    // version — the plan scans exactly the snapshot the conflict check
    // covers, even if the tip moves mid-merge.
    def readStore(): DataFrame =
      if (logMode)
        CommitLog.read(spark, target, Some(readVersion), evolveSchema).get
      else if (evolveSchema)
        spark.read.option("mergeSchema", "true").parquet(targetPath)
      else spark.read.parquet(targetPath)

    val current = readStore()
    if (evolveSchema) {
      val missing = current.columns.toSet -- source.columns.toSet
      require(missing.isEmpty,
        s"schema evolution adds columns, never drops: source lacks ${missing.mkString(",")}")
    } else {
      require(current.columns.sorted.sameElements(source.columns.sorted),
        s"source schema ${source.columns.sorted.mkString(",")} != target " +
          s"schema ${current.columns.sorted.mkString(",")}")
    }

    // SQL MERGE semantics: a key matched by >1 source row is an error, not
    // a nondeterministic pick. One aggregate over the (small) source side.
    val dupKeys = source.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("graft_n")).filter(col("graft_n") > 1).limit(1).count()
    require(dupKeys == 0, s"source has multiple rows for the same key ${keyCols.mkString(",")}")

    // A store created WITHOUT a prune column holds root-level files
    // (pcol is a data column, not a path) — a partition-scoped rewrite
    // cannot retire rows from those, and a mixed flat+partitioned layout
    // is ambiguous to read (the directory scan silently drops whichever
    // shape loses partition inference). Convert with ONE whole-store
    // partitioned rewrite; subsequent merges prune normally.
    val storeIsFlat =
      if (logMode)
        CommitLog.snapshotFiles(fs, target, readVersion).exists(!_.contains('/'))
      else fs.listStatus(target).exists(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))

    prunePartitions match {
      case Some(pcol) if storeIsFlat =>
        val tag = Swap.newTag()
        val staging = Swap.Suffix.staging(target, tag)
        val merged = current
          .join(source.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(source, allowMissingColumns = evolveSchema)
        merged.write.partitionBy(pcol).parquet(staging.toString)
        if (logMode)
          CommitLog.commitStaged(spark, target, staging, readVersion,
            Nil, wholeStore = true, schema = Some(merged.schema))
        else
          Swap.commitWholeDir(fs, target, staging,
            Swap.Suffix.retired(target, tag), lease)
      case Some(pcol) =>
        // Partition-scoped merge: rewrite only partitions the merge can
        // change. Those are (a) partitions the source writes into, and —
        // unless the partition value is functionally determined by the key
        // (pcol ∈ keyCols) — (b) partitions currently holding a MATCHED
        // key whose partition value changed in the source: the old row
        // must be removed from its old partition or the key ends up
        // duplicated across partitions. (b) costs one column-pruned scan
        // of the target's (key, pcol) columns behind a semi join; values
        // collected driver-side are partition keys (few), never data rows.
        val sourceParts = source.select(pcol).distinct()
        val touchedDf =
          if (keyCols.contains(pcol)) sourceParts
          else sourceParts.union(
            current.join(
              source.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi")
              .select(pcol)).distinct()
        val touched = touchedDf.collect().map(_.get(0))
        // NULL partition values can't be addressed by isin() filters or a
        // hive-style partition path — reject them rather than miscompute.
        require(!touched.contains(null),
          s"partition-scoped merge does not support NULL values in $pcol")
        val scoped = current.filter(col(pcol).isin(touched: _*))
        // On-disk dirs currently holding touched partitions, taken from
        // the files the scan itself reads — so the path encoding (dates,
        // timestamps with escaped colons, special chars) is exactly what
        // the writer produced, never reconstructed from a value's
        // toString. Walk up from each file to the `pcol=` ancestor.
        val oldDirs: Array[org.apache.hadoop.fs.Path] = scoped
          .select(input_file_name().as("graft_f")).distinct()
          .collect().map(_.getString(0))
          .flatMap { f =>
            // input_file_name() yields the file's URI form — percent-
            // encoded (a literal "%3A" in a timestamp dir arrives as
            // "%253A") — decode via URI before treating it as an FS path
            var p = new org.apache.hadoop.fs.Path(new java.net.URI(f)).getParent
            while (p != null && !p.getName.startsWith(pcol + "=")) p = p.getParent
            Option(p)
          }
          .distinct
        // Stage the merged output FULLY before touching the target: the
        // merge plan scans the target, and an in-place overwrite would
        // race its own recompute (cache eviction / task retry mid-write
        // re-reads files the write is replacing). Write-to-staging then
        // swap partition dirs — same protocol as the unpruned branch,
        // scoped to the touched partitions. A touched partition with no
        // output rows simply has no staged dir: its old dir is retired
        // and never replaced, which also clears stale files that dynamic
        // overwrite (rewriting only partitions PRESENT in the output)
        // would leave behind.
        // Swap via the shared marker-gated protocol (Swap.commitDirs):
        // retire the old touched dirs, then move staged dirs in. Not
        // atomic across partitions (parquet has no transaction log), but
        // once the intent marker lands a crash ROLLS FORWARD on the next
        // merge; before it, the target is untouched. The staged dir name
        // is the writer's own encoding of the partition value, so the
        // leftover handling inside commitDirs (zero-row dirs the row
        // scan missed) name-matches exactly.
        val tag = Swap.newTag()
        val staging = Swap.Suffix.staging(target, tag)
        val retired = Swap.Suffix.retired(target, tag)
        val merged = scoped
          .join(source.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(source, allowMissingColumns = evolveSchema)
        merged.write.partitionBy(pcol).parquet(staging.toString)
        if (logMode)
          CommitLog.commitStaged(spark, target, staging, readVersion,
            oldDirs.map(_.getName).toSeq, wholeStore = false,
            schema = Some(merged.schema))
        else
          Swap.commitDirs(fs, target, staging, retired,
            oldDirs.map(_.getName).toSeq, lease)
      case None =>
        val tag = Swap.newTag()
        val staging = Swap.Suffix.staging(target, tag)
        val retired = Swap.Suffix.retired(target, tag)
        val merged = current
          .join(source.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(source, allowMissingColumns = evolveSchema)
        merged.write.parquet(staging.toString)
        if (logMode)
          CommitLog.commitStaged(spark, target, staging, readVersion,
            Nil, wholeStore = true, schema = Some(merged.schema))
        else
          Swap.commitWholeDir(fs, target, staging, retired, lease)
    }
    if (logMode) CommitLog.read(spark, target, mergeSchema = evolveSchema).get
    else readStore()
    }
  }
}
