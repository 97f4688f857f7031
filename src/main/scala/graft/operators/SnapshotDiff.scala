package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff (table-level change data capture): compare two keyed
  * snapshots of the same table and emit one row per changed key with its
  * change type — `insert` (key only in the new snapshot), `delete` (only
  * in the old), `update` (present in both, any non-key attribute differs
  * null-safely). Unchanged keys emit nothing.
  *
  * The read side of the store operators (Merge writes changes in;
  * SnapshotDiff reads changes back out) — feeding downstream incremental
  * consumers without replaying full snapshots.
  *
  * Scale notes: one full-outer shuffle join on the key — the minimum any
  * diff must pay; attribute comparison is a narrow projection. Output is
  * change-sized, not snapshot-sized.
  */
object SnapshotDiff {

  /** @return `keyCols* , change_type` (+ the NEW snapshot's attribute
    *         values for inserts/updates, the OLD ones for deletes). */
  def diff(old: DataFrame, neu: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(old.columns.sorted.sameElements(neu.columns.sorted),
      s"snapshot schemas differ: ${old.columns.sorted.mkString(",")} vs " +
        s"${neu.columns.sorted.mkString(",")}")
    val attrCols = old.columns.filterNot(keyCols.contains).toSeq

    val o = old.as("o")
    val n = neu.as("n")
    val joinCond = keyCols.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val changed =
      if (attrCols.isEmpty) lit(false)
      else attrCols.map(a => !(col(s"o.$a") <=> col(s"n.$a"))).reduce(_ || _)
    // presence flags: a key column can legitimately be NULL, so presence
    // is decided by a per-side marker, not by key nullness
    val joined = o.withColumn("graft_o", lit(true))
      .join(n.withColumn("graft_n", lit(true)), joinCond, "full_outer")

    val changeType = when(col("graft_o").isNull, lit("insert"))
      .when(col("graft_n").isNull, lit("delete"))
      .when(changed, lit("update"))
    val keyOut = keyCols.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k))
    val attrOut = attrCols.map(a =>
      when(col("graft_o").isNull || col("graft_n").isNotNull, col(s"n.$a"))
        .otherwise(col(s"o.$a")).as(a))
    joined
      .withColumn("change_type", changeType)
      .filter(col("change_type").isNotNull)
      .select(keyOut ++ attrOut :+ col("change_type"): _*)
  }
}
