package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose time
  * key is <= the left row's (per equi-key). The classic point-in-time
  * lookup (trades→quotes, events→latest-config).
  *
  * Spark has no native as-of join; the scalable formulation is
  * union + last_value window (no range self-join, no N² pairs):
  * tag both sides, union on (key, time), and carry the most recent right
  * payload forward with `last(ignoreNulls)` over rows-unbounded-preceding.
  * One shuffle on the equi key + one in-partition sort — the same cost
  * as a sort-merge join, and skew-safe under AQE.
  *
  * Ties (left.ts == right.ts): the right row sorts first (tag 0 < 1), so
  * an exactly-simultaneous right row IS visible to the left row — matching
  * DuckDB's ASOF JOIN (>=) semantics.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `valueCols` get attached)
    * @param keyCols   equi keys present on both sides
    * @param leftTs    left time column name
    * @param rightTs   right time column name
    * @param valueCols right columns to carry (null when no prior right row)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {

    val leftOnly = left.columns.toSeq.filterNot(keyCols.contains)
    require(valueCols.intersect(left.columns.toSeq).isEmpty,
      "valueCols must not collide with left columns")
    val ts = "graft_ts"
    val side = "graft_side"       // 0 = right (sorts first on tie), 1 = left
    val payload = "graft_payload" // ALL right values packed in one struct

    // The right payload travels as a single non-null struct so that
    // (a) last(_, ignoreNulls) skips only missing rows, never a present
    // row whose value column is legitimately NULL, and (b) with several
    // valueCols every attached value comes from the SAME right row.
    val payloadType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lAligned = left.select(
      keyCols.map(col) ++ leftOnly.map(col) :+
        lit(null).cast(payloadType).as(payload) :+
        col(leftTs).as(ts) :+ lit(1).as(side): _*)
    val rAligned = right.select(
      keyCols.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as(payload) :+
        col(rightTs).as(ts) :+ lit(0).as(side): _*)

    // payload as the final sort key makes ties on (key, ts) between right
    // rows deterministic (struct ordering compares field by field) —
    // without it, last() picks a partitioning-dependent peer
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc, col(payload).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lAligned.unionByName(rAligned)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))

    valueCols.foldLeft(carried.filter(col(side) === 1)) { (df, c) =>
        df.withColumn(c, col(s"$payload.$c"))
      }
      .drop(ts, side, payload)
  }

  /** Same semantics on the CUSTOM physical operator (AsOfJoinExec: logical
    * node + planner strategy + streaming per-partition merge — SURVEY §4.3
    * tier (c)). One O(|L|+|R|) pass after the planned exchanges/sorts, no
    * union materialization, one retained right row per key. Prefer this
    * form when the left side carries wide rows (the window form unions
    * right-shaped nulls into every left row). */
  def asofMerge(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame =
    org.apache.spark.sql.graft.AsOfJoinApi.asof(
      left, right, keyCols, leftTs, rightTs, valueCols)
}
