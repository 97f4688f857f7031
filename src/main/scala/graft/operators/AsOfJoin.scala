package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the right row nearest in time
  * (per equi-key) in the requested direction — `backward` (latest right
  * with ts ≤ left's; the classic trades→quotes point-in-time lookup),
  * `forward` (earliest right with ts ≥ left's; next-scheduled-event
  * lookups), or `nearest` (whichever of the two is closer; ties go
  * backward). The same direction surface DuckDB's ASOF JOIN and pandas
  * `merge_asof` expose.
  *
  * Spark has no native as-of join; the scalable formulation is
  * union + last_value window (no range self-join, no N² pairs):
  * tag both sides, union on (key, time), and carry the most recent right
  * payload forward with `last(ignoreNulls)` over rows-unbounded-preceding
  * (forward = the identical scan with time order reversed). One shuffle
  * on the equi key + one in-partition sort per direction — the same cost
  * as a sort-merge join, and skew-safe under AQE. `nearest` runs both
  * scans over ONE shuffled union (two Window sorts, one exchange) and
  * picks per row by absolute distance.
  *
  * Ties (left.ts == right.ts): the right row sorts first (tag 0 < 1), so
  * an exactly-simultaneous right row IS visible to the left row — matching
  * DuckDB's ASOF JOIN (>= / <=) semantics in both directions.
  */
object AsOfJoin {

  private val ts = "graft_ts"
  private val side = "graft_side"       // 0 = right (sorts first on tie), 1 = left
  private val payload = "graft_payload" // ALL right values packed in one struct

  /** Union frame both scans run over: left rows with a null payload,
    * right rows with (matched-ts, values...) packed in one struct so that
    * (a) last(_, ignoreNulls) skips only missing rows, never a present
    * row whose value column is legitimately NULL, and (b) with several
    * valueCols every attached value comes from the SAME right row. The
    * matched ts rides in the struct so `nearest` can compare distances. */
  private def unioned(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    val leftOnly = left.columns.toSeq.filterNot(keyCols.contains)
    require(valueCols.intersect(left.columns.toSeq).isEmpty,
      "valueCols must not collide with left columns")
    val payloadType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("graft_mts",
        right.schema(rightTs).dataType) +:
      valueCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lAligned = left.select(
      keyCols.map(col) ++ leftOnly.map(col) :+
        lit(null).cast(payloadType).as(payload) :+
        col(leftTs).as(ts) :+ lit(1).as(side): _*)
    val rAligned = right.select(
      keyCols.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTs).as("graft_mts") +: valueCols.map(col): _*).as(payload) :+
        col(rightTs).as(ts) :+ lit(0).as(side): _*)
    lAligned.unionByName(rAligned)
  }

  /** Carry window for one direction. Backward scans time ascending;
    * forward scans descending, so "last seen" is the nearest FUTURE row.
    * In both, the right row sorts before the left at equal ts (side 0<1:
    * simultaneous rows match), and the payload as the final sort key
    * makes ties between equal-ts right rows deterministic (struct
    * ordering compares field by field) — without it, last() picks a
    * partitioning-dependent peer. */
  private def carryWindow(keyCols: Seq[String], forward: Boolean) =
    Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((if (forward) col(ts).desc else col(ts).asc) +:
        col(side).asc +: Seq(col(payload).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** @param left      probe side
    * @param right     reference side (its `valueCols` get attached)
    * @param keyCols   equi keys present on both sides
    * @param leftTs    left time column name
    * @param rightTs   right time column name
    * @param valueCols right columns to carry (null when no match in the
    *                  direction)
    * @param direction "backward" (default), "forward", or "nearest"
    * @param tolerance max |left.ts − matched.ts| in SECONDS (epoch-seconds
    *                  axis; identity for numeric ts) — matches farther away
    *                  attach as NULL, pandas merge_asof's `tolerance`.
    *                  None (default) = unbounded.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Double] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction '$direction'")
    require(tolerance.forall(_ >= 0), s"negative tolerance: $tolerance")
    // time axis embeds via cast-to-timestamp-then-double: identity
    // (epoch seconds) for numerics, epoch seconds for timestamp/ntz —
    // one monotone rule for every supported ts type
    val num = (c: Column) => c.cast("timestamp").cast("double")
    val dist = (m: Column) =>
      abs(num(col(ts)) - num(m.getField("graft_mts")))
    val u = unioned(left, right, keyCols, leftTs, rightTs, valueCols)
    val chosen = direction match {
      case "backward" | "forward" =>
        u.withColumn(payload, last(col(payload), ignoreNulls = true)
          .over(carryWindow(keyCols, forward = direction == "forward")))
      case "nearest" =>
        // both scans over the one shuffled union; per row pick the closer
        // match; exact ties go backward — the deterministic choice a
        // re-run and the oracle both reproduce
        val b = last(col(payload), ignoreNulls = true)
          .over(carryWindow(keyCols, forward = false))
        val f = last(col(payload), ignoreNulls = true)
          .over(carryWindow(keyCols, forward = true))
        u.withColumn("graft_b", b).withColumn("graft_f", f)
          .withColumn(payload,
            when(col("graft_b").isNull, col("graft_f"))
              .when(col("graft_f").isNull, col("graft_b"))
              .when(dist(col("graft_b")) <= dist(col("graft_f")), col("graft_b"))
              .otherwise(col("graft_f")))
          .drop("graft_b", "graft_f")
    }
    // Tolerance applies AFTER the directional pick, exactly like pandas:
    // the nearest/latest match either qualifies or the row gets NULL —
    // a farther-but-within-tolerance candidate is never substituted.
    val bounded = tolerance match {
      case None => chosen
      case Some(t) => chosen.withColumn(payload,
        when(dist(col(payload)) <= lit(t), col(payload)))
    }
    valueCols.foldLeft(bounded.filter(col(side) === 1)) { (df, c) =>
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
