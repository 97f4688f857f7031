package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution drift between two snapshots of a table — the monitoring
  * primitive a continuously-ingested corpus needs: has this month's data
  * moved away from the distribution the model (or the curation
  * thresholds, or the IVF centroids) was built on?
  *
  * Population Stability Index over fixed-width buckets:
  * `PSI = Σ_b (p_cur(b) − p_base(b)) · ln(p_cur(b) / p_base(b))`,
  * with proportions floored at `eps` so empty buckets contribute a large
  * finite term instead of ±∞. Rule-of-thumb thresholds: < 0.1 stable,
  * 0.1–0.25 moderate shift, > 0.25 significant.
  *
  * Scale shape: one partial-aggregated bucket count per side (map-side
  * combine, shuffle of ≤ nBuckets rows), a broadcast-sized bucket join,
  * one scalar fold — never a sort, never a row-level join. Fixed [lo, hi)
  * edges (values outside clamp to the edge buckets) keep the bucketing
  * deterministic and engine-reproducible, unlike quantile-derived edges.
  */
object Drift {

  private def bucketExpr(
      valueCol: String, nBuckets: Int, lo: Double, hi: Double): Column = {
    val width = (hi - lo) / nBuckets
    least(greatest(
      floor((col(valueCol).cast("double") - lo) / width), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("int")
  }

  /** One PSI row: `psi` plus the per-side row counts that grounded it. */
  def psi(
      base: DataFrame,
      cur: DataFrame,
      valueCol: String,
      nBuckets: Int,
      lo: Double,
      hi: Double,
      eps: Double = 1e-6): DataFrame = {
    require(nBuckets > 0 && hi > lo)
    def sideCounts(df: DataFrame, alias: String) =
      df.select(bucketExpr(valueCol, nBuckets, lo, hi).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(alias))
    val joined = sideCounts(base, "n_base")
      .join(sideCounts(cur, "n_cur"), Seq("bucket"), "full_outer")
      .select(
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // scalar totals via a window-free cross of the (≤ nBuckets)-row frame
    // with its own aggregate — both sides are tiny by construction
    val totals = joined.agg(
      sum("n_base").as("t_base"), sum("n_cur").as("t_cur"))
    joined.crossJoin(broadcast(totals))
      .select(
        greatest(col("n_base") / col("t_base"), lit(eps)).as("pb"),
        greatest(col("n_cur") / col("t_cur"), lit(eps)).as("pc"),
        col("t_base"), col("t_cur"))
      .groupBy("t_base", "t_cur")
      .agg(sum((col("pc") - col("pb")) * log(col("pc") / col("pb"))).as("psi"))
      .select(
        round(col("psi"), 4).as("psi"),
        col("t_base").as("rows_base"), col("t_cur").as("rows_cur"))
  }
}
