package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM changepoint/drift detection per key — the classic upward
  * cumulative-sum control chart (Page 1954): S₀ = 0,
  * Sᵢ = max(0, Sᵢ₋₁ + (xᵢ − μ − slack)), alarm when Sᵢ > threshold.
  * The streaming-monitoring companion to the batch drift metrics
  * ([[Drift]] PSI/χ²): PSI says "these two corpora differ", CUSUM says
  * "THIS key's stream shifted, and here is when".
  *
  * Scale shape: the recursion has a closed form —
  * Sᵢ = Pᵢ − min(0, min_{j≤i} Pⱼ) where Pᵢ is the running sum of the
  * deviations dᵢ = xᵢ − μ − slack — so the whole operator is two
  * per-key running windows (cumsum + running min), never a sequential
  * fold and never a driver loop. Per-key state is the key's own event
  * count, the same bound sessionize already assumes; everything
  * shuffles once on the key.
  *
  * Determinism: μ is the key's own mean quantized at 6 decimals (the
  * q_feature_scale rule — both engines must fold from bit-identical
  * inputs); the running sums then evaluate the identical IEEE sequence
  * in any engine that adds in (orderCols) order.
  */
object Changepoint {

  /** Per-row CUSUM statistic and alarm flag. Adds `graft_cusum` and
    * `graft_alarm` to `df`'s columns (plus nothing else). `orderCols`
    * must be unique per key — ties would make the fold order, and thus
    * the statistic, partitioning-dependent.
    *
    * Deviations quantize to the dyadic 1/64 grid (`floor(d·64)/64`)
    * before summation: dyadic rationals sum EXACTLY in IEEE double (no
    * rounding error until ~2⁴⁷ events per key), so every prefix sum —
    * and therefore the statistic — is bit-identical under ANY
    * accumulation order. This is determinism by construction, which
    * survives what per-value rounding cannot: engines genuinely differ
    * on window-sum order (DuckDB segment tree vs Spark sequential), and
    * a noisy value exactly at a rounding boundary flips either way. The
    * ≤1/64 per-step quantization bias is irrelevant to a control chart
    * (pick slack accordingly). */
  def cusum(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      slack: Double,
      threshold: Double): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty)
    val mu = df.groupBy(keyCols.map(col): _*)
      .agg(round(avg(valueCol), 6).as("graft_mu"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dq = floor((col(valueCol) - col("graft_mu") - lit(slack)) * 64d) / 64d
    val p = sum(dq).over(w)
    df.join(broadcast(mu), keyCols)
      .withColumn("graft_p", p)
      .withColumn("graft_cusum",
        col("graft_p") - least(lit(0d), min(col("graft_p")).over(w)))
      .withColumn("graft_alarm", col("graft_cusum") > lit(threshold))
      .drop("graft_mu", "graft_p")
  }

  /** Per-key summary: peak statistic, alarm count, first alarm position
    * (by `orderCols`, null if never alarmed), event count.
    *
    * The statistic is exact by [[cusum]]'s dyadic quantization, so every
    * comparison and aggregate here is deterministic; the peak reports at
    * 2 decimals (a monitoring signal, not a measurement). */
  def cusumSummary(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      slack: Double,
      threshold: Double,
      firstAlarmCol: String = "first_alarm"): DataFrame = {
    val scored = cusum(df, keyCols, orderCols, valueCol, slack, threshold)
    val firstOrd = col(orderCols.head)
    scored.groupBy(keyCols.map(col): _*)
      .agg(
        round(max(col("graft_cusum")), 2).as("max_cusum"),
        sum(when(col("graft_alarm"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("graft_alarm"), firstOrd)).as(firstAlarmCol),
        count(lit(1)).as("n"))
  }
}
