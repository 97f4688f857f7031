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

  /** The shared PSI fold over a joined (bucket, n_base, n_cur) frame —
    * ≤ nBuckets rows by construction; the 1-row crossJoin(broadcast) is
    * the designed plan. */
  private def foldPsi(joined0: DataFrame, eps: Double): DataFrame = {
    val joined = joined0.select(
      coalesce(col("n_base"), lit(0L)).as("n_base"),
      coalesce(col("n_cur"), lit(0L)).as("n_cur"))
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
    foldPsi(
      sideCounts(base, "n_base")
        .join(sideCounts(cur, "n_cur"), Seq("bucket"), "full_outer"),
      eps)
  }

  /** Numeric-PSI baseline captured ONCE: the ≤ nBuckets histogram plus
    * its bucketing config, driver-resident. The monitoring loop — a
    * structured stream scoring every micro-batch against last month's
    * corpus — must not rescan the baseline table per trigger; against a
    * captured baseline the per-trigger cost is one aggregate over the
    * BATCH only, with the baseline joining in as a literal-sized frame. */
  final case class PsiBaseline(
      valueCol: String,
      nBuckets: Int,
      lo: Double,
      hi: Double,
      counts: Seq[(Int, Long)])

  def psiBaseline(
      base: DataFrame,
      valueCol: String,
      nBuckets: Int,
      lo: Double,
      hi: Double): PsiBaseline = {
    require(nBuckets > 0 && hi > lo)
    val counts = base
      .select(bucketExpr(valueCol, nBuckets, lo, hi).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    PsiBaseline(valueCol, nBuckets, lo, hi, counts)
  }

  /** [[psi]] against a captured [[PsiBaseline]] — identical result to
    * the two-table form on the same data (DriftSpec pins the parity). */
  def psiAgainst(
      b: PsiBaseline,
      cur: DataFrame,
      eps: Double = 1e-6): DataFrame = {
    val spark = cur.sparkSession
    import spark.implicits._
    val baseDf = b.counts.toDF("bucket", "n_base")
    val curDf = cur
      .select(bucketExpr(b.valueCol, b.nBuckets, b.lo, b.hi).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_cur"))
    foldPsi(broadcast(baseDf).join(curDf, Seq("bucket"), "full_outer"), eps)
  }

  /** Categorical drift: PSI plus Pearson's chi-square over STRING
    * buckets — the companion to the numeric [[psi]] for the columns a
    * corpus monitor actually watches (language, source domain, license
    * tag). Buckets are the category values themselves, capped at the
    * `maxCategories` most frequent BASE-side values (ties broken by
    * value, so the bucket set is deterministic and engine-reproducible);
    * everything else — including categories that appear only in `cur`,
    * the classic new-language-shows-up drift — folds into `__other__`,
    * and NULL reads as `__null__`.
    *
    * `chi2 = Σ_b (n_cur(b) − E_b)² / E_b` with `E_b = t_cur · p_base(b)`
    * (base proportions floored at `eps` like PSI, so a category present
    * only in `cur` contributes a large finite term, not ∞).
    *
    * Same scale shape as [[psi]]: the top-category list is one
    * aggregate over base capped at `maxCategories` driver-side values;
    * then two ≤(maxCategories+2)-row bucket aggregates, a bucket join,
    * a scalar fold. Never a sort of data rows, never a row-level join. */
  def psiCat(
      base: DataFrame,
      cur: DataFrame,
      valueCol: String,
      maxCategories: Int = 20,
      eps: Double = 1e-6): DataFrame = {
    require(maxCategories > 0)
    def cat = coalesce(col(valueCol).cast("string"), lit("__null__"))
    // deterministic top-N base categories: count desc, value asc
    val top = base.select(cat.as("c")).groupBy("c")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("c").asc)
      .limit(maxCategories)
      .collect().map(_.getString(0)).toSeq
    def bucketed(df: DataFrame, alias: String) =
      df.select(when(cat.isin(top: _*), cat).otherwise("__other__").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(alias))
    foldPsiChi(
      bucketed(base, "n_base")
        .join(bucketed(cur, "n_cur"), Seq("bucket"), "full_outer"),
      eps)
  }

  /** The shared PSI+chi-square fold over a joined categorical-bucket
    * frame — ≤ (maxCategories+2) rows by construction. */
  private def foldPsiChi(joined0: DataFrame, eps: Double): DataFrame = {
    val joined = joined0.select(
      coalesce(col("n_base"), lit(0L)).as("n_base"),
      coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      sum("n_base").as("t_base"), sum("n_cur").as("t_cur"))
    joined.crossJoin(broadcast(totals))
      .select(
        greatest(col("n_base") / col("t_base"), lit(eps)).as("pb"),
        greatest(col("n_cur") / col("t_cur"), lit(eps)).as("pc"),
        col("n_cur"), col("t_base"), col("t_cur"))
      .groupBy("t_base", "t_cur")
      .agg(
        sum((col("pc") - col("pb")) * log(col("pc") / col("pb"))).as("psi"),
        sum(pow(col("n_cur") - col("t_cur") * col("pb"), 2) /
          (col("t_cur") * col("pb"))).as("chi2"))
      .select(
        round(col("psi"), 4).as("psi"),
        round(col("chi2"), 2).as("chi2"),
        col("t_base").as("rows_base"), col("t_cur").as("rows_cur"))
  }

  /** Categorical baseline captured ONCE: the deterministic top-N bucket
    * set and base counts, driver-resident — same rationale as
    * [[PsiBaseline]]. */
  final case class CatBaseline(
      valueCol: String,
      top: Seq[String],
      counts: Seq[(String, Long)])

  def catBaseline(
      base: DataFrame,
      valueCol: String,
      maxCategories: Int = 20): CatBaseline = {
    require(maxCategories > 0)
    def cat = coalesce(col(valueCol).cast("string"), lit("__null__"))
    val top = base.select(cat.as("c")).groupBy("c")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("c").asc)
      .limit(maxCategories)
      .collect().map(_.getString(0)).toSeq
    val counts = base
      .select(when(cat.isin(top: _*), cat).otherwise("__other__").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    CatBaseline(valueCol, top, counts)
  }

  /** [[psiCat]] against a captured [[CatBaseline]] — identical result to
    * the two-table form on the same data (DriftSpec pins the parity). */
  def psiCatAgainst(
      b: CatBaseline,
      cur: DataFrame,
      eps: Double = 1e-6): DataFrame = {
    val spark = cur.sparkSession
    import spark.implicits._
    def cat = coalesce(col(b.valueCol).cast("string"), lit("__null__"))
    val baseDf = b.counts.toDF("bucket", "n_base")
    val curDf = cur
      .select(when(cat.isin(b.top: _*), cat).otherwise("__other__").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_cur"))
    foldPsiChi(broadcast(baseDf).join(curDf, Seq("bucket"), "full_outer"), eps)
  }
}
