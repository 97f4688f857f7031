package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ORACLE-REPLAYABLE Count-Min sketch (Cormode & Muthukrishnan 2005)
  * over the md5 hash family — the r13 promotion pattern applied to the
  * frequency-sketch operator.
  *
  * Spark's builtin `count_min_sketch` estimates depend on its private
  * internal hash family, which no other engine can reproduce — that is
  * what kept q_freq_sketch rows-only. This variant derives row i's hash
  * from the one hash both engines share:
  *
  *   x(t)   = md5-base-32(t) mod p            (p = 2³¹−1)
  *   hᵢ(t)  = ((aᵢ·x + bᵢ) mod p) mod width   (Carter–Wegman, md5-derived
  *                                             literal coefficients, tags
  *                                             "cma"/"cmb")
  *
  * so every counter — and therefore every estimate — is a deterministic
  * pure function of the corpus that DuckDB SQL replays bit-identically,
  * while keeping the CMS guarantee (est ≥ exact always; est ≤ exact +
  * (e/width)·N with probability 1−exp(−depth) per probe, the standard
  * bound for pairwise-independent rows).
  *
  * 100 TB shape: the build is one explode(depth) + groupBy(row, col)
  * count — partial aggregation collapses each partition to ≤ depth·width
  * cells before the shuffle, so only bounded sketch cells cross the
  * wire, exactly like merging builtin sketch blobs. Probing joins the
  * (row, col) keys of the probe terms against the cell table: bounded ×
  * bounded.
  */
object CmSketch {

  def coefs(depth: Int): Seq[(Long, Long)] =
    (0 until depth).map { i =>
      (TextFunctions.md5Coef("cma", i, TextFunctions.ReplayP - 1) + 1,
        TextFunctions.md5Coef("cmb", i, TextFunctions.ReplayP))
    }

  private def base(term: org.apache.spark.sql.Column) =
    TextFunctions.md5Base32(term) % TextFunctions.ReplayP

  /** The depth × width cell table: (row, col, n). */
  def build(terms: DataFrame, termCol: String, depth: Int, width: Int): DataFrame = {
    val cs = coefs(depth)
    terms
      .select(base(col(termCol)).as("graft_x"))
      .select(explode(array(cs.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(i).as("row"),
          (((col("graft_x") * a + b) % TextFunctions.ReplayP) % width).as("col"))
      }: _*)).as("graft_cell"))
      .groupBy(col("graft_cell.row").as("row"), col("graft_cell.col").as("col"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point-query estimates for `probes` (any frame with `termCol`):
    * est(t) = min over rows of cell(i, hᵢ(t)). Preserves all probe
    * columns, adds `n_est`; duplicate probe rows collapse to one output
    * row per distinct probe (a point query is per-term).
    *
    * The cell lookup is a LEFT join with absent cells read as 0: the
    * sketch table stores only nonzero cells (the groupBy count), so an
    * out-of-corpus term usually hits no stored cell at all — an inner
    * join would silently DROP it from the output (and, when only some
    * of its cells collide with real terms, min over the surviving
    * subset would overestimate a count the true CMS reads as 0). With
    * the 0-fill, est(t)=0 exactly when any of t's cells is untouched —
    * the textbook CMS answer. In-corpus probes are unaffected: a
    * counted term touched all `depth` of its cells, so none is absent. */
  def estimate(
      sketch: DataFrame,
      probes: DataFrame,
      termCol: String,
      depth: Int,
      width: Int): DataFrame = {
    val cs = coefs(depth)
    val keyed = probes
      .withColumn("graft_x", base(col(termCol)))
      .select(col("*"), explode(array(cs.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(i).as("row"),
          (((col("graft_x") * a + b) % TextFunctions.ReplayP) % width).as("col"))
      }: _*)).as("graft_cell"))
      .select(col("*"), col("graft_cell.row").as("row"), col("graft_cell.col").as("col"))
      .drop("graft_cell", "graft_x")
    val probeCols = probes.columns
    keyed
      .join(sketch, Seq("row", "col"), "left")
      .groupBy(probeCols.map(col): _*)
      .agg(min(coalesce(col("n"), lit(0L))).as("n_est"))
  }
}
