package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table on the interleaved
  * bits of several columns so that a filter on ANY of them touches few
  * files — the multi-dimensional generalization of sort-by-one-column,
  * and the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * Why it matters at 100 TB: parquet scan pruning is min/max-stat driven
  * per file/row-group. A table sorted by `a` prunes filters on `a` only;
  * z-ordered on (a, b) both `a`-filters and `b`-filters localize to
  * ~√(files) instead of all of them. The layout pass itself is one range
  * exchange + in-partition sort — the same cost as any global sort, paid
  * once at write time.
  *
  * Implementation: each column is min/max-scaled to a `bits`-wide integer
  * (one tiny agg job for the bounds — 2 values per column, never data),
  * then bit-interleaved into a single LONG z-value with pure arithmetic
  * column expressions (fully codegen'd; no UDF). `repartitionByRange` on
  * the z-value gives contiguous curve segments per file.
  */
object Layout {

  /** `c` min/max-scaled to a `bits`-wide cell coordinate in [0, 2^bits),
    * clamped so values outside the sampled bounds (late appends) land on
    * the curve's edge instead of wrapping. */
  private def scaleToCell(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(
      greatest(
        floor((c.cast("double") - lit(lo)) / lit(span) * lit((1L << bits).toDouble))
          .cast("long"),
        lit(0L)),
      lit((1L << bits) - 1L))
  }

  /** Morton z-value of `cols`, each scaled to `bits` bits from the given
    * (min, max) bounds. Pure column arithmetic. */
  def zValue(cols: Seq[Column], bounds: Seq[(Double, Double)], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bits <= 62, s"${cols.size} cols × $bits bits exceeds a Long")
    val n = cols.size
    val scaled = cols.zip(bounds).map { case (c, (lo, hi)) => scaleToCell(c, lo, hi, bits) }
    val terms = for {
      (s, j) <- scaled.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftrightunsigned(s, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Hilbert-curve value of `(x, y)`, each scaled to `bits` bits from the
    * given bounds. Unlike the Morton z-value, consecutive Hilbert indexes
    * are always grid-adjacent (the curve never jumps across a seam), so a
    * file's index range covers a tighter rectangle — at high selectivity a
    * range filter touches at most as many files as under z-order. The walk
    * carries rotation state across bit levels, so it is a native codegen
    * expression (HilbertIndex) rather than flat column arithmetic. */
  def hilbertValue(x: Column, y: Column, bounds: Seq[(Double, Double)], bits: Int): Column = {
    require(bounds.size == 2, "hilbert layout is 2-dimensional (x, y)")
    require(2 * bits <= 62, s"2 cols × $bits bits exceeds a Long")
    val sx = scaleToCell(x, bounds.head._1, bounds.head._2, bits)
    val sy = scaleToCell(y, bounds(1)._1, bounds(1)._2, bits)
    org.apache.spark.sql.graft.HilbertIndex.column(sx, sy, bits)
  }

  /** Write `df` to parquet z-ordered on `cols` across `numFiles` files.
    * Bounds are computed with one min/max aggregate over the input. */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      numFiles: Int,
      bits: Int = 16): Unit = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"min_$c"), max(col(c).cast("double")).as(s"max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bounds = cols.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
    df.withColumn("graft_z", zValue(cols.map(col), bounds, bits))
      .repartitionByRange(numFiles, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .drop("graft_z")
      .write.parquet(path)
  }

  /** Write `df` to parquet Hilbert-ordered on two columns across
    * `numFiles` files — same shape as [[writeZOrdered]] (one bounds agg,
    * one range exchange, in-partition sort), trading the Morton curve for
    * the seam-free Hilbert walk. */
  def writeHilbertOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      numFiles: Int,
      bits: Int = 16): Unit = {
    require(cols.size == 2, "hilbert layout is 2-dimensional (x, y)")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"min_$c"), max(col(c).cast("double")).as(s"max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bounds = cols.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
    df.withColumn("graft_h",
        hilbertValue(col(cols.head), col(cols(1)), bounds, bits))
      .repartitionByRange(numFiles, col("graft_h"))
      .sortWithinPartitions("graft_h")
      .drop("graft_h")
      .write.parquet(path)
  }
}
