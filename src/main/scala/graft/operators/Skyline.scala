package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2D Pareto frontier (skyline): the points not dominated by any other —
  * p dominates q iff p.x ≥ q.x ∧ p.y ≥ q.y with at least one strict.
  * The multi-objective selection a curation pipeline runs when two
  * signals trade off (quality vs length, relevance vs recency) and no
  * scalarization is defensible: keep the frontier, drop everything
  * strictly worse on both axes.
  *
  * Scale shape — the classic grid-prefilter, not an O(n²) dominance
  * join and not a single-partition window sort:
  *  1. one aggregate for the x range (2 scalars to the driver);
  *  2. one `buckets`-row aggregate: max y per x-bucket;
  *  3. driver computes each bucket's suffix threshold thr(b) =
  *     max_{b' > b} maxY(b') — any row with y ≤ thr(b) is dominated by
  *     a point in a strictly-higher x bucket (x' > x guaranteed by the
  *     bucket bound, y' ≥ y by the threshold) and is eliminated by a
  *     broadcast filter DURING THE SCAN;
  *  4. survivors (the frontier plus a thin per-bucket sliver) dedup to
  *     distinct points, are size-guarded by `maxCandidates` (the same
  *     bounded-driver contract as the k-means fit sample), and the
  *     exact dominance sweep runs driver-side over the sorted sliver.
  *
  * At 100 TB steps 1–3 are two cheap aggregates and a narrow filtered
  * scan; nothing quadratic, nothing sorted globally, and the collect is
  * capped by contract. Throws (loudly) if survivors exceed the cap —
  * raise `buckets` (a finer grid prunes tighter) rather than the cap.
  *
  * Rows with NULL in either column are excluded (SQL comparison
  * semantics — NULL never dominates nor survives).
  *
  * Returns the DISTINCT frontier points as (xCol, yCol), driver-built.
  */
object Skyline {

  def pareto2D(
      df: DataFrame,
      xCol: String,
      yCol: String,
      buckets: Int = 256,
      maxCandidates: Int = 100000): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    val spark = df.sparkSession
    val pts = df.select(
        col(xCol).cast("double").as("graft_x"),
        col(yCol).cast("double").as("graft_y"))
      .filter(col("graft_x").isNotNull && col("graft_y").isNotNull)
    val range = pts.agg(
      min("graft_x").as("lo"), max("graft_x").as("hi")).collect().head
    if (range.isNullAt(0)) {
      // empty input — empty frontier, same schema
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        new org.apache.spark.sql.types.StructType()
          .add(xCol, org.apache.spark.sql.types.DoubleType)
          .add(yCol, org.apache.spark.sql.types.DoubleType))
    }
    val (lo, hi) = (range.getDouble(0), range.getDouble(1))
    val width = if (hi > lo) (hi - lo) / buckets else 1.0
    val bucketOf = least(greatest(
      floor((col("graft_x") - lit(lo)) / lit(width)).cast("int"), lit(0)),
      lit(buckets - 1))
    val perBucket = pts.groupBy(bucketOf.as("graft_b"))
      .agg(max("graft_y").as("graft_my"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // suffix-max over strictly higher buckets; -inf where none
    val thr = new Array[Double](buckets)
    var running = Double.NegativeInfinity
    ((buckets - 1) to 0 by -1).foreach { b =>
      thr(b) = running
      running = math.max(running, perBucket.getOrElse(b, Double.NegativeInfinity))
    }
    // broadcast threshold lookup as a literal array (buckets is small)
    val thrLit = array(thr.toIndexedSeq.map(lit(_)): _*)
    val survivors = pts
      .filter(col("graft_y") > element_at(thrLit, bucketOf + 1))
      .distinct()
    val cand = survivors.limit(maxCandidates + 1).collect()
    require(cand.length <= maxCandidates,
      s"skyline candidate sliver exceeds maxCandidates=$maxCandidates — " +
        s"raise buckets=$buckets for tighter grid pruning")
    // exact sweep: sort x desc then y desc; a point is dominated iff a
    // point with strictly larger x has y' >= y, or an equal-x point has
    // y' > y (the sort makes the same-x max arrive first).
    val sorted = cand.map(r => (r.getDouble(0), r.getDouble(1)))
      .sortBy { case (x, y) => (-x, -y) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var maxYStrictlyRight = Double.NegativeInfinity // max y among x' > x
    var i = 0
    while (i < sorted.length) {
      // process one equal-x group at a time
      val x = sorted(i)._1
      var j = i
      while (j < sorted.length && sorted(j)._1 == x) j += 1
      val groupTopY = sorted(i)._2
      (i until j).foreach { idx =>
        val y = sorted(idx)._2
        // same-x domination: only the group's max y survives (duplicate
        // points collapsed by distinct() upstream)
        if (y == groupTopY && y > maxYStrictlyRight) out += ((x, y))
      }
      maxYStrictlyRight = math.max(maxYStrictlyRight, groupTopY)
      i = j
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    out.foreach { case (x, y) =>
      rows.add(org.apache.spark.sql.Row(x, y)); ()
    }
    spark.createDataFrame(rows,
      new org.apache.spark.sql.types.StructType()
        .add(xCol, org.apache.spark.sql.types.DoubleType)
        .add(yCol, org.apache.spark.sql.types.DoubleType))
  }
}
