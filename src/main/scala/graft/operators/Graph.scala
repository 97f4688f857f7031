package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over edge tables — the link-analysis primitive a
  * crawl-curation pipeline uses to weight documents by the structure
  * around them (PageRank over a hyperlink or transition graph; the
  * CommonCrawl-style quality prior).
  *
  * Representation is pure DataFrames: an edge table (src, dst, weight) —
  * no driver-side adjacency structure, so the graph can be 100 TB of
  * edges. Each PageRank iteration is the standard two-shuffle plan:
  * ranks ⋈ edges on src (contributions), then an aggregate on dst;
  * Catalyst/AQE pick the join strategy per iteration (a rank table of
  * distinct nodes is usually far smaller than the edge table and
  * broadcasts). The normalized edge table is persisted once and reused
  * by every iteration.
  *
  * Determinism: a FIXED iteration count (convergence thresholds make
  * output depend on FP noise), ranks rounded to `roundTo` decimals at
  * every iteration boundary so the oracle's replay crosses each
  * rounding boundary identically, and missing in-links coalesce to the
  * teleport floor. Dangling nodes (no out-edges) leak their mass — the
  * documented simplification; the ranking ORDER is unaffected for the
  * curation use.
  */
object Graph {

  /** Weighted PageRank over `edges`; returns (node, rank).
    *
    * rank₀ = 1/N;
    * rankₖ₊₁(v) = (1−d)/N + d · Σ_{u→v} rankₖ(u) · w(u,v)/outw(u). */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iterations: Int,
      damping: Double = 0.85,
      roundTo: Int = 9): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      "fixed iteration count in [1, 50] (each iteration extends the plan)")
    val e = edges.select(
      col(srcCol).as("graft_src"),
      col(dstCol).as("graft_dst"),
      col(weightCol).cast("double").as("graft_w"))
    val nodes = e.select(col("graft_src").as("node"))
      .union(e.select(col("graft_dst").as("node")))
      .distinct()
    val n = nodes.count().toDouble // one scalar to the driver
    val outw = e.groupBy("graft_src").agg(sum("graft_w").as("graft_outw"))
    val norm = e.join(outw, "graft_src")
      .select(col("graft_src"), col("graft_dst"),
        (col("graft_w") / col("graft_outw")).as("graft_p"))
      .persist() // scanned by every iteration of the final plan
    val teleport = (1 - damping) / n

    var ranks = nodes.withColumn("rank", round(lit(1.0 / n), roundTo))
    (1 to iterations).foreach { _ =>
      val contrib = norm.join(ranks, col("graft_src") === col("node"))
        .groupBy(col("graft_dst").as("graft_node"))
        .agg(sum(col("rank") * col("graft_p")).as("graft_in"))
      ranks = nodes
        .join(contrib, col("node") === col("graft_node"), "left")
        .select(col("node"),
          round(
            lit(teleport) +
              lit(damping) * coalesce(col("graft_in"), lit(0.0)),
            roundTo).as("rank"))
    }
    ranks
  }
}
