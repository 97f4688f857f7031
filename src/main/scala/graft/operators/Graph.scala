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

  /** Global triangle census over an undirected graph: one row with
    * (n_nodes, n_edges, n_wedges, n_triangles, clustering) where
    * clustering = 3·triangles / wedges (the global clustering
    * coefficient — the cohesion metric link-graph curation uses to
    * separate organic link neighborhoods from link farms, whose
    * coefficient collapses).
    *
    * Scale shape — the MPC-standard DEGREE-ORDERED enumeration: each
    * edge is oriented from its lower (degree, id) endpoint to the
    * higher, every triangle is counted exactly once from its
    * lowest-degree corner, and a node's out-degree is bounded by
    * O(√m) regardless of its true degree (arboricity bound). The wedge
    * join therefore never explodes on a hub: a 10⁷-degree celebrity
    * node in a naive id-ordered enumeration contributes C(10⁷,2) wedge
    * rows; degree-ordered it contributes only pairs among the few
    * HIGHER-degree neighbors. Triangle COUNT is orientation-invariant,
    * so the oracle replays the cheap id-ordered a<b<c enumeration and
    * must land on identical numbers.
    *
    * Input edges may be directed/duplicated/self-looped; they are
    * canonicalized (least, greatest), self-loops dropped, dedup'd. */
  def triangleStats(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist() // scanned by degrees, orientation, closure probe, edge count
    val deg = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("graft_deg"))
    val du = deg.select(col("node").as("u"), col("graft_deg").as("graft_du"))
    val dv = deg.select(col("node").as("v"), col("graft_deg").as("graft_dv"))
    val lowFirst = col("graft_du") < col("graft_dv") ||
      (col("graft_du") === col("graft_dv") && col("u") < col("v"))
    val oriented = e.join(du, "u").join(dv, "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("a"),
        when(lowFirst, col("v")).otherwise(col("u")).as("b"))
      .persist()
    // Wedges = pairs of out-neighbors of one low corner, emitted in
    // canonical (min,max) id order so the closure probe is a plain
    // equi-join back to the canonical edge set.
    val wedgePairs = oriented.select(col("a"), col("b").as("graft_n1"))
      .join(oriented.select(col("a"), col("b").as("graft_n2")), "a")
      .filter(col("graft_n1") < col("graft_n2"))
      .select(col("graft_n1").as("u"), col("graft_n2").as("v"))
    val triangles = wedgePairs.join(e, Seq("u", "v"))
      .agg(count(lit(1)).as("n_triangles"))
    // Wedge total for the coefficient = Σ C(deg,2) (all wedges, not just
    // oriented ones). Exact integer math: sum the even product, halve.
    val nodeStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("graft_deg") * (col("graft_deg") - 1)) / 2)
        .cast("long").as("n_wedges"))
    val edgeStats = e.agg(count(lit(1)).as("n_edges"))
    nodeStats.crossJoin(edgeStats).crossJoin(triangles)
      .select(
        col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise(round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("clustering"))
  }

  /** Community detection by synchronous WEIGHTED-MAJORITY label
    * propagation (Raghavan et al. 2007) — distinct from connected
    * components (Dedup.nearDupClusters' min-propagation): a node adopts
    * the label with the LARGEST incident weight sum each round, so a
    * component with internal structure (two dense groups joined by a
    * weak bridge) splits into communities where min-propagation must
    * collapse it.
    *
    * Determinism (the q_label_prop oracle unrolls rounds as CTEs, the
    * q_pagerank precedent): synchronous rounds (all nodes update from
    * the PREVIOUS labeling — asynchronous LPA is update-order-dependent),
    * a FIXED iteration count, INTEGER weights (vote sums are exact longs,
    * no FP accumulation-order noise on near-ties), and ties broken by
    * the smallest label. Initial label = the node's own id.
    *
    * Edges are undirected: (u,v) and (v,u) are the same edge, duplicate
    * rows SUM their weights; self-loops are dropped (a self-vote frozen
    * to the stale label only delays convergence).
    *
    * Scale shape per round: one join of the edge table against the
    * label table (node-sized — broadcastable long after edges are not)
    * + one (node, label) aggregate + the bounded-heap per-node argmax
    * (TopK.perKey: map-side partial, no window sort). Never a driver
    * structure; O(iterations) fixed rounds, not data-dependent. */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      "fixed iteration count in [1, 50] (each iteration extends the plan)")
    val canon = edges
      .filter(col(srcCol) =!= col(dstCol))
      .select(
        least(col(srcCol), col(dstCol)).as("graft_u"),
        greatest(col(srcCol), col(dstCol)).as("graft_v"),
        col(weightCol).cast("long").as("graft_w"))
      .groupBy("graft_u", "graft_v").agg(sum("graft_w").as("graft_w"))
    // The symmetrized edge table is scanned by every round — persist it
    // for the duration of the call and release it after the RESULT is
    // materialized below (measured: without the cache, exchange reuse
    // does not cover the rounds' joins and q_label_prop pays ~1.5 s per
    // execution; with the old never-released persist, one edge-sized
    // cache entry leaked per call).
    val materialize = iterations > 4
    val und = canon
      .unionByName(canon.select(
        col("graft_v").as("graft_u"), col("graft_u").as("graft_v"),
        col("graft_w")))
      .persist()
    val nodes = und.select(col("graft_u").as("node")).distinct()

    // Each round builds the next labeling from the vote winners ALONE:
    // nodes are exactly the symmetrized edge endpoints, so every node
    // receives at least one vote and the winner set is total — no
    // keep-old-label fallback join. That keeps each round's plan
    // referencing the previous labeling exactly ONCE; a fallback
    // `labels.join(winner, "left")` would reference it twice and the
    // unmaterialized lineage doubles per round (exponential recompute —
    // measured 7.4 s for 3 rounds on the sf0.1 part graph vs 0.9 s for
    // this shape).
    var labels = nodes.withColumn("label", col("node"))
    // Depth-gated INTERMEDIATE materialization. Shallow runs (≤4
    // rounds) keep one lazy multi-round plan (materializing every round
    // costs blocking jobs + cache writes and measured as a steady-state
    // pessimization at 3 rounds); deep runs persist-and-cut per round —
    // lineage depth is what actually explodes analysis/codegen and
    // failure-recompute there. On BOTH paths the FINAL labeling is
    // persisted and materialized before returning, which is what lets
    // the edge cache (and deep-path intermediates) release here: exactly
    // one node-sized table — the returned result, the caller's handle,
    // the caller's release — outlives the call.
    var prevCached: Option[DataFrame] = None
    (1 to iterations).foreach { i =>
      val votes = und
        .join(labels, col("graft_u") === col("node"))
        .groupBy(col("graft_v").as("graft_n"), col("label"))
        .agg(sum("graft_w").as("graft_votes"))
        .withColumn("graft_neglabel", -col("label"))
      labels = TopK.perKey(votes, keys = Seq("graft_n"),
          ordering = Seq("graft_votes", "graft_neglabel"), k = 1)
        .select(col("graft_n").as("node"), (-col("graft_neglabel")).as("label"))
      if (materialize || i == iterations) {
        labels = labels.persist()
        labels.count()
        prevCached.foreach(_.unpersist(blocking = false))
        prevCached = Some(labels)
      }
    }
    und.unpersist(blocking = false)
    labels
  }
}
