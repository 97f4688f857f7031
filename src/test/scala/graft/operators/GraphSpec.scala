package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String, Double)], iters: Int = 10) =
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("a symmetric 2-cycle stays uniform") {
    val r = ranksOf(Seq(("a", "b", 1.0), ("b", "a", 1.0)))
    assert(math.abs(r("a") - 0.5) < 1e-6 && math.abs(r("b") - 0.5) < 1e-6)
  }

  test("the hub of a star graph outranks every spoke") {
    val spokes = Seq("b", "c", "d", "e")
    // spokes all point at the hub; the hub spreads back across all of
    // them (a single back-edge would funnel the hub's whole mass into
    // one spoke and push it ABOVE the hub — correct PageRank, wrong test)
    val edges = spokes.map(s => (s, "a", 1.0)) ++ spokes.map(s => ("a", s, 1.0))
    val r = ranksOf(edges)
    spokes.foreach(s => assert(r("a") > r(s), s"hub should outrank $s"))
    // total mass conserved here (no dangling nodes): sums to ~1
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("edge weights steer rank: the heavier-linked target wins") {
    val r = ranksOf(Seq(
      ("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)))
    assert(r("b") > r("c"))
  }

  test("deterministic across upstream partitionings") {
    val edges = (1 to 40).map(i =>
      (s"n${i % 7}", s"n${(i * 3) % 7}", (i % 5 + 1).toDouble))
    val a = Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(edges.toDF("src", "dst", "w").repartition(13),
        "src", "dst", "w", 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  // ---- triangleStats ----

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Double) = {
    val r = Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("K4: every wedge closes — clustering 1.0") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(tri(k4) == ((4L, 6L, 12L, 4L, 1.0)))
  }

  test("path graph has wedges but no triangles") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == ((4L, 3L, 2L, 0L, 0.0)))
  }

  test("triangle with a pendant: 1 triangle over 5 wedges") {
    val (_, _, w, t, c) = tri(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert((w, t) == ((5L, 1L)) && c == 0.6)
  }

  test("canonicalization: duplicates, reversed edges, self-loops don't change stats") {
    val clean = tri(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val dirty = tri(Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (1L, 3L),
      (1L, 1L), (3L, 3L)))
    assert(clean == dirty && clean._4 == 1L)
  }

  test("star graph: the hub's wedges never close") {
    val star = (2L to 30L).map(i => (1L, i))
    val (_, _, w, t, _) = tri(star)
    assert(w == 29L * 28L / 2 && t == 0L)
  }

  test("degree-ordered count matches an id-ordered brute force on a pseudo-random graph") {
    // deterministic edge hash over 30 nodes; dense enough for mixed triangles
    val edges = (1 to 160).map(i => (((i * 7) % 30).toLong, ((i * 13 + 3) % 30).toLong))
      .filter { case (a, b) => a != b }
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    var brute = 0L
    for (a <- nodes; b <- nodes if b > a && adj(a)(b); c <- nodes
         if c > b && adj(a)(c) && adj(b)(c)) brute += 1
    val (_, _, _, t, _) = tri(edges)
    assert(t == brute, s"degree-ordered $t != brute-force $brute")
  }

  test("triangleStats is deterministic across upstream partitionings") {
    val edges = (1 to 160).map(i => (((i * 7) % 30).toLong, ((i * 13 + 3) % 30).toLong))
      .filter { case (a, b) => a != b }
    val a = tri(edges)
    val b = Graph.triangleStats(
      edges.toDF("src", "dst").repartition(11), "src", "dst")
      .collect().head
    assert(a == ((b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3), b.getDouble(4))))
  }

  private def lpa(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: weighted majority overrides the smaller label " +
    "(where min-propagation could not)") {
    // node 5: label-1 vote weight 1 vs label-6 vote weight 3
    val got = lpa(Seq((1L, 5L, 1L), (5L, 6L, 3L)), iters = 1)
    assert(got(5L) == 6L)
  }

  test("labelPropagation: two dense triangles behind a weak bridge stay " +
    "separate communities; connected components would merge them") {
    val intra = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .map { case (a, b) => (a, b, 10L) }
    val bridge = Seq((3L, 4L, 1L))
    val got = lpa(intra ++ bridge, iters = 3)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(4L) == 4L && got(5L) == 4L && got(6L) == 4L)
  }

  test("labelPropagation: deep runs (materialized rounds) equal shallow " +
    "semantics — the depth gate changes the plan, never the labels") {
    val intra = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .map { case (a, b) => (a, b, 10L) }
    val bridge = Seq((3L, 4L, 1L))
    // 3 iterations = lazy path, 6 = materialized path; LPA on this graph
    // is at its fixpoint by round 3, so the label sets must be identical
    assert(lpa(intra ++ bridge, iters = 3) == lpa(intra ++ bridge, iters = 6))
  }

  test("labelPropagation: duplicate and reversed edge rows SUM their " +
    "weights; self-loops are ignored") {
    // (1,2) appears as 1->2, 1->2, 2->1: total weight 3 vs (1,3) weight 2
    val got = lpa(Seq(
      (1L, 2L, 1L), (1L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 2L),
      (1L, 1L, 100L)), iters = 1)
    assert(got(1L) == 2L)
    // synchronous round: 2 and 3 both see only node 1's initial label
    assert(got(2L) == 1L && got(3L) == 1L)
  }
}
