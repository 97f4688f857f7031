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
}
