package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frontier(
      pts: Seq[(Double, Double)],
      buckets: Int = 16,
      maxCandidates: Int = 100000): Set[(Double, Double)] =
    Skyline.pareto2D(pts.toDF("x", "y"), "x", "y", buckets, maxCandidates)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet

  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (a, b) => a >= x && b >= y && (a > x || b > y) }
    }.toSet
  }

  test("staircase: interior points dominated, frontier survives") {
    val pts = Seq((1.0, 5.0), (2.0, 4.0), (3.0, 3.0), (4.0, 2.0), (5.0, 1.0),
      (2.0, 2.0), (3.0, 1.0), (1.0, 1.0))
    assert(frontier(pts) ==
      Set((1.0, 5.0), (2.0, 4.0), (3.0, 3.0), (4.0, 2.0), (5.0, 1.0)))
  }

  test("duplicate frontier points collapse to one; equal-x keeps only max y") {
    val pts = Seq((2.0, 9.0), (2.0, 9.0), (2.0, 1.0), (5.0, 5.0), (5.0, 4.0))
    assert(frontier(pts) == Set((2.0, 9.0), (5.0, 5.0)))
  }

  test("matches an O(n²) brute force on pseudo-random points") {
    val pts = (1 to 500).map { i =>
      (((i * 131) % 997).toDouble, ((i * 577 + 13) % 991).toDouble)
    }
    assert(frontier(pts) == brute(pts))
    // degenerate x: everything lands in one bucket, prefilter passes all
    val flat = (1 to 100).map(i => (7.0, ((i * 37) % 101).toDouble))
    assert(frontier(flat) == brute(flat))
  }

  test("null coordinates are excluded; empty input yields empty frontier") {
    val withNulls = Seq(
      (Some(1.0), Some(1.0)), (None, Some(9.0)), (Some(9.0), None))
      .toDF("x", "y")
    val f = Skyline.pareto2D(withNulls, "x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(f == Set((1.0, 1.0)))
    assert(Skyline.pareto2D(Seq.empty[(Double, Double)].toDF("x", "y"), "x", "y")
      .collect().isEmpty)
  }

  test("deterministic across upstream partitionings") {
    val pts = (1 to 500).map { i =>
      (((i * 131) % 997).toDouble, ((i * 577 + 13) % 991).toDouble)
    }
    val a = frontier(pts)
    val b = Skyline.pareto2D(pts.toDF("x", "y").repartition(13), "x", "y", 16)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("candidate cap guards the driver collect and names the remedy") {
    // all x equal → single bucket → every distinct point is a candidate
    val flat = (1 to 50).map(i => (1.0, i.toDouble))
    val e = intercept[IllegalArgumentException] {
      Skyline.pareto2D(flat.toDF("x", "y"), "x", "y",
        buckets = 4, maxCandidates = 10).collect()
    }
    assert(e.getMessage.contains("buckets"))
  }
}
