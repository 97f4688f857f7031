package graft.functions

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SortedIntersectSize
import org.scalatest.funsuite.AnyFunSuite

/** Parity gate for the SortedIntersectSize merge-walk kernel: on
  * sorted-distinct string arrays it must equal
  * `size(array_intersect(...))` cell for cell — on the fixture corpus'
  * real shingle sets, on adversarial synthetic sets (empty / disjoint /
  * identical / subset / unicode ordering edges), and under nulls. */
class IntersectSizeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def kernel = SortedIntersectSize.sortedIntersectSize _

  test("kernel == size(array_intersect) over the fixture's shingle-set " +
    "pairs (the exact frame the near-dup verify joins see)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = docs.select(col("doc_id"),
      sort_array(array_distinct(TextFunctions.shingles(col("text"), 3))).as("sh"))
    // all pairs over a 60-doc slice: 1770 real set pairs
    val s = sh.limit(60)
    val pairs = s.toDF("id_a", "sh_a").crossJoin(
        s.toDF("id_b", "sh_b")).filter(col("id_a") < col("id_b"))
      .select(
        kernel(col("sh_a"), col("sh_b")).as("got"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("want"))
    assert(pairs.filter(col("got") =!= col("want")).count() == 0)
    assert(pairs.filter(col("got") > 0).count() > 0,
      "fixture slice must contain overlapping sets or the test is vacuous")
  }

  test("synthetic edges: empty, disjoint, identical, subset, unicode " +
    "order, and null arrays") {
    def sorted(xs: Seq[String]) = xs.distinct.sorted
    val rows = Seq(
      (sorted(Seq()), sorted(Seq("a", "b"))),
      (sorted(Seq("a", "b")), sorted(Seq())),
      (sorted(Seq("a", "c", "e")), sorted(Seq("b", "d", "f"))),
      (sorted(Seq("a", "b", "c")), sorted(Seq("a", "b", "c"))),
      (sorted(Seq("b", "c")), sorted(Seq("a", "b", "c", "d"))),
      // unicode: Spark string order is binary UTF-8 — multi-byte chars
      // sort AFTER ascii; the kernel must walk the same order
      (sorted(Seq("z", "é", "a", "x", "日本")),
        sorted(Seq("é", "日本", "m"))),
      (sorted(Seq("", "a")), sorted(Seq("", "b"))))
    val df = rows.toDF("sh_a", "sh_b")
      .select(sort_array(col("sh_a")).as("sh_a"), sort_array(col("sh_b")).as("sh_b"))
    val bad = df.select(
        kernel(col("sh_a"), col("sh_b")).as("got"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("want"))
      .filter(col("got") =!= col("want"))
    assert(bad.count() == 0)
    // null arrays are null, matching the composed form
    val n = Seq((null.asInstanceOf[Seq[String]], Seq("a")))
      .toDF("sh_a", "sh_b")
      .select(kernel(col("sh_a"), col("sh_b")).as("got"))
    assert(n.head().isNullAt(0))
  }

  test("randomized parity: 500 deterministic pseudo-random set pairs") {
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val rows = (0 until 500).map { k =>
      def set(salt: Long) = {
        val n = (mix(k * 31L + salt).abs % 40).toInt
        (0 until n).map(i =>
          "t" + (mix(k * 7L + salt * 13L + i).abs % 60)).distinct.sorted
      }
      (set(1L), set(2L))
    }
    val bad = rows.toDF("sh_a", "sh_b").select(
        kernel(col("sh_a"), col("sh_b")).as("got"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("want"))
      .filter(col("got") =!= col("want"))
    assert(bad.count() == 0)
  }

  test("long-array kernel == size(array_intersect) on sorted-distinct " +
    "int64 arrays (the containment tier-1 frame), incl. negative hashes " +
    "and Long.MinValue/MaxValue edges") {
    val longKernel =
      org.apache.spark.sql.graft.SortedLongIntersectSize.sortedLongIntersectSize _
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // randomized pairs over a small value domain (forced overlaps) with
    // signs mixed — xxhash64 emits the full int64 range
    val rand = (0 until 500).map { k =>
      def set(salt: Long) = {
        val n = (mix(k * 31L + salt).abs % 40).toInt
        (0 until n).map(i => mix(k * 7L + salt * 13L + i) % 60).distinct.sorted
      }
      (set(1L), set(2L))
    }
    val edges = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(Long.MinValue, -7L, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)),
      (Seq(-3L, -2L, -1L), Seq(-2L, 0L, 5L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)))
    val bad = (rand ++ edges).toDF("a", "b").select(
        longKernel(col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).as("want"))
      .filter(col("got") =!= col("want"))
    assert(bad.count() == 0)
    // null arrays stay null
    val n = Seq((null.asInstanceOf[Seq[Long]], Seq(1L)))
      .toDF("a", "b").select(longKernel(col("a"), col("b")).as("got"))
    assert(n.head().isNullAt(0))
    // and the REAL tier-1 frame: fixture shingle hashes, kernel equals
    // the composed spelling on the same sorted-distinct hash arrays
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val hs = docs.select(col("doc_id"),
      sort_array(array_distinct(transform(
        sort_array(array_distinct(TextFunctions.shingles(col("text"), 3))),
        x => xxhash64(x)))).as("hs"))
      .limit(60)
    val pairs = hs.toDF("id_a", "hs_a").crossJoin(hs.toDF("id_b", "hs_b"))
      .filter(col("id_a") < col("id_b"))
      .select(longKernel(col("hs_a"), col("hs_b")).as("got"),
        size(array_intersect(col("hs_a"), col("hs_b"))).as("want"))
    assert(pairs.filter(col("got") =!= col("want")).count() == 0)
    assert(pairs.filter(col("got") > 0).count() > 0, "vacuous fixture slice")
  }
}
