package graft.operators

import java.nio.file.Files

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue interleaves bits: both dimensions contribute locality") {
    // 2 cols × 2 bits: z of (x, y) on [0,4) is the standard 4×4 Morton curve
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 3)).toDF("x", "y")
    val z = df.select(
      Layout.zValue(Seq(col("x"), col("y")), Seq((0.0, 4.0), (0.0, 4.0)), 2).as("z"))
      .as[Long].collect()
    assert(z.toSeq == Seq(0L, 1L, 2L, 3L, 15L))
  }

  test("z-ordered layout concentrates BOTH filter dimensions into few files") {
    val n = 4096
    // independent dimensions (a 64×64 grid) — correlated dims would let
    // a single-column sort accidentally localize both
    val rows = (0 until n).map { i => (i % 64, i / 64, i) }
    val df = rows.toDF("a", "b", "payload")
    val base = Files.createTempDirectory("graft_layout").toString
    val plainPath = s"$base/plain"
    val zPath = s"$base/zorder"
    val nFiles = 16
    // baseline: sorted by `a` only — filters on `b` hit every file
    df.repartitionByRange(nFiles, col("a")).sortWithinPartitions("a")
      .write.parquet(plainPath)
    Layout.writeZOrdered(df, Seq("a", "b"), zPath, nFiles)

    def filesHit(path: String, c: String): Long =
      spark.read.parquet(path).filter(col(c) === 17)
        .select(input_file_name()).distinct().count()

    // same data back
    assert(spark.read.parquet(zPath).count() == n)
    assert(spark.read.parquet(zPath).agg(sum("payload")).head().getLong(0) ==
      rows.map(_._3.toLong).sum)

    // the a-sorted baseline is perfect on `a` but touches ~all files on `b`
    val plainB = filesHit(plainPath, "b")
    // z-order: BOTH dimensions localize to a strict subset of files
    val zA = filesHit(zPath, "a")
    val zB = filesHit(zPath, "b")
    assert(plainB >= nFiles - 2, s"baseline should scatter b (hit $plainB)")
    assert(zA <= nFiles / 2, s"z-order should localize a (hit $zA of $nFiles)")
    assert(zB <= nFiles / 2, s"z-order should localize b (hit $zB of $nFiles)")
  }

  test("hilbert kernel: indexes are a bijection and consecutive indexes " +
    "are grid-adjacent (the property Morton lacks)") {
    import org.apache.spark.sql.graft.HilbertKernel
    val bits = 3 // 8×8 grid
    val cells = for { x <- 0 until 8; y <- 0 until 8 }
      yield (HilbertKernel.index(x.toLong, y.toLong, bits), (x, y))
    assert(cells.map(_._1).sorted == (0L until 64L),
      "hilbert indexes must be a bijection onto [0, 4^bits)")
    val walk = cells.sortBy(_._1).map(_._2)
    walk.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("hilbert layout localizes range filters into no more files than " +
    "z-order on an independent-dims grid") {
    val n = 4096
    val rows = (0 until n).map { i => (i % 64, i / 64, i) }
    val df = rows.toDF("a", "b", "payload")
    val base = Files.createTempDirectory("graft_hilbert").toString
    val zPath = s"$base/zorder"
    val hPath = s"$base/hilbert"
    // 12 files: NOT quadrant-aligned, so Morton's seam crossings make some
    // file ranges span distant rectangles while Hilbert's stay contiguous
    val nFiles = 12
    Layout.writeZOrdered(df, Seq("a", "b"), zPath, nFiles)
    Layout.writeHilbertOrdered(df, Seq("a", "b"), hPath, nFiles)

    // same data back
    assert(spark.read.parquet(hPath).count() == n)
    assert(spark.read.parquet(hPath).agg(sum("payload")).head().getLong(0) ==
      rows.map(_._3.toLong).sum)

    def filesHit(path: String, c: String, lo: Int, hi: Int): Long =
      spark.read.parquet(path).filter(col(c) >= lo && col(c) <= hi)
        .select(input_file_name()).distinct().count()

    for (c <- Seq("a", "b"); (lo, hi) <- Seq((10, 20), (40, 50))) {
      val z = filesHit(zPath, c, lo, hi)
      val h = filesHit(hPath, c, lo, hi)
      assert(h <= z, s"hilbert hit $h files on $c∈[$lo,$hi], z-order only $z")
      assert(h <= nFiles - 2, s"hilbert failed to localize $c∈[$lo,$hi] ($h/$nFiles)")
    }
  }

  test("graft_hilbert is callable from SQL over pre-scaled cell coords") {
    graft.GraftExtensions.install(spark)
    val out = spark.sql(
      "SELECT graft_hilbert(CAST(0 AS LONG), CAST(1 AS LONG), 2) AS h")
      .as[Long].head()
    // (0,1) is the fourth cell of this orientation's 4×4 walk — pinned to
    // match the kernel (HilbertKernel.index(0,1,2) == 3)
    assert(out == 3L)
  }

  test("zValue clamps values outside the computed bounds (late appends)") {
    val z = Seq(-5, 100).toDF("x")
      .select(Layout.zValue(Seq(col("x")), Seq((0.0, 64.0)), 4).as("z"))
      .as[Long].collect()
    assert(z.toSeq == Seq(0L, 15L))
  }
}
