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

  test("zValue clamps values outside the computed bounds (late appends)") {
    val z = Seq(-5, 100).toDF("x")
      .select(Layout.zValue(Seq(col("x")), Seq((0.0, 64.0)), 4).as("z"))
      .as[Long].collect()
    assert(z.toSeq == Seq(0L, 15L))
  }
}
