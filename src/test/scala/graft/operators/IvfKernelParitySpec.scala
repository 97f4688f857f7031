package graft.operators

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.IvfExpressions
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused native IVF kernels (r19) bit-equal to the composed
  * higher-order-function spellings the operators used before — normalize,
  * coarse argmin, residual subtract, squared distance — including the
  * composed forms' null/length-mismatch/NaN edge algebra (zip_with
  * padding, aggregate null folds, greatest's null-skip, array_min /
  * array_position first-match under Spark's NaN-greatest ordering). */
class IvfKernelParitySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 4
  private val cents: Array[Array[Double]] = Array(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0, 0.0),
    Array(0.5, 0.5, 0.5, 0.5),
    Array(0.5, 0.5, 0.5, 0.5)) // duplicate: ties must break to the LOWER id

  private def vecs = Seq(
    (0L, Array[java.lang.Float](1f, 2f, 3f, 4f)),
    (1L, Array[java.lang.Float](-1f, 0f, 0f, 0f)),
    (2L, Array[java.lang.Float](0f, 0f, 0f, 0f)),          // zero: divisor floor
    (3L, Array[java.lang.Float](0.5f, 0.5f, 0.5f, 0.5f)),  // exact tie vs lists 2/3
    (4L, Array[java.lang.Float](1f, null, 3f, 4f)),        // null element
    (5L, Array[java.lang.Float](1f, 2f)),                  // wrong length
    (6L, Array[java.lang.Float](Float.NaN, 1f, 1f, 1f)),   // NaN ordering
    (7L, Array[java.lang.Float](1e-9f, -1e-9f, 0f, 0f))    // tiny norm
  ).toDF("id", "vec").select(col("id"), col("vec").cast("array<float>").as("vec"))

  private def sameRows(a: Array[org.apache.spark.sql.Row],
                       b: Array[org.apache.spark.sql.Row], what: String): Unit = {
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x == y, s"$what mismatch: fused=$x composed=$y")
    }
  }

  test("l2Normalize == composed nvecExpr (bitwise, incl. null/NaN/short rows)") {
    val fused = vecs.select(col("id"),
      IvfExpressions.l2Normalize(col("vec")).as("n")).orderBy("id").collect()
    val hof = vecs.select(col("id"),
      IvfIndex.nvecExprHof("vec").as("n")).orderBy("id").collect()
    // compare via double bits so -0.0 vs 0.0 and NaN payloads count
    fused.zip(hof).foreach { case (f, h) =>
      val fs = Option(f.getSeq[java.lang.Double](1)).map(_.map(d =>
        if (d == null) null else java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(d))))
      val hs = Option(h.getSeq[java.lang.Double](1)).map(_.map(d =>
        if (d == null) null else java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(d))))
      assert(fs == hs, s"id=${f.getLong(0)}: fused=$fs composed=$hs")
    }
  }

  test("coarseAssign == composed assignExpr (first-match ties, null rows)") {
    val nv = vecs.select(col("id"),
      IvfIndex.nvecExprHof("vec").as("graft_nvec"))
    val fused = nv.select(col("id"),
      IvfExpressions.coarseAssign(col("graft_nvec"), cents).as("l"))
      .orderBy("id").collect()
    val hof = nv.select(col("id"),
      IvfPqIndex.assignExprHof(cents).as("l")).orderBy("id").collect()
    sameRows(fused, hof, "coarseAssign")
    // the duplicate-centroid tie must break to list 2, not 3
    val tie = fused.find(_.getLong(0) == 3L).get
    assert(!tie.isNullAt(1) && tie.getInt(1) == 2)
  }

  test("arrayDist2 == composed dist2Expr incl. list-centroid lookup shape") {
    val centLit = typedLit(cents.toIndexedSeq.map(_.toIndexedSeq))
    val nv = vecs.select(col("id"),
      IvfIndex.nvecExprHof("vec").as("graft_nvec"))
      .withColumn("list_id", IvfPqIndex.assignExprHof(cents))
    val fused = nv.select(col("id"),
      IvfIndex.dist2Expr(col("graft_nvec"),
        element_at(centLit, col("list_id") + 1)).as("d")).orderBy("id").collect()
    val hof = nv.select(col("id"),
      IvfIndex.dist2ExprHof(col("graft_nvec"),
        element_at(centLit, col("list_id") + 1)).as("d")).orderBy("id").collect()
    fused.zip(hof).foreach { case (f, h) =>
      val fb = if (f.isNullAt(1)) null
        else java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(f.getDouble(1)))
      val hb = if (h.isNullAt(1)) null
        else java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(h.getDouble(1)))
      assert(fb == hb, s"id=${f.getLong(0)}: fused=$fb composed=$hb")
    }
  }

  test("zipSubtract == composed residualCol (zip_with padding verbatim)") {
    val withId = cents.zipWithIndex.map { case (c, i) => (i, c) }
    val nv = vecs.select(col("id"),
      IvfIndex.nvecExprHof("vec").as("graft_nvec"))
      .withColumn("list_id", IvfPqIndex.assignExprHof(cents))
      .filter(col("list_id").isNotNull)
    val fused = nv.select(col("id"),
      IvfExpressions.zipSubtract(
        col("graft_nvec"),
        element_at(typedLit(withId.sortBy(_._1).map(_._2.toSeq).toSeq),
          col("list_id") + 1)).as("r")).orderBy("id").collect()
    val hof = nv.select(col("id"),
      IvfPqIndex.residualColHof(withId).as("r")).orderBy("id").collect()
    // bit-compare elements: Seq[Double] == is false for NaN vs NaN
    fused.zip(hof).foreach { case (f, h) =>
      def bits(r: org.apache.spark.sql.Row) =
        Option(r.getSeq[java.lang.Double](1)).map(_.map(d =>
          if (d == null) null
          else java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(d))))
      assert(bits(f) == bits(h),
        s"zipSubtract mismatch id=${f.getLong(0)}: fused=${bits(f)} composed=${bits(h)}")
    }
  }
}
