package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object HilbertKernel {
  /** Hilbert curve index of cell (x, y) on the 2^bits × 2^bits grid —
    * the classic xy2d walk with quadrant rotation. */
  def index(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve's orientation lines up
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert-curve index over two pre-scaled long columns (cell
  * coordinates in [0, 2^bits)) with whole-stage codegen.
  *
  * Why custom: the Hilbert walk carries rotation STATE across bit
  * levels, so unlike the Morton z-value (graft.operators.Layout.zValue,
  * pure shift/mask arithmetic) it cannot be expressed as a flat column
  * expression; a Scala UDF would drop the surrounding Project out of
  * codegen. Hilbert ordering never jumps across the grid the way the
  * Z-curve's seam crossings do, so consecutive file ranges are tighter
  * rectangles — measurably fewer files per range filter at high
  * selectivity.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression with ExpectsInputTypes {

  require(bits > 0 && 2 * bits <= 62, s"bits=$bits out of range")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertKernel.index(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"org.apache.spark.sql.graft.HilbertKernel.index($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def column(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(
      HilbertIndex(ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits))
}
