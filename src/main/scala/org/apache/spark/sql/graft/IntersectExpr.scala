package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** |A ∩ B| over two SORTED-ascending string arrays with distinct
  * elements — a zero-allocation two-pointer merge walk, BIT-IDENTICAL in
  * result to `size(array_intersect(a, b))` on such inputs (parity pinned
  * in IntersectSizeSpec, including against unsorted-input array_intersect
  * on the same sets).
  *
  * Why custom (SURVEY.md §4.3 promotion rule): the near-dup verify joins
  * (PPJoin Jaccard family + directional containment) spend their time in
  * `array_intersect`, which builds a hash set AND materializes the
  * intersection ARRAY per candidate pair only for `size(...)` to read
  * its length — measured as the dominant slice of q_containment's warm
  * cost. The shingle-set caches are sorted ONCE at build
  * (`sort_array`, Spark's binary UTF8String order — the same order this
  * walk compares by), so every verify afterwards is one comparison scan,
  * no hashing, no allocation.
  *
  * Contract: both inputs sorted ascending in Spark's string order with
  * distinct non-null elements (what `sort_array(array_distinct(...))`
  * yields). Null ELEMENTS are skipped defensively (the shingle pipeline
  * never produces them; `array_intersect` would match null==null, a
  * semantics no set in this family carries). Null ARRAYS → null.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"org.apache.spark.sql.graft.SortedIntersectSize.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {

  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  /** Column-API entry. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
