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

/** |A ∩ B| over two SORTED-ascending int64 arrays with distinct non-null
  * elements — the [[SortedIntersectSize]] merge walk on primitive longs:
  * no UTF8String comparisons at all, one branchy scan over packed longs.
  *
  * Used as the TIER-1 verify of the containment near-dup family (r16):
  * candidate pairs first intersect their per-doc xxhash64 shingle-hash
  * arrays (~6× lighter through the pair-table shuffles than the string
  * arrays, and long-compare beats string-compare), which — given per-doc
  * hash injectivity, checked at build — is a provable UPPER bound on the
  * true string intersection; only the tiny survivor set pays the exact
  * string verify. Exactness is unconditional: the caller falls back to
  * the all-string path when any doc's hashes collide (never observed —
  * needs an intra-doc 64-bit collision).
  *
  * Contract mirrors [[SortedIntersectSize]]: sorted ascending, distinct,
  * null elements skipped defensively, null arrays → null.
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersectSize.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"org.apache.spark.sql.graft.SortedLongIntersectSize.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectSize {

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
        val va = a.getLong(i)
        val vb = b.getLong(j)
        if (va == vb) { c += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
    }
    c
  }

  /** Column-API entry. */
  def sortedLongIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
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
