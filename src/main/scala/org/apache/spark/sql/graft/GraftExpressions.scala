package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the graft engine.
  *
  * Hosted under `org.apache.spark.sql.*` because the expression SPI
  * (`AbstractDataType`, `ExpressionUtils.column`) is `private[sql]` in
  * Spark 4 — the standard packaging for third-party native expressions.
  * User-facing wrappers live in `graft.functions.VectorFunctions`.
  */
object GraftExpressions {

  /** Column-API entry: codegen'd cosine similarity over float arrays. */
  def cosineF(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Cosine similarity over two `array<float>` columns with whole-stage
  * codegen.
  *
  * Why custom (SURVEY.md §4.3 promotion rule): the composable form —
  * `aggregate(zip_with(a, b, *), 0d, +)` — materializes an intermediate
  * products array and evaluates lambda frames per element per row. At
  * 100 TB of high-dim embeddings that's billions of transient allocations
  * in the scan's hot loop. This compiles to one fused float loop (dot,
  * |a|², |b|² in a single pass) with zero per-row allocations.
  *
  * Accumulation is in Double over exactly-upcast floats, left-to-right —
  * bit-identical to the higher-order-function formulation it replaces.
  *
  * Two degenerate-input modes:
  *  - `strict = false` (pipeline default): zero-norm inputs yield 0.0
  *    (degenerate vectors never rank); null elements are assumed absent.
  *  - `strict = true` (what the CosineHofRewrite optimizer rule emits):
  *    NULL on zero norms and on any null element — exactly the
  *    dot/(|a|·|b|) HOF composition's semantics (non-ANSI divide-by-zero
  *    → NULL; null element poisons the fold), so the rewrite is
  *    result-preserving on every input.
  */
case class CosineSimilarity(left: Expression, right: Expression,
    strict: Boolean = false)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  // Ragged inputs (different lengths) yield NULL — matching the
  // zip_with/aggregate formulation and surfacing upstream data corruption
  // instead of scoring a truncated prefix.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    if (strict) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) { if (strict) null else 0.0 } else dot / denom
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val strictNullScan = if (strict) {
        s"""
           |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) ${ev.isNull} = true;
           |}
         """.stripMargin
      } else ""
      val zeroNorm = if (strict) s"${ev.isNull} = true" else s"${ev.value} = 0.0"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  $strictNullScan
         |  if (!${ev.isNull}) {
         |    double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $xi = (double) $a.getFloat($i);
         |      double $yi = (double) $b.getFloat($i);
         |      $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |    }
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($denom == 0.0) { $zeroNorm; } else { ${ev.value} = $dot / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}
