package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

object PqEncodeExpr {

  /** Column-API entry: fused product-quantization encode of an
    * `array<double>` vector against frozen codebooks. */
  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(v), codebooks))
}

/** Product-quantization encoder: `array<double>` of length m·dsub →
  * `array<int>` of m per-subspace nearest-codebook-centroid ids.
  *
  * Why custom (SURVEY.md §4.3 promotion rule): the composable encode —
  * explode each row into m subvectors, broadcast-join the m×ksub codebook
  * rows, `min_by` per (id, subspace), fold the codes back into an ordered
  * array — expands every row ×(m×ksub) map-side and pays TWO id-grain
  * shuffles (the argmin and the re-fold groupBys). At 100 TB build scale
  * those shuffles dominate the build. This expression is the whole encode
  * as one NARROW, whole-stage-codegen'd loop: m·ksub·dsub multiply-adds
  * per row, zero joins, zero shuffles, zero per-row allocations beyond
  * the m-int result.
  *
  * Tie-break: strict `<` keeps the FIRST (lowest-id) centroid on equal
  * distances — deterministic, matching the coarse assigner's
  * array_position first-match convention.
  *
  * Degenerate inputs surface rather than skew: a vector whose length is
  * not m·dsub, or with any null element, encodes to NULL (upstream
  * corruption must not silently map to arbitrary codes).
  *
  * The codebooks ride along as a flattened `double[]` reference object
  * (m·ksub·dsub values), not as literal source text — ksub=256 codebooks
  * would otherwise bloat the generated method past JIT limits.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with ExpectsInputTypes {

  private val m = codebooks.length
  private val ksub = codebooks.headOption.map(_.length).getOrElse(0)
  private val dsub =
    codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
  require(m > 0 && ksub > 0 && dsub > 0, "codebooks must be non-empty")
  require(codebooks.forall(b => b.length == ksub && b.forall(_.length == dsub)),
    "ragged codebooks: every subspace needs ksub centroids of dsub dims")

  // flat[(s*ksub + c)*dsub + j] = codebooks(s)(c)(j)
  private val flat: Array[Double] = {
    val out = new Array[Double](m * ksub * dsub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(codebooks(s)(c), 0, out, (s * ksub + c) * dsub, dsub)
        c += 1
      }
      s += 1
    }
    out
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != m * dsub) return null
    var i = 0
    while (i < m * dsub) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = x.getDouble(s * dsub + j) - flat(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val codes = ctx.freshName("codes")
      s"""
         |if ($a.numElements() != ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < ${m * dsub} && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i)) ${ev.isNull} = true;
         |  }
         |  if (!${ev.isNull}) {
         |    int[] $codes = new int[$m];
         |    for (int $s = 0; $s < $m; $s++) {
         |      int $best = 0;
         |      double $bestD = Double.MAX_VALUE;
         |      for (int $c = 0; $c < $ksub; $c++) {
         |        int $base = ($s * $ksub + $c) * $dsub;
         |        double $d = 0.0;
         |        for (int $j = 0; $j < $dsub; $j++) {
         |          double $diff = $a.getDouble($s * $dsub + $j) - $bookRef[$base + $j];
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $bestD) { $bestD = $d; $best = $c; }
         |      }
         |      $codes[$s] = $best;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}
