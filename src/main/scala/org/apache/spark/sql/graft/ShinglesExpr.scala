package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused word n-gram shingling: text → array of n-word shingles joined
  * by a single space, documents of ≤ n words shingling to the whole
  * joined document — BIT-IDENTICAL to the composed Catalyst form
  * {{{
  *   when(size(split(text, "\\s+")) <= n, array(array_join(toks, " ")))
  *     .otherwise(transform(sequence(1, size - (n-1)),
  *                          i => array_join(slice(toks, i, n), " ")))
  * }}}
  * which remains in [[graft.functions.TextFunctions.shinglesHof]] as the
  * parity witness (ShinglesParitySpec pins equality on the fixture
  * corpus plus the whitespace/empty/short edge cases).
  *
  * Why custom (SURVEY.md §4.3 promotion rule): the composed spelling
  * evaluates, PER DOCUMENT, a `sequence` allocation plus (len−n+1)
  * lambda frames each doing `slice` (array alloc) + `array_join`
  * (builder alloc) — measured at ~1.0 s of q_containment's 1.7 s sf0.1
  * budget, and it sits in the corpus-scan hot path of every shingle
  * consumer (the whole Jaccard/containment/minhash family). This
  * compiles to ONE static call per row doing a single regex split and
  * one StringBuilder pass per shingle.
  *
  * Split semantics are exactly Spark's `split(text, "\\s+")` (Java
  * `Pattern.split(s, -1)` — leading empty token preserved when the text
  * starts with whitespace, trailing empties kept by limit −1).
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width n=$n must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  // identical pattern to Spark's split(text, "\s+") path
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = ws.split(text.toString, -1)
    if (toks.length <= n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < toks.length) {
        if (i > 0) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      new GenericArrayData(Array[Any](UTF8String.fromString(sb.toString)))
    } else {
      val m = toks.length - n + 1
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column-API entry. */
  def shingles(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n))
}
