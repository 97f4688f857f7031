package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code (Scala
  * objects emit static forwarders, so generated Java calls
  * `NormalizeKernel.normalize(...)` directly). */
object NormalizeKernel {
  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    // fast path: already-normalized text (all of ASCII) skips the
    // normalizer's allocation entirely — the common case scanning a
    // mostly-ASCII corpus
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd expression.
  *
  * Why custom: Spark ships no normalization function, and a Scala UDF
  * would drop the surrounding Project out of whole-stage codegen and pay
  * closure serialization per task. Canonicalizing text before hashing /
  * dedup is mandatory at corpus scale — visually-identical strings with
  * different codepoint sequences (composed vs decomposed accents) must
  * fingerprint identically or near-dup recall silently drops.
  */
case class NormalizeString(child: Expression, form: String = "NFC")
  extends UnaryExpression with ExpectsInputTypes {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form $form")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(input: Any): Any =
    NormalizeKernel.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.graft.NormalizeKernel.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): NormalizeString =
    copy(child = newChild)
}

object NormalizeString {
  def apply(c: Column, form: String): Column =
    ExpressionUtils.column(NormalizeString(ExpressionUtils.expression(c), form))
}
