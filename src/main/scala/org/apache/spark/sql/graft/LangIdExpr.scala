package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID scoring over a token array: one pass, per-token
  * cleanup (lowercase, letters only) done with a char loop instead of the
  * interpreted regexp-in-lambda the composed form pays, marker lookup via
  * hash sets. Semantics match TextFunctions.langId exactly: argmax marker
  * hits; ties → lexicographically last language; no hits → "und".
  *
  * Codegen emits a single static call — the heavy lifting lives in
  * [[LangIdExpr.score]], so the expression stays inside whole-stage
  * codegen with no Janino blowup.
  */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType

  @transient private lazy val table: LangIdExpr.Markers = LangIdExpr.buildTable(markers)

  override def nullSafeEval(input: Any): Any =
    LangIdExpr.score(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("langMarkers", table,
      classOf[LangIdExpr.Markers].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.LangIdExpr.score($c, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_lang_id"
}

object LangIdExpr {

  /** langs sorted ascending; sets hold cleaned marker tokens. */
  final class Markers(
      val langs: Array[UTF8String],
      val sets: Array[java.util.HashSet[String]]) extends Serializable

  private[graft] def buildTable(markers: Seq[(String, Seq[String])]): Markers = {
    val sorted = markers.sortBy(_._1)
    new Markers(
      sorted.map(m => UTF8String.fromString(m._1)).toArray,
      sorted.map { case (_, ws) =>
        val s = new java.util.HashSet[String]()
        ws.foreach(w => s.add(w))
        s
      }.toArray)
  }

  private val UND = UTF8String.fromString("und")

  /** Static scorer invoked from both interpreted eval and generated code. */
  def score(tokens: ArrayData, m: Markers): UTF8String = {
    val hits = new Array[Int](m.langs.length)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val raw = tokens.getUTF8String(i).toString
        sb.setLength(0)
        var j = 0
        while (j < raw.length) {
          val ch = raw.charAt(j)
          if (Character.isLetter(ch)) sb.append(Character.toLowerCase(ch))
          j += 1
        }
        val cleaned = sb.toString
        var l = 0
        while (l < m.sets.length) {
          if (m.sets(l).contains(cleaned)) hits(l) += 1
          l += 1
        }
      }
      i += 1
    }
    // argmax; ties → lexicographically LAST lang (>= over ascending langs)
    var best = -1
    var bestHits = 0
    var l = 0
    while (l < hits.length) {
      if (hits(l) > 0 && hits(l) >= bestHits) { best = l; bestHits = hits(l) }
      l += 1
    }
    if (best < 0) UND else m.langs(best)
  }
}
