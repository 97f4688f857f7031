package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarity, HilbertIndex, HyperplaneSig, MinHashSig, MinHashTextSig, NormalizeString, ShingleHashes, SimHash64, TopKAgg}
import org.apache.spark.sql.catalyst.expressions.Literal

/** Engine extension point: registers graft's native expressions with a
  * SparkSession so SQL text can use them
  * (`SELECT graft_cosine(a.embedding, b.embedding) ...`).
  *
  * Install either at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions` — or into a live
  * session with `GraftExtensions.install(spark)` (what Verify/Bench use,
  * since the session is driver-owned there).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      e.injectFunction((ident, info, builder))
    }
    e.injectOptimizerRule(_ => org.apache.spark.sql.graft.CosineHofRewrite)
  }
}

object GraftExtensions {

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a literal, got $other")
  }

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        FunctionIdentifier("graft_cosine"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_cosine expects (array<float>, array<float>)")
          CosineSimilarity(args.head, args(1))
        }),
      (
        FunctionIdentifier("graft_minhash"),
        new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "graft_minhash expects (array<string>, numHashes, seed)")
          MinHashSig(args.head, litLong(args(1), "numHashes").toInt, litLong(args(2), "seed"))
        }),
      (
        FunctionIdentifier("graft_simhash"),
        new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_simhash expects (array<string>, seed)")
          SimHash64(args.head, litLong(args(1), "seed"))
        }),
      (
        FunctionIdentifier("graft_hyperplane_sig"),
        new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hyperplane_sig"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "graft_hyperplane_sig expects (array<float>, planes, seed)")
          HyperplaneSig(args.head, litLong(args(1), "planes").toInt, litLong(args(2), "seed"))
        }),
      (
        FunctionIdentifier("graft_minhash_text"),
        new ExpressionInfo(classOf[MinHashTextSig].getName, "graft_minhash_text"),
        (args: Seq[Expression]) => {
          require(args.length == 4,
            "graft_minhash_text expects (text, shingleN, numHashes, seed)")
          MinHashTextSig(args.head, litLong(args(1), "shingleN").toInt,
            litLong(args(2), "numHashes").toInt, litLong(args(3), "seed"))
        }),
      (
        FunctionIdentifier("graft_shingle_hashes"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "graft_shingle_hashes expects (text, n, seed)")
          ShingleHashes(args.head, litLong(args(1), "n").toInt, litLong(args(2), "seed"))
        }),
      (
        FunctionIdentifier("graft_normalize"),
        new ExpressionInfo(classOf[NormalizeString].getName, "graft_normalize"),
        (args: Seq[Expression]) => {
          require(args.length == 1 || args.length == 2,
            "graft_normalize expects (text[, form])")
          val form = if (args.length == 2) args(1) match {
            case Literal(v, _) => v.toString
            case other => throw new IllegalArgumentException(
              s"form must be a literal string, got $other")
          } else "NFC"
          NormalizeString(args.head, form)
        }),
      (
        FunctionIdentifier("graft_hilbert"),
        new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
        (args: Seq[Expression]) => {
          require(args.length == 3,
            "graft_hilbert expects (x, y, bits) with pre-scaled long cell coords")
          HilbertIndex(args.head, args(1), litLong(args(2), "bits").toInt)
        }),
      (
        FunctionIdentifier("graft_top_k"),
        new ExpressionInfo(classOf[TopKAgg].getName, "graft_top_k"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_top_k expects (struct, k)")
          // returning the AggregateFunction directly — the analyzer wraps
          // it in an AggregateExpression when used in an agg context
          TopKAgg(args.head, litLong(args(1), "k").toInt)
        }))

  /** Register into an already-built session (functions + the HOF-cosine
    * optimizer rewrite). Idempotent. */
  def install(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    val rule = org.apache.spark.sql.graft.CosineHofRewrite
    if (!spark.experimental.extraOptimizations.contains(rule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    }
  }
}
