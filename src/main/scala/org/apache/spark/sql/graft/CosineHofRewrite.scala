package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the hand-written higher-order-function cosine
  * —
  * {{{
  *   aggregate(zip_with(a, b, (x, y) => double(x) * double(y)), 0d, _+_)
  *   / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  * }}}
  * — and replace it with the fused native [[CosineSimilarity]] kernel in
  * STRICT mode (NULL on zero norms / null elements — the HOF
  * composition's non-ANSI semantics, so under legacy eval the rewrite is
  * result-preserving on every input). Under ANSI eval (the Spark 4
  * default) the composition THROWS on a zero-norm vector — one degenerate
  * embedding kills a 100 TB job; the rewrite normalizes that edge to NULL
  * (the `try_divide` shape Spark itself recommends), which is this
  * engine's documented cosine contract. Non-degenerate rows are
  * bit-identical either way.
  *
  * Scope note: plans already collapsed by ConvertToLocalRelation
  * (literal local data) are evaluated before extra optimizer rules run
  * and are not rewritten — file-backed scans, the case that matters,
  * always are.
  *
  * Why a rule and not "use the native function": users writing plain
  * DataFrame code — or porting reference pipelines — express cosine the
  * composable way, which runs three interpreted lambda folds per row
  * (HigherOrderFunction is CodegenFallback). The engine should make the
  * declarative form fast rather than require users to know the kernel
  * exists; this is the same contract as Catalyst's own expression
  * rewrites. Installed via `GraftExtensions` (session extension) or
  * `GraftExtensions.install` (live session, `extraOptimizations`).
  */
object CosineHofRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Matches `aggregate(zip_with(a, b, (x, y) => double(x) * double(y)),
    * 0.0, (acc, v) => acc + v)` and returns (a, b). */
  private def dotOf(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(
            Multiply(
              Cast(x: NamedLambdaVariable, DoubleType, _, _),
              Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
            Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(
          Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
          Seq(acc2: NamedLambdaVariable, v2: NamedLambdaVariable), _),
        _)
      if x.exprId == x2.exprId && y.exprId == y2.exprId &&
        acc.exprId == acc2.exprId && v.exprId == v2.exprId =>
      Some((a, b))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case div @ Divide(dotE, Multiply(Sqrt(normA), Sqrt(normB), _), _) =>
      (dotOf(dotE), dotOf(normA), dotOf(normB)) match {
        case (Some((a, b)), Some((a1, a2)), Some((b1, b2)))
          if isFloatArray(a) && isFloatArray(b) &&
            a.semanticEquals(a1) && a.semanticEquals(a2) &&
            b.semanticEquals(b1) && b.semanticEquals(b2) =>
          CosineSimilarity(a, b, strict = true)
        case _ => div
      }
  }
}
