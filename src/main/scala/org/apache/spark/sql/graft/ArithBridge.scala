package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Catalyst's integral division. The Column API exposes only
  * `/` (double division, which silently loses precision past 2^53 — fatal
  * for epoch-nanos magnitudes) while the SQL `div` operator has no Column
  * equivalent. Codegen'd long/long division, exact at any magnitude.
  */
object ArithBridge {

  /** `x div d` for long columns — exact integral division. */
  def longDiv(x: Column, d: Long): Column =
    ExpressionUtils.column(
      IntegralDivide(ExpressionUtils.expression(x), Literal(d)))
}
