package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The full custom-operator path (SURVEY.md §4.3 tier (c)): a dedicated
  * LOGICAL node, a planner STRATEGY, and a PHYSICAL merge as-of join —
  * the extension surface a whole-operator semantic needs when no
  * composition of built-ins expresses it directly.
  *
  * Semantics: for each left row, attach the `valueAttrs` of the LATEST
  * right row with equal keys and `rightTs <= leftTs` (NULLs when none) —
  * identical to `graft.operators.AsOfJoin.asof` (union + window) and to
  * DuckDB's `ASOF LEFT JOIN`. NULL keys or a NULL timestamp never match
  * (SQL equality semantics).
  *
  * Physical shape: both children hash-clustered on the equi keys and
  * sorted by (keys, ts) — declared via requiredChildDistribution /
  * requiredChildOrdering, so EnsureRequirements plans the exchanges and
  * in-partition sorts, AQE included. Execution is a single streaming
  * merge pass per partition: O(|L|+|R|), no window buffer, no union
  * materialization, and the only retained state is ONE candidate right
  * row per key.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    valueAttrs: Seq[Attribute]) extends BinaryNode {

  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty)
  // The exec's orderings are built from the LEFT side's types and applied
  // to both sides — a type mismatch would surface as a runtime
  // ClassCastException (or a silent miscompare) deep in the merge loop
  // instead of an analysis-time error, so check here.
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of join key type mismatch: ${l.name}: ${l.dataType} vs ${r.name}: ${r.dataType}")
  }
  require(leftTs.dataType == rightTs.dataType,
    s"as-of join timestamp type mismatch: ${leftTs.name}: ${leftTs.dataType} " +
      s"vs ${rightTs.name}: ${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ valueAttrs.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, vals) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, vals) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    valueAttrs: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ valueAttrs.map(_.withNullability(true))

  override def outputPartitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val numVals = valueAttrs.size
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rightOut)
      val lTsBound = BindReferences.bindReference[org.apache.spark.sql.catalyst.expressions.Expression](leftTs, org.apache.spark.sql.catalyst.expressions.AttributeSeq(leftOut))
      val rTsBound = BindReferences.bindReference[org.apache.spark.sql.catalyst.expressions.Expression](rightTs, org.apache.spark.sql.catalyst.expressions.AttributeSeq(rightOut))
      val valProj = UnsafeProjection.create(valueAttrs, rightOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val joiner = new JoinedRow
      val nullVals = new GenericInternalRow(numVals)

      new Iterator[InternalRow] {
        private var rNext: InternalRow = advanceRight()
        // candidate = latest right row seen whose (key, ts) is behind the
        // current left cursor; stale candidates are detected by key compare
        private var candKey: InternalRow = null
        private var candVals: InternalRow = null

        private def advanceRight(): InternalRow = {
          // skip right rows whose key or ts is NULL — they can match nothing
          while (rIter.hasNext) {
            val r = rIter.next()
            if (!rKeyProj(r).anyNull && rTsBound.eval(r) != null) return r
          }
          null
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTsV = lTsBound.eval(l)
          if (lKey.anyNull || lTsV == null) {
            resultProj(joiner(l, nullVals))
          } else {
            var continue = rNext != null
            while (continue) {
              val rKey = rKeyProj(rNext)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) {
                rNext = advanceRight()
              } else if (c == 0 && tsOrd.lteq(rTsBound.eval(rNext), lTsV)) {
                candKey = rKey.copy()
                candVals = valProj(rNext).copy()
                rNext = advanceRight()
              } else {
                continue = false
              }
              if (rNext == null) continue = false
            }
            val matched = candKey != null && keyOrd.compare(candKey, lKey) == 0
            resultProj(joiner(l, if (matched) candVals else nullVals))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry (hosted here because `Dataset.ofRows` and the
  * planner hooks are `private[sql]`). Registers the strategy on the
  * session idempotently. */
object AsOfJoinApi {

  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    // Re-alias every right column: when both sides share lineage (the
    // common case — two filters of one table), the analyzer's
    // DeduplicateRelations re-ids the right subtree's pass-through
    // attributes, which would silently strand this node's stored
    // right-side references. Aliases KEEP their exprIds through that
    // rewrite, so anchoring on a fresh top-level alias per column makes
    // the node immune to it.
    val rAliased = right.select(
      right.columns.map(c => org.apache.spark.sql.functions.col(c).as(c)).toSeq: _*)
    val rPlan = rAliased.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(",")}]"))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      keyCols.map(attr(lPlan, _)), keyCols.map(attr(rPlan, _)),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      valueCols.map(attr(rPlan, _)))
    org.apache.spark.sql.classic.Dataset.ofRows(spark, node)
  }
}
