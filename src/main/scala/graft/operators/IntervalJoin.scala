package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join without an equi key, made shuffle-joinable by
  * temporal bucketing.
  *
  * The problem: `l.start <= r.end AND r.start <= l.end` is a pure theta
  * join. Catalyst's only plan for it is BroadcastNestedLoopJoin — O(|L|·|R|)
  * compares and one side fully broadcast, which is exactly the plan that
  * dies first at 100 TB (the reference's analytics surface has no answer
  * for this either; interval joins show up the moment sessions, incident
  * windows, or validity ranges meet).
  *
  * The fix is the standard grid-blocking rewrite: chop the timeline into
  * fixed-width buckets, explode each interval onto every bucket it covers,
  * and equi-join on the bucket id — a plain shuffle/broadcast hash join
  * that scales like any other key join. Two corrections restore exact
  * semantics:
  *
  *  - **Overlap residual**: intervals sharing a bucket need not overlap, so
  *    the exact predicate is re-applied after the equi match (cheap — it
  *    runs on bucket-local candidates only).
  *  - **Pair dedup WITHOUT distinct**: a pair overlapping across k shared
  *    buckets would emit k times. Instead of a dedup shuffle we keep a pair
  *    only in the bucket containing `greatest(l.start, r.start)` — the
  *    first instant both intervals are live. That bucket is covered by
  *    both sides exactly when they overlap, so each overlapping pair
  *    survives exactly once and the `distinct()` (a full extra exchange on
  *    the pair output) is never needed.
  *
  * Scale shape: cost is |L'| + |R'| exploded rows where each interval
  * contributes `len/width + 1` entries — pick `bucketWidth` near the upper
  * quantile of interval length so the blow-up stays ~2×. Skewed buckets
  * (everything overlapping one hot hour) behave like any skewed equi join
  * and fall to AQE skew splitting, which a nested-loop join could never
  * use.
  *
  * Bounds are `LongType` on a shared monotonic axis (epoch micros, epoch
  * seconds — anything uniform across both sides), non-negative, closed
  * intervals `[start, end]` with `start <= end`. The caller converts
  * timestamps; keeping the operator numeric dodges every timezone/NTZ
  * subtlety in one place.
  */
object IntervalJoin {

  private val Bucket = "graft_ij_bucket"

  /** All (left, right) row pairs whose closed intervals overlap. Output =
    * left columns then right columns (names must be disjoint). */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = left.col(lStart) <= right.col(rEnd) &&
      right.col(rStart) <= left.col(lEnd)
    // `div` truncates toward zero == floor for the non-negative bounds the
    // contract requires. (A double-division floor would corrupt near-2^53
    // epoch-nanos values; integral div is exact at any magnitude.)
    import org.apache.spark.sql.graft.ArithBridge.longDiv
    def buckets(start: Column, end: Column): Column =
      sequence(longDiv(start, bucketWidth), longDiv(end, bucketWidth))
    val lb = left.withColumn(Bucket, explode(buckets(col(lStart), col(lEnd))))
    val rb = right.withColumn(Bucket, explode(buckets(col(rStart), col(rEnd))))
    val firstShared =
      longDiv(greatest(lb.col(lStart), rb.col(rStart)), bucketWidth)
    lb.join(rb, lb.col(Bucket) === rb.col(Bucket) &&
        overlap && lb.col(Bucket) === firstShared)
      .drop(Bucket)
  }
}
