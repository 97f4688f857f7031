package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot-key joins at scale.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) is the first line of
  * defense and needs no code. Salting is the explicit fallback for the
  * pathological case AQE can't fix: a single join key so hot that one
  * shuffle partition exceeds executor memory (the "null key" / "empty doc"
  * problem at 100 TB).
  */
object Skew {

  /** Salted equi-join: the fact side gets a random salt in [0, buckets);
    * the dim side is replicated `buckets` times; the join key becomes
    * (key, salt). Each hot key's rows spread over `buckets` partitions.
    *
    * Use when: dim is too big to broadcast AND fact keys are heavily
    * skewed. Cost: dim shuffles `buckets`× its size — keep buckets small
    * (8–32).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {

    require(buckets > 0)
    // replicate-the-dim is only sound when unmatched DIM rows don't
    // surface: a right/full outer join would emit every unmatched dim row
    // once per salt copy
    require(
      Set("inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left-preserving join types, got $joinType")
    val salted = fact.withColumn("graft_salt", (rand(42) * buckets).cast("int"))
    val replicated = dim.withColumn("graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "graft_salt"), joinType).drop("graft_salt")
  }
}
