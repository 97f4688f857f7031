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

  /** Salted equi-join: each fact row gets a salt in [0, buckets); the dim
    * side is replicated `buckets` times; the join key becomes
    * (key, salt). Each hot key's rows spread over `buckets` partitions.
    *
    * Use when: dim is too big to broadcast AND fact keys are heavily
    * skewed. Cost: dim shuffles `buckets`× its size — keep buckets small
    * (8–32).
    *
    * Salt source: `saltFrom` (any row-level expression — a unique id
    * spreads a hot key uniformly via xxhash64, and the result is
    * DETERMINISTIC across runs and partitionings, which is what lets
    * q_join_salted hash-match its oracle). Without it, a seeded rand —
    * fine for spreading, but per-row salt values depend on partitioning.
    * Correctness never depends on the salt either way: every fact row
    * meets its key's full dim row set exactly once (its one salt
    * replica), so the result is row-identical to the plain join — the
    * q_join_salted oracle is the PLAIN join SQL, proving the rewrite
    * semantically free. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      buckets: Int = 16,
      joinType: String = "inner",
      saltFrom: Option[org.apache.spark.sql.Column] = None): DataFrame = {

    require(buckets > 0)
    // replicate-the-dim is only sound when unmatched DIM rows don't
    // surface: a right/full outer join would emit every unmatched dim row
    // once per salt copy
    require(
      Set("inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left-preserving join types, got $joinType")
    val saltCol = saltFrom match {
      case Some(c) => pmod(xxhash64(c), lit(buckets.toLong)).cast("int")
      case None => (rand(42) * buckets).cast("int")
    }
    val salted = fact.withColumn("graft_salt", saltCol)
    val replicated = dim.withColumn("graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "graft_salt"), joinType).drop("graft_salt")
  }

  /** Skew DIAGNOSIS — the report that decides between broadcast, AQE and
    * [[saltedJoin]] before a job ships: the `topN` heaviest keys with
    * their row share, their ratio over the mean key size, and the salt
    * bucket count that would level each one (ceil of that ratio,
    * integer-exact ceil-div so the number is reproducible anywhere).
    * One count aggregate + one k-row bounded-heap cut + a 1-row totals
    * broadcast — key-cardinality-sized work, corpus-sized only in the
    * first scan. */
  def report(
      df: DataFrame,
      keyCols: Seq[String],
      topN: Int = 10): DataFrame = {
    require(keyCols.nonEmpty && topN > 0)
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum("n").as("graft_total"), count(lit(1)).as("graft_keys"))
    val heavy = TopK.perKey(
        counts.select(lit(1).as("graft_one"),
          col("n"), struct(keyCols.map(col): _*).as("graft_k")),
        keys = Seq("graft_one"), ordering = Seq("n", "graft_k"), k = topN)
      .select(keyCols.map(c => col(s"graft_k.$c")) :+ col("n"): _*)
    heavy.crossJoin(broadcast(totals))
      .select(keyCols.map(col) ++ Seq(
        col("n"),
        round(col("n") / col("graft_total"), 6).as("share"),
        round(col("n") * col("graft_keys") / col("graft_total"), 2)
          .as("skew_ratio"),
        expr("(n * graft_keys + graft_total - 1) div graft_total")
          .as("suggested_salt")): _*)
  }
}
