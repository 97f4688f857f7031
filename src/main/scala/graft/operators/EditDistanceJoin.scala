package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance (Levenshtein) pair join by DELETION-NEIGHBORHOOD
  * blocking — the FastSS/SymSpell scheme (Bocek et al. 2007) re-expressed
  * as a Spark plan.
  *
  * The naive formulation `a ⋈ b ON levenshtein(a,b) <= k` is a theta join:
  * O(n²) string comparisons and a nested-loop plan. The blocking identity:
  * if lev(a,b) <= k, an optimal alignment has s substitutions + i
  * insertions + d deletions with s+i+d <= k; deleting a's substituted and
  * deleted positions (s+d <= k deletions) and b's substituted and inserted
  * positions (s+i <= k) reaches the SAME string — so a and b share a
  * member of their ≤k-deletion neighborhoods, and an equi join on
  * neighborhood members finds every qualifying pair (no recall argument;
  * the exact levenshtein then removes the false positives). Neighborhood
  * size is C(len, <=k) — len+1 variants at k=1, ~len²/2 at k=2 — so the
  * exploded table is a small constant factor of the input, never
  * quadratic.
  *
  * Variants are joined as xxhash64 keys: an 8-byte shuffle key instead of
  * a string, and hash collisions are HARMLESS (a colliding pair is just
  * one extra candidate the exact-distance filter kills).
  *
  * Skew note: a variant shared by many strings (a hot prefix family)
  * produces a quadratic bucket the same way any equi-join key does —
  * mitigate with the standard tools (AQE skew split; or pre-cap buckets
  * the way Dedup.dedupAgainst does) rather than inside this operator.
  */
object EditDistanceJoin {

  /** All (id_a, id_b, dist) pairs with id_a < id_b and
    * levenshtein <= maxDist (0 included: distinct ids with identical
    * strings). maxDist in {1, 2} — neighborhood size at k>=3 stops being
    * the cheap option and LSH-family blocking takes over. */
  def editPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2, got $maxDist")
    def del1(c: Column): Column =
      when(length(c) > 0,
        array_distinct(concat(
          array(c),
          transform(sequence(lit(1), length(c)), i =>
            concat(c.substr(lit(1), i - lit(1)),
              c.substr(i + lit(1), length(c)))))))
        .otherwise(array(c))
    val variants =
      if (maxDist == 1) del1(col("graft_s"))
      else array_distinct(flatten(transform(del1(col("graft_s")), v => del1(v))))
    val side = df
      .select(col(idCol).as("graft_id"), col(strCol).as("graft_s"))
      .withColumn("graft_h", explode(variants))
      .select(col("graft_id"), col("graft_s"), xxhash64(col("graft_h")).as("graft_h"))
    side.as("l")
      .join(side.as("r"),
        col("l.graft_h") === col("r.graft_h") &&
          col("l.graft_id") < col("r.graft_id"))
      .select(
        col("l.graft_id").as("id_a"), col("r.graft_id").as("id_b"),
        col("l.graft_s").as("graft_sa"), col("r.graft_s").as("graft_sb"))
      .distinct() // a pair can share many variants; one exact check each
      .select(col("id_a"), col("id_b"),
        levenshtein(col("graft_sa"), col("graft_sb")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
