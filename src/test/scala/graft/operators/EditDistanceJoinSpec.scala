package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class EditDistanceJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d)).toSet

  private def got(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    EditDistanceJoin.editPairs(rows.toDF("id", "s"), "id", "s", k)
      .as[(Long, Long, Int)].collect().toSet

  // words with planted typo families: substitutions, deletions,
  // insertions, transposition (distance 2), duplicates, empties
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "spark", 2L -> "spork", 3L -> "sprk", 4L -> "sparks",
    5L -> "shark", 6L -> "sprak", 7L -> "catalyst", 8L -> "catalysts",
    9L -> "analyst", 10L -> "spark", 11L -> "", 12L -> "", 13L -> "a",
    14L -> "b", 15L -> "ab", 16L -> "completely-unrelated")

  test("k=1: blocked join equals the brute-force levenshtein join, " +
    "including distance-0 pairs of distinct ids") {
    val g = got(corpus, 1)
    assert(g == brute(corpus, 1))
    assert(g.contains((1L, 10L, 0)))   // identical strings
    assert(g.contains((11L, 12L, 0))) // empty strings pair at 0
  }

  test("k=2: two-deletion neighborhood covers substitution+substitution, " +
    "transpositions, and insert+delete shapes") {
    val g = got(corpus, 2)
    assert(g == brute(corpus, 2))
    assert(g.contains((1L, 6L, 2))) // spark vs sprak (transposition = 2)
    assert(g.contains((2L, 5L, 2))) // spork vs shark (two substitutions)
  }

  test("no nested-loop plan: candidates come from an equi join") {
    val plan = EditDistanceJoin.editPairs(
        corpus.toDF("id", "s"), "id", "s", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"deletion-neighborhood join must be equi, got:\n$plan")
  }
}
