package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], l: Int): Map[Long, String] =
    SubstringDedup.dedupSubstrings(docs.toDF("doc_id", "text"), "doc_id", "text", l)
      .as[(Long, String)].collect().toMap

  test("a duplicated span survives only in its most-senior doc; unique prose stays") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared four five"),
      (3L, "completely unrelated text with no duplication at all here"))
    val out = run(docs, l = 6)
    assert(out(1L) == docs(0)._2, "senior occurrence must keep the span")
    assert(out(2L) == "one two three four five",
      s"junior occurrence must lose exactly the span, got '${out(2L)}'")
    assert(out(3L) == docs(2)._2, "untouched doc must round-trip verbatim")
  }

  test("overlapping duplicated windows union into one long removed span") {
    // a 12-token duplicated run with l=6: windows at 7 starts, all
    // overlapping — the junior copy must lose all 12 tokens, not 6
    val long = "a b c d e f g h i j k l"
    val docs = Seq(
      (1L, s"$long"),
      (2L, s"x y $long z w"))
    val out = run(docs, l = 6)
    assert(out(1L) == long)
    assert(out(2L) == "x y z w", s"got '${out(2L)}'")
  }

  test("within-doc repetition collapses to the first copy") {
    val docs = Seq((1L, "p q r s t u p q r s t u tail"))
    val out = run(docs, l = 6)
    assert(out(1L) == "p q r s t u tail", s"got '${out(1L)}'")
  }

  test("docs shorter than the window pass through; a fully-duplicated doc empties") {
    val docs = Seq(
      (1L, "tiny doc"),
      (2L, "m n o p q r"),
      (3L, "m n o p q r"))
    val out = run(docs, l = 6)
    assert(out(1L) == "tiny doc")
    assert(out(2L) == "m n o p q r", "senior full-doc copy survives")
    assert(out(3L) == "", "junior full-doc copy empties")
  }

  test("deterministic across partitionings") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 4 == 0) "shared span one two three four five six plus " + i
          else s"unique words $i " + (1 to 10).map(j => s"w$i-$j").mkString(" ")))
    val a = SubstringDedup.dedupSubstrings(
      docs.toDF("doc_id", "text"), "doc_id", "text", 6)
      .as[(Long, String)].collect().toMap
    val b = SubstringDedup.dedupSubstrings(
      docs.toDF("doc_id", "text").repartition(7), "doc_id", "text", 6)
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }
}
