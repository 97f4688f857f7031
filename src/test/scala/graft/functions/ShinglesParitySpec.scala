package graft.functions

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native fused WordShingles kernel carries the oracle contract of
  * the composed split/sequence/slice/array_join form (20+ oracle-gated
  * queries shingle through it), so the two must be BIT-IDENTICAL — on
  * the fixture corpus and on the whitespace edge cases where Java
  * Pattern.split semantics (leading empty token, limit −1) could
  * plausibly diverge. */
class ShinglesParitySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def assertParity(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    val diff = df
      .select(
        TextFunctions.shingles(col("text"), n).as("fast"),
        TextFunctions.shinglesHof(col("text"), n).as("ref"))
      .filter(not(col("fast") <=> col("ref")))
    assert(diff.count() == 0,
      s"n=$n mismatch: ${diff.take(3).mkString("; ")}")
  }

  test("native shingles ≡ composed form on the fixture corpus, n = 2, 3, 5") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    Seq(2, 3, 5).foreach(n => assertParity(docs, n))
  }

  test("native shingles ≡ composed form on whitespace / short / empty edges") {
    import spark.implicits._
    val edges = Seq(
      "",                       // Pattern.split("") → [""]
      " ",                      // leading-empty token
      "  leading whitespace run",
      "trailing whitespace  ",
      "one",
      "one two",
      "one two three",
      "one two three four",
      "tab\tseparated\twords here",
      "mixed \t \n whitespace separators between words",
      "a b c d e f g h i j").toDF("text")
    Seq(1, 2, 3, 4).foreach(n => assertParity(edges, n))
  }

  test("null text stays null through both forms") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("a b c d")).toDF("text")
    val got = df.select(
      TextFunctions.shingles(col("text"), 3).as("fast"),
      TextFunctions.shinglesHof(col("text"), 3).as("ref")).collect()
    assert(got.forall(r => r.isNullAt(0) == r.isNullAt(1)))
    assert(got.exists(_.isNullAt(0)))
  }
}
