package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // segmentWords = 2: "cookie banner" repeats verbatim in docs 1-3;
  // bodies differ. Doc 4 is PURE boilerplate; doc 5 shares nothing.
  private val docs = Seq(
    (1L, "cookie banner alpha beta"),
    (2L, "cookie banner gamma delta"),
    (3L, "cookie banner epsilon zeta"),
    (4L, "cookie banner cookie banner"),
    (5L, "totally unrelated body text"))
    .toDF("doc_id", "text")

  test("segments repeated across minDocs docs are removed; distinct " +
    "bodies survive in order") {
    val got = Boilerplate.removeRepeated(docs, "doc_id", "text",
      segmentWords = 2, minDocs = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "alpha beta", 1L),
      (2L, "gamma delta", 1L),
      (3L, "epsilon zeta", 1L),
      (4L, "", 2L), // all segments boilerplate → empty, both counted
      (5L, "totally unrelated body text", 0L)))
  }

  test("below the threshold nothing is removed, and a ragged tail " +
    "segment is kept whole") {
    val d = Seq((1L, "one two three four five"), (2L, "six seven")).toDF("doc_id", "text")
    val got = Boilerplate.removeRepeated(d, "doc_id", "text",
      segmentWords = 2, minDocs = 2)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // 5 words → segments "one two","three four","five" — reassembly is
    // the identity when nothing repeats
    assert(got == Seq(
      (1L, "one two three four five", 0L),
      (2L, "six seven", 0L)))
  }

  test("output is a pure function of the data: identical across input " +
    "partitionings; null-text docs drop") {
    val base = docs.union(Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Boilerplate.removeRepeated(df, "doc_id", "text", 2, 3)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val a = run(base.repartition(1))
    val b = run(base.repartition(7))
    assert(a == b)
    assert(!a.exists(_._1 == 6L)) // null text dropped, not empty-stringed
  }
}
