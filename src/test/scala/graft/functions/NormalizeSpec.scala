package graft.functions

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val composed = "caf\u00e9"   // single codepoint \u00e9
  private val decomposed = "cafe\u0301" // e + combining acute U+0301

  test("NFC composes decomposed accents; NFD decomposes composed ones") {
    val df = Seq(composed, decomposed, "plain ascii").toDF("s")
    val out = df.select(
      TextFunctions.normalize($"s").as("nfc"),
      TextFunctions.normalize($"s", "NFD").as("nfd"))
      .as[(String, String)].collect()
    assert(out(0) == (composed, decomposed))
    assert(out(1) == (composed, decomposed))
    assert(out(2) == ("plain ascii", "plain ascii"))
  }

  test("NFKC folds compatibility characters (ligatures, fullwidth, superscripts)") {
    val out = Seq("\ufb01le \uff21\uff22", "\u00b2").toDF("s")
      .select(TextFunctions.normalize($"s", "NFKC")).as[String].collect()
    assert(out(0) == "file AB")
    assert(out(1) == "2")
  }

  test("normalize matches java.text.Normalizer on random unicode-ish text") {
    val samples = (0 until 200).map { i =>
      val r = new scala.util.Random(i)
      (0 until 20).map { _ =>
        r.nextInt(5) match {
          case 0 => ('a' + r.nextInt(26)).toChar.toString
          case 1 => "\u0301" // combining acute
          case 2 => "\u00e9" // composed e-acute
          case 3 => "\ufb01" // fi ligature (NFC-invariant, NFKC-foldable)
          case _ => " "
        }
      }.mkString
    }
    val got = samples.toDF("s")
      .select(TextFunctions.normalize($"s").as("n")).as[String].collect()
    val want = samples.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == want)
  }

  test("normalization dedups composed-vs-decomposed near-identical docs") {
    val docs = Seq(
      (1L, s"the $composed menu"),
      (2L, s"the $decomposed menu"), // same text, decomposed accents
      (3L, "something else entirely"))
      .toDF("doc_id", "text")
    val normalized = docs.withColumn("text", TextFunctions.normalize($"text"))
    val survivors = graft.operators.Dedup.exact(normalized, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L))
  }

  test("codegen path active (parquet-backed scan, no fallback)") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val q = d.select(TextFunctions.normalize(col("text")).as("n"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("graft_normalize") && l.contains("*(")),
      plan)
  }

  test("SQL registration: graft_normalize usable from SQL text") {
    graft.GraftExtensions.install(spark)
    val out = spark.sql(
      s"SELECT graft_normalize('$decomposed') AS n, " +
        "graft_normalize('\ufb01n', 'NFKC') AS k").collect().head
    assert(out.getString(0) == composed)
    assert(out.getString(1) == "fin")
  }
}
