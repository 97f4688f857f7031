package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ExpectationsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import Expectations._

  private def report(df: org.apache.spark.sql.DataFrame,
      checks: Seq[Expectation]): Map[String, (Double, Boolean)] =
    evaluate(df, checks).collect()
      .map(r => r.getString(0) -> ((
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
        r.getBoolean(3)))).toMap

  test("planted violations fail their checks with exact metrics") {
    val df = Seq(
      (1L, Some("a"), 10.0),
      (2L, None, 50.0),
      (2L, Some("c"), 200.0), // dup id, out-of-range value
      (4L, Some("d"), 30.0))
      .toDF("id", "name", "v")
    val got = report(df, Seq(
      Complete("name", 0.9),
      Unique("id"),
      Between("v", 0, 100),
      MeanBetween("v", 0, 50)))
    assert(got("complete(name)") == ((0.75, false)))
    assert(got("unique(id)") == ((0.75, false)))
    assert(got("between(v)") == ((0.75, false)))
    assert(got("mean_between(v)") == ((72.5, false)))
  }

  test("conforming data passes; regex and membership count only non-nulls") {
    val df = Seq(
      (1L, Some("src1"), Some("en")),
      (2L, Some("src2"), Some("de")),
      (3L, None, Some("xx")),
      (4L, Some("src9"), None))
      .toDF("id", "src", "lang")
    val got = report(df, Seq(
      Unique("id"),
      MatchesRegex("src", "^src[0-9]$", 1.0),
      MemberOf("lang", Seq("en", "de"), 0.6)))
    assert(got("unique(id)") == ((1.0, true)))
    // 3 non-null src, all matching
    assert(got("matches_regex(src)") == ((1.0, true)))
    // 2 of 3 non-null langs allowed = 0.666667 >= 0.6
    assert(got("member_of(lang)") == ((0.666667, true)))
  }

  test("empty input: ratio checks pass vacuously, mean check FAILS") {
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    val got = report(df, Seq(
      Complete("v", 1.0), Unique("id"), Between("v", 0, 1),
      MeanBetween("v", 0, 1)))
    assert(got("complete(v)") == ((1.0, true)))
    assert(got("unique(id)") == ((1.0, true)))
    assert(got("between(v)") == ((1.0, true)))
    assert(got("mean_between(v)")._2 == false)
  }

  test("evaluateBy reports per group and catches a violation confined " +
    "to one segment that the global pass misses") {
    val df = Seq(
      ("en", 10.0), ("en", 20.0), ("en", 30.0),
      ("xx", 900.0), ("xx", 950.0))
      .toDF("lang", "v")
    // global mean = 382 — would FAIL globally; per-group splits verdicts
    val by = evaluate(df, Seq(MeanBetween("v", 0, 100)))
    assert(!by.collect().head.getBoolean(3))
    val per = evaluateBy(df, Seq("lang"), Seq(MeanBetween("v", 0, 100)))
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(per == Map("en" -> true, "xx" -> false))
  }

  test("all checks ride ONE scan of the input") {
    val dir = java.nio.file.Files.createTempDirectory("graft_exp").toString
    (1L to 100L).map(i => (i, i * 2.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = evaluate(df, Seq(
      Complete("v", 1.0), Unique("id"), Between("v", 0, 1000),
      MeanBetween("v", 0, 1000)))
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected one parquet scan, got $scans:\n$plan")
  }
}
