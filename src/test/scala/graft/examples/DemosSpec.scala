package graft.examples

import java.nio.file.Files

import graft.flow.SparkTestSession
import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DemosSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("aggregator demo: KEY=Value lines group-sum (A25)") {
    val lines = Seq("a=1", "b=2", "a=3", "c=4", "b=5").toDF("value")
    val out = Demos.aggregatorFlow(lines)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 4L, "b" -> 7L, "c" -> 4L))
  }

  test("people demo: JSON parse, route malformed, sink good rows (A26)") {
    val dir = Files.createTempDirectory("graft_people").toString
    val lines = Seq(
      """{"name":"ada","age":36}""",
      """{"name":"alan","age":41}""",
      "not json at all").toDF("value")
    val routed = Demos.peopleFlow(spark, lines, dir)
    assert(routed("malformed").count() == 1)
    val people = spark.read.parquet(s"$dir/people").as[(String, Int)].collect().toMap
    assert(people == Map("ada" -> 36, "alan" -> 41))
    routed.unpersist()
  }

  test("crawler demo: cyclic link graph terminates and visits reachable set (A27)") {
    val links = Seq(
      ("home", "about"), ("home", "blog"), ("about", "home"), // cycle back
      ("blog", "post1"), ("post1", "blog"),                   // another cycle
      ("island", "nowhere")).toDF("src", "dst")
    val visited = Demos.crawlerFlow(spark, "home",
      f => f.join(links, f("url") === links("src")).select(col("dst").as("url")))
    assert(visited.as[String].collect().sorted.toSeq ==
      Seq("about", "blog", "home", "post1"))
  }

  test("curation demo: monitored pipeline curates the corpus and records stage counts") {
    val dir = Files.createTempDirectory("graft_curation").toString
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog for the evening news"),
      (1L, "the quick brown fox jumps over the lazy dog for the evening news"), // exact dup
      (2L, "der hund und die katze sind nicht ein gutes team mit der maus"),
      (3L, "an entirely different english passage about engines and the pipelines")
    ).toDF("doc_id", "text")
    val p = Demos.curationFlow(spark, docs, dir)
    try {
      p.run()
      assert(p.statistics("annotated") == 4)
      assert(p.statistics("curated") == 3) // dup 1 collapsed; de doc kept (allowed lang)
      val curated = spark.read.parquet(s"$dir/curated")
      assert(curated.count() == 3)
      val stats = spark.read.parquet(s"$dir/lang_stats")
      assert(stats.filter(col("lang") === "en").count() == 1)
    } finally p.close()
  }

  test("salted join equals plain join on skewed data") {
    val fact = (Seq.fill(500)(1) ++ (2 to 50)).toDF("k") // key 1 is hot
      .withColumn("payload", col("k") * 10)
    val dim = (1 to 50).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).groupBy("k").count()
    val salted = Skew.saltedJoin(fact, dim, "k").groupBy("k").count()
    assert(salted.as[(Int, Long)].collect().toMap == plain.as[(Int, Long)].collect().toMap)
  }
}
