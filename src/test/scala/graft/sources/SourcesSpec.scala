package graft.sources

import java.nio.file.Files

import graft.flow.{Sinks, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    .toDF("id", "name", "score")

  test("csv sink/source round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_src").toString
    Sinks.csv(sample, s"$dir/csv")
    val back = Sources.csv(spark, s"$dir/csv", sample.schema).drop(Sources.corruptCol)
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }

  test("json-lines sink/source round-trip") {
    val dir = Files.createTempDirectory("graft_src").toString
    Sinks.json(sample, s"$dir/json")
    val back = Sources.jsonLines(spark, s"$dir/json", sample.schema)
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }

  test("orc sink/source round-trip with pushed-down filter") {
    val dir = Files.createTempDirectory("graft_src").toString
    Sinks.orc(sample, s"$dir/orc")
    val back = Sources.orc(spark, s"$dir/orc").filter(col("id") >= 2)
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((2L, "b", 2.5), (3L, "c", 3.5)))
    // the filter reaches the ORC scan, not a post-scan Filter only
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(id,2)"), plan)
  }

  test("malformed csv rows are quarantined with the raw line captured") {
    val dir = Files.createTempDirectory("graft_src").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.csv"),
      "id,name,score\n1,a,1.5\nnot_a_long,b,oops\n3,c,3.5\n")
    val back = Sources.csv(spark, s"$dir/bad.csv", sample.schema).cache()
    assert(back.count() == 3)
    val corrupt = back.filter(col(Sources.corruptCol).isNotNull)
    assert(corrupt.count() == 1)
    assert(corrupt.select(Sources.corruptCol).as[String].head().startsWith("not_a_long"))
    // clean rows are distinguishable: corrupt marker null, fields parsed
    assert(back.filter(col(Sources.corruptCol).isNull).count() == 2)
    back.unpersist()
  }

  test("streaming file source drains a directory through a query") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_src").toString
    sample.write.parquet(s"$dir/in")
    val q = Sources.fileStream(spark, s"$dir/in", sample.schema)
      .groupBy().agg(sum("id").as("s"))
      .writeStream.outputMode("complete").format("memory").queryName("src_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("src_out").as[Long].head() == 6L)
    } finally q.stop()
  }
}
