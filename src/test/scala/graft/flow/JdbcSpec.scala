package graft.flow

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real database round-trip for the A15/A18 JDBC surface, against
  * embedded Derby (ships on the Spark classpath) — the closest offline
  * stand-in for the reference's SQL Server targets. In-memory databases
  * (`jdbc:derby:memory:*`) live JVM-wide, which is exactly right for
  * local-mode Spark: executors share the driver JVM. */
class JdbcSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def memUrl(db: String) = s"jdbc:derby:memory:$db;create=true"
  private val props = new java.util.Properties()

  test("A15 JDBC bulk sink round-trips through a live SQL database") {
    val url = memUrl("graft_sink")
    val df = Seq((1L, "acme", 1.5), (2L, "zenith", 2.5), (3L, "nimbus", 3.5))
      .toDF("id", "name", "v")
    Sinks.jdbc(df, url, "t_sink", batchSize = 2, mode = "overwrite")
    val back = spark.read.jdbc(url, "t_sink", props)
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "acme", 1.5), (2L, "zenith", 2.5), (3L, "nimbus", 3.5)))
    // append mode accumulates (the BatchBlock drain contract)
    Sinks.jdbc(df.filter($"id" === 1L), url, "t_sink")
    assert(spark.read.jdbc(url, "t_sink", props).count() == 4)
  }

  test("A18 lookup join against a live JDBC dimension pushes the filter down") {
    val url = memUrl("graft_dimdb")
    // VARCHAR, not the dialect's default CLOB: Derby can't compare CLOB
    // against a literal, which would break the pushed-down predicate
    Seq((1L, "EUROPE"), (2L, "ASIA"), (3L, "AFRICA")).toDF("rk", "rname")
      .write.mode("overwrite")
      .option("createTableColumnTypes", "rname VARCHAR(32)")
      .jdbc(url, "t_region", props)
    val dim = spark.read.jdbc(url, "t_region", props).filter($"rname" =!= "AFRICA")
    // the predicate must reach the database scan, not a post-filter
    val pushed = dim.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("EqualTo(rname,AFRICA)"), pushed)
    val fact = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("fid", "rk")
    val out = fact.join(broadcast(dim), "rk").select("fid", "rname")
      .as[(Long, String)].collect().toSet
    assert(out == Set((10L, "EUROPE"), (11L, "ASIA")))
  }

  test("A18 dim upsert maintains a JDBC dim table across batches") {
    val url = memUrl("graft_upsert")
    val b1 = Seq((1L, "acme"), (2L, "zenith"), (3L, "acme")).toDF("fact_id", "brand")
    val r1 = graft.operators.DimUpsert.upsertJdbc(spark, url, "t_dim", b1, "brand")
      .select("fact_id", "sk").as[(Long, Long)].collect().toMap
    assert(r1(1L) == r1(3L))
    assert(r1.values.toSet.size == 2)

    val b2 = Seq((4L, "acme"), (5L, "nimbus")).toDF("fact_id", "brand")
    val r2 = graft.operators.DimUpsert.upsertJdbc(spark, url, "t_dim", b2, "brand")
      .select("fact_id", "sk").as[(Long, Long)].collect().toMap
    assert(r2(4L) == r1(1L))       // existing key keeps its sk across batches
    assert(r2(5L) > r1.values.max) // new key minted above the DB max

    val dim = spark.read.jdbc(url, "t_dim", props)
    assert(dim.count() == 3)
    assert(dim.select("sk").distinct().count() == 3)
  }

  test("A18 dim upsert resolves a schema-qualified dim table name") {
    val url = memUrl("graft_schema")
    // Derby auto-creates a schema on first write; the probe must pass the
    // qualifier as getTables' schemaPattern — matched against bare
    // TABLE_NAME, "dw.t_dim" looks missing forever and batch 2's
    // errorifexists write would throw.
    val b1 = Seq((1L, "acme"), (2L, "zenith")).toDF("fact_id", "brand")
    val r1 = graft.operators.DimUpsert.upsertJdbc(spark, url, "dw.t_dim", b1, "brand")
      .select("fact_id", "sk").as[(Long, Long)].collect().toMap
    assert(r1.values.toSet.size == 2)
    val b2 = Seq((3L, "acme"), (4L, "nimbus")).toDF("fact_id", "brand")
    val r2 = graft.operators.DimUpsert.upsertJdbc(spark, url, "dw.t_dim", b2, "brand")
      .select("fact_id", "sk").as[(Long, Long)].collect().toMap
    assert(r2(3L) == r1(1L))
    assert(spark.read.jdbc(url, "dw.t_dim", props).count() == 3)
  }

  test("A18 existence probe treats _ in the table name literally, not as " +
    "a LIKE wildcard") {
    val url = memUrl("graft_like")
    // Only "tzdimx" exists; probing for "t_dimx" with an UNESCAPED LIKE
    // pattern would match it (`_` = any char) → phantom "exists" → the
    // subsequent spark.read.jdbc("t_dimx") fails. With escaping, the
    // probe correctly reports missing and the upsert creates the table.
    Seq((1L, "acme")).toDF("fact_id", "brand")
      .write.option("createTableColumnTypes", "brand VARCHAR(255)")
      .jdbc(url, "tzdimx", props)
    val b = Seq((1L, "acme")).toDF("fact_id", "brand")
    val out = graft.operators.DimUpsert.upsertJdbc(spark, url, "t_dimx", b, "brand")
    assert(out.count() == 1)
    assert(spark.read.jdbc(url, "t_dimx", props).count() == 1)
  }
}
