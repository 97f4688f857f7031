package graft

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** MapType coverage: JSON props → typed map column → access/explode/
  * round-trip — the dynamic-schema side of the reference's JSON→POCO
  * demo (A26) when fields are not known at compile time. */
class MapTypeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("json props parse to a map column, access and explode work") {
    val e = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("props_map", from_json(col("props"), MapType(StringType, IntegerType)))
    val k = e.select(element_at(col("props_map"), "k").as("k"))
    assert(k.filter(col("k").isNotNull).count() == e.count())

    val exploded = e.select(col("event_id"), explode(col("props_map")).as(Seq("mk", "mv")))
    assert(exploded.count() == e.count()) // fixture props have exactly one key
    assert(exploded.select("mk").distinct().as[String].collect().toSeq == Seq("k"))
  }

  test("map column round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_map").toString
    val df = Seq(
      (1L, Map("a" -> 1, "b" -> 2)),
      (2L, Map("c" -> 3))).toDF("id", "m")
    df.write.mode("overwrite").parquet(s"$dir/m")
    val back = spark.read.parquet(s"$dir/m")
    assert(back.schema("m").dataType.isInstanceOf[MapType])
    val m1 = back.filter(col("id") === 1)
      .select(element_at(col("m"), "b")).as[Int].head()
    assert(m1 == 2)
    // map_keys/map_values/map_concat surface
    val keys = back.select(explode(map_keys(col("m")))).as[String].collect().toSet
    assert(keys == Set("a", "b", "c"))
  }
}
