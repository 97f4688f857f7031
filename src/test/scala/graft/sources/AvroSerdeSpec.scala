package graft.sources

import graft.flow.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Kafka-wire Avro serde: single-record binary payloads round-trip,
  * schema-registry envelopes skip their prefix, poison messages decode
  * to NULL (never kill the query), and the full kafka-parity chain —
  * binary value column → fromAvro → watermark → windowed aggregate —
  * runs as a real streaming query on MemoryStream. */
class AvroSerdeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val eventType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("value", DoubleType, nullable = false)))

  test("toAvro → fromAvro round-trips rows, including nulls") {
    val df = Seq(
      (1L, Some("click"), 1.5),
      (2L, None, 2.5)).toDF("user_id", "kind", "value")
    val schemaJson = Avro.toAvroSchema(eventType).toString
    val wire = df.select(
      AvroSerde.toAvro(struct(col("user_id"), col("kind"), col("value")),
        eventType).as("value"))
    assert(wire.schema("value").dataType == BinaryType)
    val back = wire.select(AvroSerde.fromAvro(col("value"), schemaJson).as("e"))
      .select("e.user_id", "e.kind", "e.value")
      .as[(Long, Option[String], Double)].collect().toSet
    assert(back == Set((1L, Some("click"), 1.5), (2L, None, 2.5)))
  }

  test("schema-registry envelope: skipBytes drops the magic+id prefix") {
    val schemaJson = Avro.toAvroSchema(eventType).toString
    val payload = Seq((7L, Some("buy"), 9.0)).toDF("user_id", "kind", "value")
      .select(AvroSerde.toAvro(struct(col("user_id"), col("kind"),
        col("value")), eventType).as("v"))
      .as[Array[Byte]].head()
    val enveloped = Array[Byte](0, 0, 0, 0, 42) ++ payload
    val df = Seq(enveloped).toDF("value")
    val got = df.select(AvroSerde.fromAvro(col("value"), schemaJson, skipBytes = 5)
      .as("e")).select("e.user_id").as[Long].head()
    assert(got == 7L)
  }

  test("poison message decodes to NULL; the quarantine split is countable") {
    val schemaJson = Avro.toAvroSchema(eventType).toString
    val ok = Seq((1L, Some("click"), 1.0)).toDF("user_id", "kind", "value")
      .select(AvroSerde.toAvro(struct(col("user_id"), col("kind"),
        col("value")), eventType).as("v")).as[Array[Byte]].head()
    val df = Seq(ok, Array[Byte](-1, -2, -3), null)
      .toDF("value")
    val decoded = df.select(col("value"),
      AvroSerde.fromAvro(col("value"), schemaJson).as("e"))
    assert(decoded.filter(col("e").isNotNull).count() == 1)
    assert(decoded.filter(col("e").isNull).count() == 2)
  }

  test("kafka-parity chain on a real stream: binary values → fromAvro → " +
    "watermark → tumbling aggregate equals the batch answer") {
    val schemaJson = Avro.toAvroSchema(eventType).toString
    // shape the wire: (ts, value-bytes) as a Kafka batch would carry
    val events = Seq(
      (10L, 1L, "click", 2.0), (20L, 1L, "click", 3.0),
      (30L, 2L, "view", 5.0), (70L, 1L, "click", 7.0))
    val wire = events.map { case (ts, u, k, v) =>
      val bytes = Seq((u, Some(k), v)).toDF("user_id", "kind", "value")
        .select(AvroSerde.toAvro(struct(col("user_id"), col("kind"),
          col("value")), eventType).as("b")).as[Array[Byte]].head()
      (new java.sql.Timestamp(ts * 1000L), bytes)
    }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Array[Byte])]
    val decoded = in.toDF().toDF("ts", "value")
      .select(col("ts"), AvroSerde.fromAvro(col("value"), schemaJson).as("e"))
      .filter(col("e").isNotNull) // dead-letter split, as documented
      .select(col("ts"), col("e.user_id").as("user_id"), col("e.value").as("v"))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("user_id"))
      .agg(sum("v").as("total"), count(lit(1)).as("n"))

    val q = decoded.writeStream.format("memory")
      .queryName("graft_avro_stream").outputMode("append").start()
    try {
      in.addData(wire.take(3))
      q.processAllAvailable()
      in.addData(wire.drop(3)) // ts=70 advances the watermark past window 1
      q.processAllAvailable()
      in.addData((new java.sql.Timestamp(200 * 1000L), wire.head._2))
      q.processAllAvailable() // flush window 2
      val got = spark.table("graft_avro_stream")
        .select(col("window.start").cast("long").as("w"), col("user_id"),
          col("total"), col("n"))
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(got.contains((0L, 1L, 5.0, 2L)), s"window-1 user-1 agg: $got")
      assert(got.contains((0L, 2L, 5.0, 1L)), s"window-1 user-2 agg: $got")
      assert(got.contains((60L, 1L, 7.0, 1L)), s"window-2 user-1 agg: $got")
    } finally q.stop()
  }
}
