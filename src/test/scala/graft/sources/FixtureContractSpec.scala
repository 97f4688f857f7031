package graft.sources

import graft.flow.SparkTestSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift guard (VERDICT r9 item 7).
  *
  * The driver regenerates `/root/testdata` between rounds, and the physical
  * parquet encoding has already changed once: round 1–8 `events.ts` was
  * INT64 TIMESTAMP(NANOS) (decodes as raw LongType under `nanosAsLong`),
  * the round-9 regeneration ships TIMESTAMP(MICROS, utc=false) which Spark
  * decodes natively as TIMESTAMP_NTZ. That silent flip cost 18 oracle rows
  * and 8 specs before anything pointed at the loader.
  *
  * This spec pins the DECODED Spark type of every fixture column the engine
  * depends on. When the driver regenerates with a new encoding, exactly one
  * spec goes red with a message naming the loader to update — instead of 18
  * opaque oracle failures.
  *
  * It asserts the set of types a loader is WRITTEN to handle, not a single
  * frozen encoding: `events.ts` may decode as LongType (nanos fixture) or
  * TimestampNTZType (micros fixture) because `Tables.events` branches on
  * both; anything else must fail loudly here first.
  */
class FixtureContractSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def rawSchema(name: String): StructType =
    spark.read.parquet(s"$sfDir/$name.parquet").schema

  test("events.ts decodes as a type Tables.events handles (long-nanos or ntz-micros)") {
    // Must mirror the loader: nanosAsLong set before the scan.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val t = rawSchema("events")("ts").dataType
    assert(
      t == LongType || t == TimestampNTZType || t == TimestampType,
      s"events.parquet ts decoded as $t — the driver regenerated the fixture with an " +
        "encoding graft.sources.Tables.events does not handle; add a branch there " +
        "and extend this contract")
    // And the loader itself must produce NTZ for oracle parity with DuckDB.
    val loaded = Tables.events(spark, sfDir).schema("ts").dataType
    assert(loaded == TimestampNTZType,
      s"Tables.events emitted ts as $loaded, expected TIMESTAMP_NTZ (DuckDB naive-TIMESTAMP parity)")
  }

  test("events non-ts columns keep their contracted types") {
    val s = rawSchema("events")
    assert(s("event_id").dataType == LongType, "events.event_id must be int64")
    assert(s("user_id").dataType == LongType, "events.user_id must be int64")
    assert(s("event_type").dataType == StringType, "events.event_type must be string")
    assert(s("value").dataType == DoubleType, "events.value must be double")
    assert(s("props").dataType == StringType,
      "events.props must be a JSON string — MapTypeSpec/VariantQueries parse it with from_json")
  }

  test("embeddings.embedding is array<float> and label is int") {
    val s = rawSchema("embeddings")
    assert(s("vec_id").dataType == LongType, "embeddings.vec_id must be int64")
    assert(s("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
           s("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding decoded as ${s("embedding").dataType} — Similarity/IVF/PQ " +
        "operators assume array<float>; update graft.operators.Similarity et al.")
    assert(s("label").dataType == IntegerType, "embeddings.label must be int32")
  }

  test("documents columns keep their contracted types") {
    val s = rawSchema("documents")
    assert(s("doc_id").dataType == LongType, "documents.doc_id must be int64")
    assert(s("text").dataType == StringType, "documents.text must be string")
    assert(s("lang").dataType == StringType, "documents.lang must be string")
    assert(s("source").dataType == StringType, "documents.source must be string")
    assert(s("n_chars").dataType == LongType, "documents.n_chars must be int64")
  }

  test("tpch key columns keep their contracted types") {
    val li = rawSchema("lineitem")
    assert(li("l_orderkey").dataType == LongType)
    assert(li("l_quantity").dataType == DoubleType || li("l_quantity").dataType.isInstanceOf[DecimalType],
      s"lineitem.l_quantity decoded as ${li("l_quantity").dataType} — aggregate oracles round doubles")
    val o = rawSchema("orders")
    assert(o("o_orderkey").dataType == LongType)
    assert(o("o_orderdate").dataType == DateType || o("o_orderdate").dataType == TimestampNTZType,
      s"orders.o_orderdate decoded as ${o("o_orderdate").dataType} — date functions assume DATE/NTZ")
  }
}
