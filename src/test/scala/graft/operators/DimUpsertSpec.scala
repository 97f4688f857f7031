package graft.operators

import java.nio.file.Files

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DimUpsertSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("incremental dim upsert assigns stable surrogate keys across batches (A18)") {
    val dimPath = Files.createTempDirectory("graft_dim").toString + "/brands"

    // batch 1: three keys
    val b1 = Seq((1L, "acme"), (2L, "zenith"), (3L, "acme")).toDF("fact_id", "brand")
    val r1 = DimUpsert.upsert(spark, dimPath, b1, "brand")
      .select("fact_id", "sk").as[(Long, Long)].collect().toMap
    assert(r1(1L) == r1(3L))       // same natural key → same sk
    assert(r1.values.toSet.size == 2)

    // batch 2: one known key, one new key
    val b2 = Seq((4L, "acme"), (5L, "nimbus")).toDF("fact_id", "brand")
    val r2 = DimUpsert.upsert(spark, dimPath, b2, "brand")
      .select("fact_id", "sk").as[(Long, Long)].collect().toMap
    assert(r2(4L) == r1(1L))       // existing key keeps its sk across batches
    assert(r2(5L) > r1.values.max) // new key minted above the prior max

    // dim store holds exactly the distinct keys
    val dim = spark.read.parquet(dimPath)
    assert(dim.count() == 3)
    assert(dim.select("sk").distinct().count() == 3)
  }

  test("bulk first load: surrogate keys are contiguous, deterministic, distributed") {
    val dimPath = Files.createTempDirectory("graft_dim3").toString + "/d"
    val n = 10000
    // enough distinct keys to span every shuffle partition — the shape the
    // old single-partition Window.orderBy assignment would funnel
    val b1 = (1 to n).map(i => (i.toLong, f"key_$i%06d")).toDF("fact_id", "k")
    DimUpsert.upsert(spark, dimPath, b1, "k").count()
    val dim = spark.read.parquet(dimPath)
    val sks = dim.select("sk").as[Long].collect().sorted.toSeq
    assert(sks == (1L to n.toLong)) // dense, gap-free, from maxSk+1
    // deterministic: ascending key order ↔ ascending sk order
    val byKey = dim.as[(String, Long)].collect().sortBy(_._1).map(_._2).toSeq
    assert(byKey == (1L to n.toLong))

    // incremental batch: known key keeps its sk, new key mints above max
    val b2 = Seq((99999L, "key_000001"), (99998L, "zzz_new")).toDF("fact_id", "k")
    val r2 = DimUpsert.upsert(spark, dimPath, b2, "k")
      .select("fact_id", "sk").as[(Long, Long)].collect().toMap
    assert(r2(99999L) == 1L)
    assert(r2(99998L) == n + 1L)
  }

  test("re-upserting the same batch is idempotent (no duplicate dim rows)") {
    val dimPath = Files.createTempDirectory("graft_dim2").toString + "/d"
    val b = Seq((1L, "x"), (2L, "y")).toDF("fact_id", "k")
    DimUpsert.upsert(spark, dimPath, b, "k").collect()
    DimUpsert.upsert(spark, dimPath, b, "k").collect()
    assert(spark.read.parquet(dimPath).count() == 2)
  }
}
