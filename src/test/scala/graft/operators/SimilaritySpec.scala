package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def probeVec(): Array[Float] =
    graft.sources.Tables.embeddings(spark, sfDir)
      .filter($"vec_id" === 0).select("embedding")
      .as[Array[Float]].head()

  test("brute-force cosine top-k is ordered and self-consistent on fixtures") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val top = Similarity.bruteForceTopK(e, "vec_id", "embedding", probeVec(), 10)
      .as[(Long, Double)].collect()
    assert(top.length == 10)
    assert(top.head._1 == 0L && math.abs(top.head._2 - 1.0) < 1e-9) // probe finds itself
    assert(top.map(_._2).sliding(2).forall(p => p(0) >= p(1)))      // descending
  }

  test("LSH top-k candidates rerank to a subset of brute-force ranking with decent recall") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val probe = probeVec()
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", probe, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val approx = Similarity.lshTopK(e, "vec_id", "embedding", probe, 10, planes = 6)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall too low for planes=6 with multi-probe")
  }

  test("int8 quantized-scan top-k reranks to near-perfect recall against " +
    "the exact scan, and degrades gracefully with a tiny pool") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val probe = probeVec()
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", probe, 10)
      .as[(Long, Double)].collect()
    val approx = Similarity.quantizedTopK(e, "vec_id", "embedding", probe, 10,
      poolK = 50).as[(Long, Double)].collect()
    assert(approx.length == 10)
    assert(approx.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
    val recall = (exact.map(_._1).toSet intersect approx.map(_._1).toSet).size / 10.0
    // int8 max-abs quantization of 64-dim unit-ish vectors keeps coarse
    // ranking close to exact; a 5× pool should recover essentially all
    // true neighbors
    assert(recall >= 0.9, s"recall=$recall with poolK=50")
    // re-ranked sims of the ids BOTH paths returned match the exact scan
    val exactBy = exact.toMap
    approx.filter(kv => exactBy.contains(kv._1)).foreach { case (id, sim) =>
      assert(math.abs(sim - exactBy(id)) < 1e-9, s"sim mismatch for $id")
    }
    // pool of exactly k still returns k ordered rows (worst-case dial)
    assert(Similarity.quantizedTopK(e, "vec_id", "embedding", probe, 10,
      poolK = 10).count() == 10)
  }

  test("autoPlanes tracks log n with the exact integer boundaries the oracle " +
    "SQL recomputes from COUNT(*)") {
    // smallest k with 128·2^k ≥ n, clamped to [2, 16]
    assert(Similarity.autoPlanes(1L) == 2)
    assert(Similarity.autoPlanes(128L) == 2)   // k=0, clamped up
    assert(Similarity.autoPlanes(500L) == 2)   // 512 ≥ 500 (the sf0.01 fixture)
    assert(Similarity.autoPlanes(513L) == 3)
    assert(Similarity.autoPlanes(2000L) == 4)  // the sf0.1 fixture
    assert(Similarity.autoPlanes(20000L) == 8) // the sf1 scale fixture
    assert(Similarity.autoPlanes(Long.MaxValue) == 16) // clamp, no overflow loop
    // boundary exactness: n = 128·2^k picks k; n = 128·2^k + 1 picks k+1
    for (k <- 2 to 15) {
      assert(Similarity.autoPlanes(128L << k) == k)
      assert(Similarity.autoPlanes((128L << k) + 1) == k + 1)
    }
  }

  test("embeddingNearDupReplayable auto-planes path equals the explicit-planes " +
    "path at the count autoPlanes picks") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val auto = Dedup.embeddingNearDupReplayable(e, "vec_id", "embedding",
      threshold = 0.3).as[(Long, Long, Double)].collect().toSet
    val explicit = Dedup.embeddingNearDupReplayable(e, "vec_id", "embedding",
      threshold = 0.3, planes = Similarity.autoPlanes(e.count()))
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == explicit)
    assert(auto.nonEmpty)
  }

  test("hyperplane buckets are deterministic and assign similar vectors together") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.2f, 0.1f)),
      (1L, Array(0.98f, 0.02f, 0.2f, 0.1f))).toDF("id", "v")
    val b = vecs.select(Similarity.hyperplaneBucket($"v", 6).as("b")).as[Long].collect()
    assert(b(0) == b(1))
    val b2 = vecs.select(Similarity.hyperplaneBucket($"v", 6).as("b")).as[Long].collect()
    assert(b.toSeq == b2.toSeq)
  }
}
