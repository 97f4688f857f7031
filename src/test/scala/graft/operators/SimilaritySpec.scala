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
