package graft.multimodal

import graft.flow.SparkTestSession
import graft.operators.{IvfIndex, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end multimodal pipeline: binary media → (stub) feature
  * extraction → ANN index → nearest-neighbor query. Exercises the full
  * dataflow a training-data pipeline runs over image columns, with only
  * the codec stubbed. */
class MultimodalPipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("media bytes → features → IVF index → top-k neighbors") {
    val media = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.extractImageFeatures(media, dim = 32)
      .toDF()

    val n = feats.count()
    assert(n > 10)

    val idx = IvfIndex.build(feats, "media_id", "features", nlist = 4)
    val probeId = feats.select("media_id").as[Long].head()
    val probeVec = feats.filter($"media_id" === probeId)
      .select("features").as[Array[Float]].head()

    val nn = idx.topK(probeVec, 5, nprobe = 4).as[(Long, Double)].collect()
    assert(nn.nonEmpty)
    assert(nn.head._1 == probeId && math.abs(nn.head._2 - 1.0) < 1e-6)

    val brute = Similarity.bruteForceTopK(feats, "media_id", "features", probeVec, 5)
      .as[(Long, Double)].collect()
    assert(nn.map(_._1).toSeq == brute.map(_._1).toSeq) // full probe ≡ exact
    idx.assigned.unpersist()
  }
}
