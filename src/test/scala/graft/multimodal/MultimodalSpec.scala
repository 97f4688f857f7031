package graft.multimodal

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("media table round-trips binary + sparse metadata through parquet") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(s"$dir/media")
    val back = spark.read.parquet(s"$dir/media").as[Multimodal.MediaRow]
    assert(back.count() == media.count())
    val img = back.filter(_.kind == "image").head()
    assert(img.width.contains(128) && img.bytes.nonEmpty && img.duration_ms.isEmpty)
  }

  test("image feature extraction emits unit-norm fixed-dim vectors for images only") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val feats = Multimodal.extractImageFeatures(media, dim = 16).collect()
    assert(feats.length == media.filter(_.kind == "image").count())
    assert(feats.forall(_.features.length == 16))
    assert(feats.forall(f => math.abs(f.features.map(x => x.toDouble * x).sum - 1.0) < 1e-3))
    // deterministic stub: same input → same features
    val again = Multimodal.extractImageFeatures(media, dim = 16).collect()
    assert(feats.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("video frame sampling yields duration/interval frames per video") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val frames = Multimodal.sampleVideoFrames(media, everyMs = 10000L)
    val perVideo = frames.groupByKey(_.media_id).count().collect().toMap
    val expected = media.filter(_.kind == "video").collect()
      .map(m => m.media_id -> ((m.duration_ms.get + 9999) / 10000)).toMap
    assert(perVideo == expected)
  }

  test("resize rewrites bytes and metadata for images, passes others through") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val resized = Multimodal.resizeImages(media, 32, 32)
    val img = resized.filter(_.kind == "image").head()
    assert(img.width.contains(32) && img.height.contains(32))
    val audio = resized.filter(_.kind == "audio").head()
    val origAudio = media.filter(_.kind == "audio").head()
    assert(audio.bytes.sameElements(origAudio.bytes))
  }
}
