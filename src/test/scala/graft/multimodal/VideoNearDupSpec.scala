package graft.multimodal

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Gate for q_video_near_dup: the MJPEG-AVI encoder round-trips through
  * the library's own RIFF walk, the majority-vote frame signature
  * behaves as a perceptual hash (a lossier re-master of the same
  * footage within a few bits, different footage far apart), and the
  * end-to-end pipeline surfaces EXACTLY the planted pairs. */
class VideoNearDupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import Multimodal._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("encodeMjpegAvi round-trips through decodeMjpegAvi: dims, frame " +
    "rate, frame count, and each frame decodable") {
    val img = new java.awt.image.BufferedImage(
      48, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 48) img.setRGB(x, y, (x * y) % 0xffffff)
    val frames = (0 until 4).map(_ => JdkCodec.encodeJpeg(img, 0.8f))
    val avi = JdkCodec.encodeMjpegAvi(frames, 48, 32, microSecPerFrame = 100000)
    val dec = JdkCodec.decodeMjpegAvi(avi).get
    assert(dec.width == 48 && dec.height == 32)
    assert(dec.microSecPerFrame == 100000L)
    assert(dec.frames.length == 4)
    dec.frames.foreach { f =>
      val d = JdkCodec.decodeImage(f).get
      assert(d.getWidth == 48 && d.getHeight == 32)
    }
  }

  test("frame hashes: every aligned frame of the quality-0.4 re-master " +
    "within a few bits of its 0.9 twin; distinct footage far apart") {
    val corpus = Multimodal.syntheticVideoCorpus(spark, "/root/testdata/sf0.001")
    val fh = Multimodal.videoFrameDhash(corpus).collect()
      .map(v => (v.media_id, v.frame_idx) -> v.fhash).toMap
    val ids = fh.keys.map(_._1).toSeq.distinct.sorted
    val (a, b) = ids.groupBy(_ / 10).collectFirst {
      case (_, arr) if arr.length == 2 => (arr.min, arr.max)
    }.get
    for (f <- 0 until 4)
      assert(ham(fh((a, f)), fh((b, f))) <= 6,
        s"frame $f twin hamming ${ham(fh((a, f)), fh((b, f)))}")
    val c = ids.find(i => i / 10 != a / 10).get
    val far = (0 until 4).count(f => ham(fh((a, f)), fh((c, f))) > 6)
    assert(far >= 2, s"distinct footage should not align on most frames (far=$far)")
  }

  test("videoFrameDhash drops undecodable videos and undecodable frames " +
    "instead of poisoning the partition") {
    val spark0 = spark
    import spark0.implicits._
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val goodFrame = JdkCodec.encodeJpeg(img, 0.8f)
    def row(id: Long, bytes: Array[Byte]) = MediaRow(
      id, "video", bytes, "video/x-msvideo", None, None, None, None)
    val rows = Seq(
      row(1L, JdkCodec.encodeMjpegAvi(Seq(goodFrame, goodFrame), 16, 16, 100000)),
      row(2L, Array[Byte](9, 9, 9)), // not RIFF at all
      // valid container, but one frame is garbage JPEG bytes — the
      // bad frame drops, the good one still hashes
      row(3L, JdkCodec.encodeMjpegAvi(
        Seq(goodFrame, Array[Byte](1, 2, 3)), 16, 16, 100000))).toDS()
    val got = Multimodal.videoFrameDhash(rows, everyMs = 50L).collect()
    assert(got.map(_.media_id).distinct.sorted.toSeq == Seq(1L, 3L))
    assert(got.count(_.media_id == 1L) == 2)
    assert(got.count(_.media_id == 3L) == 1)
  }

  test("q_video_near_dup pipeline finds exactly the planted re-master " +
    "pairs at sf0.001 — no cross-footage false pairs") {
    val corpus = Multimodal.syntheticVideoCorpus(spark, "/root/testdata/sf0.001")
    val ids = corpus.collect().map(_.media_id).sorted
    val expected = ids.groupBy(_ / 10).collect {
      case (_, arr) if arr.length == 2 => (arr.min, arr.max)
    }.toSet
    assert(expected.nonEmpty, "fixture must contain complete groups")
    val pairs = Multimodal.videoNearDupPairs(
        corpus, everyMs = 200L, maxHamming = 6, minMatchedFrames = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == expected,
      s"planted=${expected.size} found=${pairs.size} " +
        s"missing=${(expected -- pairs).take(3)} extra=${(pairs -- expected).take(3)}")
  }
}
