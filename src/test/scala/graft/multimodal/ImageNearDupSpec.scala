package graft.multimodal

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Gate for q_image_near_dup: dHash/aHash behave as perceptual hashes
  * (JPEG re-encode lands within a few bits, structurally distinct
  * scenes far apart) and the end-to-end pipeline over the planted
  * corpus surfaces EXACTLY the planted pairs. */
class ImageNearDupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import Multimodal._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def mosaic(group: Long, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      96, 96, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 96; x <- 0 until 96) {
      val h = group * 1315423911L + (x / 12) * 2654435761L + (y / 12) * 97L
      val v = ((h ^ (h >>> 17)) % 256).toInt.abs
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  private def dhashOf(bytes: Array[Byte]): Long =
    JdkCodec.dHash(JdkCodec.decodeImage(bytes).get)

  test("dHash: deterministic; JPEG re-encode of the same scene within a " +
    "few bits; structurally distinct mosaics far apart") {
    val png = mosaic(7, "png")
    assert(dhashOf(png) == dhashOf(mosaic(7, "png")))
    val dNear = ham(dhashOf(png), dhashOf(mosaic(7, "jpg")))
    val dFar = ham(dhashOf(png), dhashOf(mosaic(8, "png")))
    assert(dNear <= 6, s"jpeg twin hamming $dNear")
    assert(dFar > 12, s"distinct scenes hamming $dFar")
  }

  test("aHash: same perceptual contract as dHash on the mosaic family") {
    def a(bytes: Array[Byte]): Long =
      JdkCodec.aHash(JdkCodec.decodeImage(bytes).get)
    assert(ham(a(mosaic(3, "png")), a(mosaic(3, "jpg"))) <= 6)
    assert(ham(a(mosaic(3, "png")), a(mosaic(4, "png"))) > 12)
  }

  test("q_image_near_dup pipeline finds exactly the planted PNG/JPEG " +
    "pairs at sf0.001 — no cross-scene false pairs") {
    val corpus = Multimodal.syntheticImageCorpus(spark, "/root/testdata/sf0.001")
    val ids = corpus.collect().map(_.media_id).sorted
    assert(ids.nonEmpty && ids.forall(_ % 5 == 0))
    // planted pair per complete group: ids 10g and 10g+5 both present
    val expected = ids.groupBy(_ / 10).collect {
      case (_, arr) if arr.length == 2 => (arr.min, arr.max)
    }.toSet
    assert(expected.nonEmpty, "fixture must contain complete groups")
    val hashes = Multimodal.imageDhash(corpus).toDF()
    val pairs = Multimodal.hammingNearDupPairs(
        hashes, "media_id", "dhash", maxHamming = 6, chunks = 4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == expected,
      s"planted=${expected.size} found=${pairs.size} " +
        s"missing=${(expected -- pairs).take(3)} extra=${(pairs -- expected).take(3)}")
  }
}
