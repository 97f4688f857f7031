package graft.multimodal

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PerceptualHashSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import Multimodal._

  private def image(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  // a structured scene: diagonal gradient + bright square
  private def scene(dx: Int): (Int, Int) => Int = (x, y) => {
    val base = ((x + y + dx) * 255 / 254) & 0xff
    val v = if (x >= 40 && x < 70 && y >= 30 && y < 60) 230 else base
    (v << 16) | (v << 8) | v
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def phashOf(bytes: Array[Byte]): Long =
    JdkCodec.pHash(JdkCodec.decodeImage(bytes).get)

  test("pHash: deterministic; near-identical images land within a few " +
    "bits, unrelated images far apart") {
    val base = image(128, 128)(scene(0))
    val again = image(128, 128)(scene(0))
    // light corruption: a small corner patch changes
    val nearDup = image(128, 128) { (x, y) =>
      if (x < 8 && y < 8) 0x777777 else scene(0)(x, y)
    }
    val unrelated = image(128, 128) { (x, y) =>
      val v = (255 - (x + y)) & 0xff; (v << 16) | (v << 8) | v
    }
    assert(phashOf(base) == phashOf(again))
    val dNear = ham(phashOf(base), phashOf(nearDup))
    val dFar = ham(phashOf(base), phashOf(unrelated))
    assert(dNear <= 3, s"near-dup hamming $dNear")
    assert(dFar > 10, s"unrelated hamming $dFar")
  }

  test("imagePhash is total: decodable images hash from pixels, " +
    "undecodable blobs take the deterministic stub") {
    def row(id: Long, bytes: Array[Byte]) = MediaRow(
      id, "image", bytes, "image/png", None, None, None, None)
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val rows = Seq(
      row(1L, image(64, 64)(scene(0))),
      row(2L, junk),
      row(3L, junk.clone())).toDS()
    val got = imagePhash(rows).collect().map(h => h.media_id -> h.phash).toMap
    assert(got.size == 3)
    assert(got(1L) == phashOf(image(64, 64)(scene(0))))
    // identical undecodable bytes collide (and only they do)
    assert(got(2L) == got(3L))
    assert(got(2L) == StubCodec.hash64(junk))
  }

  test("hammingNearDupPairs: finds pairs within the bound even when the " +
    "differing bits spread across chunks; misses nothing at distance<=3") {
    val base = 0x0f0f0f0f12345678L
    // 3 flipped bits in 3 DIFFERENT 16-bit chunks — worst case for banding
    val spread = base ^ (1L << 2) ^ (1L << 17) ^ (1L << 40)
    val far = ~base
    val hashes = Seq((1L, base), (2L, spread), (3L, far)).toDF("id", "h")
    val pairs = hammingNearDupPairs(hashes, "id", "h", maxHamming = 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 3)))
  }

  test("hammingNearDupPairs radius-1 multi-index: distance 4 over 4 chunks " +
    "(one bit in each chunk — impossible for radius-0 banding) is found") {
    val base = 0x0f0f0f0f12345678L
    val spread4 = base ^ (1L << 2) ^ (1L << 17) ^ (1L << 40) ^ (1L << 60)
    val hashes = Seq((1L, base), (2L, spread4), (3L, ~base)).toDF("id", "h")
    val pairs = hammingNearDupPairs(hashes, "id", "h", maxHamming = 4, chunks = 4)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 4)))
  }

  test("hammingNearDupPairs enforces pigeonhole soundness (radius > 1 refused)") {
    val hashes = Seq((1L, 0L)).toDF("id", "h")
    intercept[IllegalArgumentException] {
      hammingNearDupPairs(hashes, "id", "h", maxHamming = 8, chunks = 4)
    }
  }

  private def wav(rate: Float, ms: Int, amp: Int => Double): Array[Byte] = {
    val n = (rate * ms / 1000).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (amp(i) * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("audio fingerprint: gain-invariant on the same envelope, " +
    "different envelopes differ, tiny clips yield None") {
    // loud/quiet alternation in 8 segments
    def envA(rate: Float)(i: Int): Double =
      if ((i * 8 / (rate.toInt / 2)) % 2 == 0) 0.8 else 0.05
    def envB(rate: Float)(i: Int): Double =
      if ((i * 8 / (rate.toInt / 2)) % 3 == 0) 0.8 else 0.05
    val a = JdkCodec.audioFingerprint(wav(8000f, 500, envA(8000f))).get
    val aScaled = JdkCodec.audioFingerprint(
      wav(8000f, 500, i => envA(8000f)(i) * 0.5)).get
    val b = JdkCodec.audioFingerprint(wav(8000f, 500, envB(8000f))).get
    assert(ham(a, aScaled) <= 3, s"gain change moved ${ham(a, aScaled)} bits")
    assert(ham(a, b) > 10, s"different envelope only ${ham(a, b)} bits apart")
    assert(JdkCodec.audioFingerprint(wav(8000f, 5, _ => 0.5)).isEmpty)
  }

  test("audioFingerprints drops undecodable rows, keeps real ones") {
    def row(id: Long, bytes: Array[Byte]) = MediaRow(
      id, "audio", bytes, "audio/wav", None, None, None, None)
    val rows = Seq(
      row(1L, wav(8000f, 300, _ => 0.6)),
      row(2L, Array[Byte](1, 2, 3))).toDS()
    val got = audioFingerprints(rows).collect()
    assert(got.map(_.media_id).toSeq == Seq(1L))
  }
}
