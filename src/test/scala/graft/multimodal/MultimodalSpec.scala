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

  // ------------------------------------------------- real JDK codec paths

  /** A real PNG: w×h gradient (pixel value depends on position and seed,
    * so two seeds give genuinely different pictures). */
  private def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 13 + seed * 31) % 256
      img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | ((v * seed) % 256))
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** A real WAV: 16-bit signed mono PCM sine at `hz`, `ms` long. */
  private def wavBytes(rate: Float, hz: Double, ms: Int, amp: Double): Array[Byte] = {
    val n = (rate * ms / 1000).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * hz * i / rate) * amp * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  private def mediaRow(id: Long, kind: String, bytes: Array[Byte]): Multimodal.MediaRow =
    // metadata dims deliberately WRONG (999×999): the real decoder must
    // report what the pixels say, not what the metadata claims
    Multimodal.MediaRow(id, kind, bytes, "application/octet-stream",
      Some(999), Some(999), None, None)

  test("real PNG bytes decode through ImageIO: true pixel dimensions, " +
    "content-dependent unit-norm features") {
    val rows = Seq(
      mediaRow(1L, "image", pngBytes(40, 30, seed = 1)),
      mediaRow(2L, "image", pngBytes(40, 30, seed = 2)),
      mediaRow(3L, "image", pngBytes(40, 30, seed = 1))).toDS()
    val feats = Multimodal.extractImageFeatures(rows, dim = 16)
      .collect().sortBy(_.media_id)
    assert(feats.map(f => (f.width, f.height)).toSeq == Seq((40, 30), (40, 30), (40, 30)),
      "dimensions must come from the decoded pixels, not the (wrong) metadata")
    assert(feats.forall(f => math.abs(f.features.map(x => x.toDouble * x).sum - 1.0) < 1e-3))
    assert(feats(0).features.sameElements(feats(2).features), "same pixels, same features")
    assert(!feats(0).features.sameElements(feats(1).features), "different pictures differ")
  }

  test("real resize re-samples the pixels: the output decodes at the new size") {
    val rows = Seq(mediaRow(1L, "image", pngBytes(64, 48, seed = 3))).toDS()
    val out = Multimodal.resizeImages(rows, 16, 12).head()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.bytes))
    assert(img != null, "resized bytes must still be a decodable image")
    assert(img.getWidth == 16 && img.getHeight == 12)
  }

  test("real WAV bytes decode through AudioSystem: sample rate, duration " +
    "and PCM amplitude stats") {
    val rows = Seq(mediaRow(7L, "audio", wavBytes(8000f, hz = 440, ms = 500, amp = 0.5)),
      mediaRow(8L, "audio", "not audio at all".getBytes("UTF-8"))).toDS()
    val feats = Multimodal.extractAudioFeatures(rows).collect()
    assert(feats.length == 1, "undecodable audio rows are dropped, not poison")
    val f = feats.head
    assert(f.media_id == 7L && f.sample_rate == 8000 && f.channels == 1)
    assert(math.abs(f.duration_ms - 500) <= 1, s"duration ${f.duration_ms}")
    // sine at amplitude a: peak ≈ a, rms ≈ a/√2
    assert(math.abs(f.peak - 0.5) < 0.01, s"peak ${f.peak}")
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f.rms}")
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

  /** A real MJPEG AVI assembled chunk by chunk: RIFF('AVI ') → LIST(hdrl)
    * holding the MainAVIHeader → LIST(movi) holding one `00dc` JPEG per
    * frame. Each frame is a distinct real JPEG (ImageIO-encoded), so the
    * decode path is exercised end to end, not just the container walk. */
  private def mjpegAviBytes(
      w: Int, h: Int, nFrames: Int, microSecPerFrame: Int): Array[Byte] = {
    def jpeg(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 3 + y * 5 + seed * 41) % 256) << 16)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    // MainAVIHeader: 14 dwords; we set µs/frame @0, totalFrames @16 bytes
    // (dword 4), width @32, height @36; the rest zero
    val avih = new Array[Byte](56)
    le32(microSecPerFrame).copyToArray(avih, 0)
    le32(nFrames).copyToArray(avih, 16)
    le32(w).copyToArray(avih, 32)
    le32(h).copyToArray(avih, 36)
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi",
      (0 until nFrames).flatMap(i => chunk("00dc", jpeg(i))).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("real MJPEG AVI: the RIFF walk yields true dims and frame rate, " +
    "sampling keeps one frame per interval, and each sampled frame is a " +
    "decodable JPEG of the right size") {
    // 10 frames at 100ms/frame = 1s of video
    val avi = mjpegAviBytes(32, 24, nFrames = 10, microSecPerFrame = 100000)
    val decoded = Multimodal.JdkCodec.decodeMjpegAvi(avi)
    assert(decoded.isDefined)
    assert(decoded.get.width == 32 && decoded.get.height == 24)
    assert(decoded.get.frames.length == 10)
    assert(decoded.get.microSecPerFrame == 100000L)

    val rows = Seq(
      mediaRow(10L, "video", avi),
      mediaRow(11L, "video", "definitely not a video".getBytes("UTF-8"))
        .copy(duration_ms = Some(2000L))).toDS()
    // every 300ms over [0,900]ms → frames at ts 0, 300, 600, 900
    val frames = Multimodal.sampleVideoFrames(rows, everyMs = 300L).collect()
    val real = frames.filter(_.media_id == 10L).sortBy(_.frame_idx)
    assert(real.map(_.ts_ms).toSeq == Seq(0L, 300L, 600L, 900L), real.map(_.ts_ms).toSeq)
    real.foreach { f =>
      val img = Multimodal.JdkCodec.decodeImage(f.frame_bytes)
      assert(img.isDefined, s"frame ${f.frame_idx} must be a real JPEG")
      assert(img.get.getWidth == 32 && img.get.getHeight == 24)
    }
    // two distinct frames carry distinct pixels (not one frame repeated)
    assert(!real(0).frame_bytes.sameElements(real(1).frame_bytes))
    // the non-video blob fell back to the stub path: 2000ms / 300ms → 7
    assert(frames.count(_.media_id == 11L) == 7)

    // frame features: one unit-norm vector per sampled frame, keyed by
    // (media_id, frame_idx) — separate columns, never a composite id
    val feats = Multimodal.extractVideoFrameFeatures(rows, everyMs = 300L).collect()
    assert(feats.length == 4, s"got ${feats.length}")
    assert(feats.forall(_.media_id == 10L))
    assert(feats.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
    feats.foreach { f =>
      val n = math.sqrt(f.features.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"norm $n")
    }
  }
}
