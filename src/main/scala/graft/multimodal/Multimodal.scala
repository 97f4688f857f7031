package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque binary columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators (BASELINE.json north_star).
  *
  * The Spark-side plumbing — schema, batch iteration, partition-parallel
  * execution — is real. The codec calls are STUBBED (no image/audio
  * libraries ship in this container): `StubCodec` derives deterministic
  * fake pixels/frames/features from the bytes' hash, so tests are
  * reproducible and the operators' dataflow (shapes, batching, joins) is
  * exercised end-to-end. Swapping in a real codec means replacing ONLY the
  * StubCodec bodies — every signature and schema stays.
  *
  * Scale notes: media bytes never shuffle — decode/extract are
  * mapPartitions (narrow); only the extracted features (small, fixed-width)
  * flow into downstream joins. Size partitions by bytes, not rows:
  * `spark.sql.files.maxPartitionBytes` governs the scan, and per-row cost
  * dominates, so AQE coalescing is disabled-irrelevant here.
  */
object Multimodal {

  /** Typed media row: kind ∈ {image, audio, video}; meta is sparse. */
  case class MediaRow(
      media_id: Long,
      kind: String,
      bytes: Array[Byte],
      mime: String,
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Long])

  case class ImageFeatures(media_id: Long, width: Int, height: Int, features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, frame_bytes: Array[Byte])

  /** STUB codec — deterministic fakes in place of real decoders.
    * Replace these bodies (and only these) with e.g. javax.imageio /
    * ffmpeg bindings in a real deployment. */
  object StubCodec {
    private def h64(bytes: Array[Byte], salt: Long): Long = {
      // FNV-1a over the bytes, salted — cheap, deterministic, pure JVM.
      var h = 0xcbf29ce484222325L ^ salt
      var i = 0
      while (i < bytes.length) { h ^= bytes(i); h *= 0x100000001b3L; i += 1 }
      h
    }

    /** "Decode" an image: dimensions from metadata (fallback 64×64). */
    def decodeDims(row: MediaRow): (Int, Int) =
      (row.width.getOrElse(64), row.height.getOrElse(64))

    /** "Extract" a dim-`d` feature vector — unit-norm, derived from bytes. */
    def features(bytes: Array[Byte], d: Int): Array[Float] = {
      val raw = Array.tabulate(d)(j => (h64(bytes, j) % 1000L).toFloat / 1000f)
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum).max(1e-9)
      raw.map(x => (x / n).toFloat)
    }

    /** "Resize": deterministic re-encoding of the bytes at new dims. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.min(bytes.length, w * h / 8).max(16))
      if (bytes.nonEmpty) {
        var i = 0
        while (i < out.length) { out(i) = (bytes(i % bytes.length) ^ (w + h)).toByte; i += 1 }
      }
      out
    }

    /** "Sample" every nth frame of a video's timeline. */
    def sampleFrames(row: MediaRow, everyMs: Long): Seq[Frame] = {
      val dur = row.duration_ms.getOrElse(0L)
      (0L until dur by everyMs).zipWithIndex.map { case (ts, i) =>
        Frame(row.media_id, i, ts, resize(row.bytes, 32, 32))
      }
    }
  }

  /** Decode + feature-extract images: partition-parallel, batch-shaped
    * (iterator in, iterator out — no per-row task overhead). */
  def extractImageFeatures(ds: Dataset[MediaRow], dim: Int = 64): Dataset[ImageFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = StubCodec.decodeDims(r)
        ImageFeatures(r.media_id, w, h, StubCodec.features(r.bytes, dim))
      }
    }
  }

  /** Frame-sample videos into a long table of frames. */
  def sampleVideoFrames(ds: Dataset[MediaRow], everyMs: Long = 1000L): Dataset[Frame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "video").flatMap(r => StubCodec.sampleFrames(r, everyMs))
  }

  /** Resize images in place (bytes column rewritten, metadata updated). */
  def resizeImages(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { r =>
      if (r.kind == "image")
        r.copy(bytes = StubCodec.resize(r.bytes, w, h), width = Some(w), height = Some(h))
      else r
    }
  }

  /** Build a demo media table from the documents fixture (bytes = utf8 of
    * text) — exercises the binary-column plumbing against real parquet. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        lit("application/octet-stream").as("mime"),
        when(col("doc_id") % 3 === 0, lit(128)).otherwise(lit(null).cast("int")).as("width"),
        when(col("doc_id") % 3 === 0, lit(96)).otherwise(lit(null).cast("int")).as("height"),
        when(col("doc_id") % 3 === 1, lit(16000)).otherwise(lit(null).cast("int")).as("sample_rate"),
        when(col("doc_id") % 3 === 2, (col("n_chars") * 100).cast("long"))
          .otherwise(lit(null).cast("long")).as("duration_ms"))
      .as[MediaRow]
  }
}
