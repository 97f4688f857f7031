package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-local banding diagnostic (r18): measures the ACTUAL bucket
  * populations each multi-index hamming join would shuffle, per corpus
  * and per chunk layout, so banding decisions are driven by measured
  * key entropy instead of uniformity assumptions. For each fingerprint
  * family feeding [[graft.operators.Dedup.hammingNearDupPairs]] it
  * reports, per chunk count: distinct buckets, max / p99 population,
  * and Σ n·(n−1)/2 — the exact candidate-pair volume the equal-chunk
  * part of the join materializes (the r17 sf30 sweep measured
  * q_media_curate shuffle 9.83× at 3× data; this tool attributes it).
  *
  * Not driver-facing. Usage:
  *   SPARK_GRAFT_SF_DIR=target/scale/sf1 sbt "runMain graft.BandAudit"
  */
object BandAudit {

  def audit(df: DataFrame, hashCol: String, label: String, chunksList: Seq[Int]): Unit = {
    val fp = df.select(col(hashCol).cast("long").as("h")).persist()
    val n = fp.count()
    // identical-fingerprint class structure: how much of the corpus is
    // hamming-0 duplicates of itself (class pairs are TRUE output pairs;
    // a distinct-first core pays banding only on the support)
    locally {
      val cls = fp.groupBy("h").agg(count(lit(1)).as("sz"))
      val s = cls.agg(count(lit(1)).as("support"), max(col("sz")).as("maxClass"),
        sum(col("sz") * (col("sz") - 1) / 2).as("withinPairs")).collect()(0)
      System.err.println(
        f"[band] $label%-14s n=$n%9d DISTINCT support=${s.getLong(0)}%9d " +
          f"maxClass=${s.getLong(1)}%8d withinClassPairs=${s.getDouble(2).toLong}%12d")
    }
    // the r18 distinct-first core bands over the SUPPORT (one row per
    // distinct hash value) — member-level banding is the pre-r18 shape,
    // kept here for the before/after attribution
    for (chunks <- chunksList; (side, src) <- Seq(
        ("members", fp), ("support", fp.distinct()))) {
      val width = 64 / chunks
      val mask = if (width == 64) -1L else (1L << width) - 1
      val banded = src.select(explode(array((0 until chunks).map { c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("h"), c * width).bitwiseAND(mask).as("v"))
      }: _*)).as("k"))
      val pops = banded.groupBy("k").agg(count(lit(1)).as("n")).persist()
      val stats = pops.agg(
        count(lit(1)).as("buckets"),
        max(col("n")).as("maxPop"),
        expr("percentile_approx(n, 0.99)").as("p99"),
        sum(col("n") * (col("n") - 1) / 2).as("candPairs")).collect()(0)
      System.err.println(
        f"[band] $label%-14s n=$n%9d $side%-7s chunks=$chunks width=$width " +
          f"buckets=${stats.getLong(0)}%9d max=${stats.getLong(1)}%8d " +
          f"p99=${stats.get(2)}%8s candPairs=${stats.getDouble(3).toLong}%12d")
      pops.unpersist()
    }
    // Two-level composite key (the r18 refinement candidate): level-1
    // chunk (c, 16-bit v) × level-2 sub-chunk (c2, 12-bit v2) over the
    // 48 bits OUTSIDE chunk c. candPairs here is the equal-key join
    // volume of the refined plan (flip expansion adds a constant
    // factor on top, never a population term).
    locally {
      val m = 4; val w = 16; val m2 = 4; val w2 = 12
      val banded = fp.select(explode(array((for (c <- 0 until m; c2 <- 0 until m2) yield {
        // contiguous 48 bits OUTSIDE chunk c: bits above the chunk stay
        // low, bits below shift up behind them (no gaps, no shift-by-64)
        val high = if ((c + 1) * w == 64) lit(0L)
                   else shiftrightunsigned(col("h"), (c + 1) * w)
        val low = shiftleft(col("h").bitwiseAND((1L << (c * w)) - 1), 64 - (c + 1) * w)
        val rest = high.bitwiseOR(low)
        struct(lit(c).as("c"),
          shiftrightunsigned(col("h"), c * w).bitwiseAND((1L << w) - 1).as("v"),
          lit(c2).as("c2"),
          shiftrightunsigned(rest, c2 * w2).bitwiseAND((1L << w2) - 1).as("v2"))
      }).toSeq: _*)).as("k"))
      val pops = banded.groupBy("k").agg(count(lit(1)).as("n"))
      val stats = pops.agg(
        count(lit(1)).as("buckets"), max(col("n")).as("maxPop"),
        sum(col("n") * (col("n") - 1) / 2).as("candPairs")).collect()(0)
      System.err.println(
        f"[band] $label%-14s n=$n%9d TWO-LEVEL 4x16+4x12 " +
          f"buckets=${stats.getLong(0)}%9d max=${stats.getLong(1)}%8d " +
          f"candPairs=${stats.getDouble(2).toLong}%12d")
    }
    fp.unpersist()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions.{simhash64Replayable, tokens}

    val docs = sources.Tables.documents(spark, sfDir)
    val mm = graft.multimodal.Multimodal

    audit(docs.select(simhash64Replayable(tokens(col("text"))).as("sh")),
      "sh", "text-simhash", Seq(4, 8))
    audit(mm.imageDhash(mm.syntheticImageCorpusMemo(spark, sfDir)).toDF(),
      "dhash", "image-dhash", Seq(4, 8))
    audit(mm.audioFingerprints(mm.syntheticAudioCorpusMemo(spark, sfDir)).toDF(),
      "afp", "audio-afp", Seq(4, 8))
    audit(mm.videoFrameDhash(mm.syntheticVideoCorpusMemo(spark, sfDir), 200L).toDF(),
      "fhash", "video-fdhash", Seq(4, 8))

    spark.stop()
  }
}
