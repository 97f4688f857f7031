package graft

import graft.flow.SparkTestSession
import graft.operators.{AsOfJoin, CorpusCuration, Dedup, Merge, TopK}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Degenerate-input behavior (empty frames, single rows) and randomized
  * equivalence against reference formulations — the classes of input the
  * curated fixtures never produce but a 100 TB pipeline eventually will.
  */
class RobustnessSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ---- empty inputs -------------------------------------------------

  test("empty corpus: near-dup pipeline, clusters and curation all yield empty, no errors") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashNearDup(empty, "doc_id", "text").count() == 0)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.nearDupClusters(noPairs).count() == 0)
    assert(CorpusCuration.curate(empty, "doc_id", "text").count() == 0)
  }

  test("empty sides: custom as-of join and TopK behave") {
    val l = Seq((1L, "a", 10L)).toDF("id", "k", "t")
    val r = Seq.empty[(String, Long, Double)].toDF("k", "t", "v")
    val out = AsOfJoin.asofMerge(l, r, Seq("k"), "t", "t", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> None)) // left row survives with NULL value
    val emptyLeft = AsOfJoin.asofMerge(
      l.filter(lit(false)), Seq(("a", 1L, 2.0)).toDF("k", "t", "v"),
      Seq("k"), "t", "t", Seq("v"))
    assert(emptyLeft.count() == 0)
    assert(TopK.perKey(l.filter(lit(false)), Seq("k"), Seq("t"), 3).count() == 0)
  }

  test("merge with an empty source leaves the store unchanged") {
    val path = java.nio.file.Files.createTempDirectory("graft_rob").toString + "/t"
    Seq((1L, "a")).toDF("k", "v").write.parquet(path)
    val out = Merge.into(spark, path,
      Seq.empty[(Long, String)].toDF("k", "v"), Seq("k"))
    assert(out.as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  // ---- randomized equivalence --------------------------------------

  test("property: TopK.perKey equals sort-take reference on random data") {
    val gen = Gen.listOfN(300, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.chooseNum(-1000L, 1000L)
      id <- Gen.chooseNum(0L, 10000L)
    } yield (k, v, id))
    for (seed <- 1L to 5L) {
      val rows = sample(gen, seed)
      val df = rows.toDF("k", "v", "id")
      val got = TopK.perKey(df, Seq("k"), Seq("v", "id"), 4)
        .as[(String, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
        g.map(r => (r._2, r._3)).sorted(Ordering[(Long, Long)].reverse)
          .take(4).map { case (v, id) => (k, v, id) }
      }.toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("property: custom as-of exec equals window formulation on random events") {
    val gen = for {
      lefts <- Gen.listOfN(60, for {
        k <- Gen.oneOf("u1", "u2", "u3")
        t <- Gen.chooseNum(0L, 100L)
      } yield (k, t))
      rights <- Gen.listOfN(40, for {
        k <- Gen.oneOf("u1", "u2", "u3", "u4")
        t <- Gen.chooseNum(0L, 100L)
        v <- Gen.chooseNum(0.0, 9.0)
      } yield (k, t, v))
    } yield (lefts, rights)
    for (seed <- 1L to 5L) {
      val (lefts, rights) = sample(gen, seed)
      val l = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("id", "k", "t")
      // distinct (k,t,v) on the right: with duplicate (k,t) keys the
      // "latest" row is ambiguous and both formulations tie-break
      // differently — dedup to the max v per (k,t), which is what a real
      // feed with a primary key looks like
      val r = rights.groupBy(x => (x._1, x._2)).map { case ((k, t), g) =>
        (k, t, g.map(_._3).max)
      }.toSeq.toDF("k", "t", "v")
      val expected = AsOfJoin.asof(l, r, Seq("k"), "t", "t", Seq("v"))
        .select("id", "v").as[(Long, Option[Double])].collect().toMap
      val got = AsOfJoin.asofMerge(l, r, Seq("k"), "t", "t", Seq("v"))
        .select("id", "v").as[(Long, Option[Double])].collect().toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  // ---- partition-count stability (accumulation-order determinism) ---
  //
  // avg/stddev/sum over doubles accumulate in partition order; a query
  // that rounds arithmetic on those aggregates must quantize the group
  // stats first or its output can flip at a rounding boundary when the
  // partitioning changes (the r10 driver-red q_feature_scale flake).
  // Gate: identical bytes at 1 / 4 / 32 shuffle partitions AND with the
  // scan split into many tiny file-partitions.

  private val accumulationSensitive =
    Seq("q_feature_scale", "q_target_encode", "q_agg_stats",
      "q_stats_moments", "q_regr", "q_ewma", "q_drift_psi",
      "q_cusum", "q_robust_scale")

  test("accumulation-sensitive queries are byte-stable across partitionings") {
    val dir = "/root/testdata/sf0.001"
    val conf = spark.conf
    val origShuffle = conf.get("spark.sql.shuffle.partitions")
    val origBytes = conf.get("spark.sql.files.maxPartitionBytes")
    def runAll(shuffle: Int, maxBytes: String): Map[String, Seq[String]] = {
      conf.set("spark.sql.shuffle.partitions", shuffle.toString)
      conf.set("spark.sql.files.maxPartitionBytes", maxBytes)
      accumulationSensitive.map { q =>
        q -> SparkEntry.queries(q)(spark, dir).collect().toSeq
          .map(_.toString).sorted
      }.toMap
    }
    try {
      val base = runAll(32, origBytes)
      for ((shuffle, mb) <- Seq((1, "16384"), (4, "65536"), (32, "1048576"))) {
        val got = runAll(shuffle, mb)
        for (q <- accumulationSensitive)
          assert(got(q) == base(q),
            s"$q unstable at shuffle=$shuffle maxPartitionBytes=$mb")
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", origShuffle)
      conf.set("spark.sql.files.maxPartitionBytes", origBytes)
    }
  }

  test("property: fused text minhash equals composed pipeline on random unicode-ish text") {
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.const('\t'),
      1 -> Gen.const('é'), 1 -> Gen.const('中'))
    val textGen = Gen.listOfN(80, charGen).map(_.mkString)
    for (seed <- 1L to 5L) {
      val texts = sample(Gen.listOfN(30, textGen), seed)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val both = df.select(
        graft.functions.TextFunctions.minhashTextSignature(col("text"), 3, 32, 7).as("fused"),
        graft.functions.TextFunctions.minhashSignatureFast(
          graft.functions.TextFunctions.shingles(col("text"), 3), 32, 7).as("composed"))
      assert(both.filter(col("fused") =!= col("composed")).count() == 0, s"seed=$seed")
    }
  }
}
