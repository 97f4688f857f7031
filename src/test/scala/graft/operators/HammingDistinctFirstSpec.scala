package graft.operators

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r18: the distinct-first multi-index hamming core. The pair contract
  * (every unordered pair within maxHamming, exact hamming) must be
  * invariant to the internal rework — identical-fingerprint classes
  * collapse to representatives for the banded join and expand back at
  * the output — and the new cluster-level API must produce exactly the
  * labels [[Dedup.nearDupClusters]] assigns over the pair output. */
class HammingDistinctFirstSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Structured fixture with heavy identical-hash classes (the
    * saturated-manifold shape the r17 sf30 sweep measured): a few base
    * codes, each replicated into a class of ids, plus radius-spread
    * near neighbors and unrelated far codes. */
  private def fixture: Seq[(Long, Long)] = {
    val bases = Seq(0x0f0f0f0f12345678L, 0x00ff00ff00ff00ffL, 0x7777000011112222L)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var id = 0L
    for ((b, bi) <- bases.zipWithIndex) {
      // identical class: sizes 1, 3, 5
      for (_ <- 0 to 2 * bi) { rows += ((id, b)); id += 1 }
      // near neighbor spreading bits across three 16-bit chunks
      rows += ((id, b ^ (1L << 3) ^ (1L << 19) ^ (1L << 47))); id += 1
      // a second identical class AT the neighbor code
      rows += ((id, b ^ (1L << 3) ^ (1L << 19) ^ (1L << 47))); id += 1
      // borderline: exactly maxHamming+1 bits away for maxHamming=3
      rows += ((id, b ^ 0xf0L)); id += 1
    }
    rows.toSeq
  }

  private def brute(rows: Seq[(Long, Long)], maxH: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxH
    } yield (ia, ib, d)).toSet

  test("pair contract equals brute force, duplicates included, at auto " +
    "and explicit chunk layouts") {
    val rows = fixture
    val df = rows.toDF("id", "h")
    for ((maxH, chunks) <- Seq((3, 0), (3, 4), (3, 2), (6, 0), (6, 4), (0, 0), (7, 4))) {
      val got = Dedup.hammingNearDupPairs(df, "id", "h", maxH, chunks)
        .as[(Long, Long, Int)].collect()
      assert(got.length == got.toSet.size,
        s"duplicate pair rows at maxH=$maxH chunks=$chunks")
      assert(got.toSet == brute(rows, maxH),
        s"pair set mismatch at maxH=$maxH chunks=$chunks")
    }
  }

  test("autoChunks: widest layout sound for the bound") {
    assert(Dedup.autoChunks(0) == 1)
    assert(Dedup.autoChunks(1) == 1)
    assert(Dedup.autoChunks(2) == 2)
    assert(Dedup.autoChunks(3) == 2)
    assert(Dedup.autoChunks(4) == 4)
    assert(Dedup.autoChunks(7) == 4)
    assert(Dedup.autoChunks(8) == 8)
    assert(Dedup.autoChunks(15) == 8)
    assert(Dedup.autoChunks(64) == 64)
  }

  test("hammingNearDupClusters equals nearDupClusters over the pair " +
    "output (singletons labeled with their own id)") {
    val rows = fixture
    val df = rows.toDF("id", "h")
    val viaPairs = {
      val pairs = Dedup.hammingNearDupPairs(df, "id", "h", 3)
        .select("id_a", "id_b")
      val labels = Dedup.nearDupClusters(pairs)
      df.join(labels, df("id") === labels("id"), "left")
        .select(df("id"), coalesce(col("cluster"), df("id")).as("cluster"))
        .as[(Long, Long)].collect().toSet
    }
    val direct = Dedup.hammingNearDupClusters(df, "id", "h", 3)
      .as[(Long, Long)].collect().toSet
    assert(direct == viaPairs)
    assert(direct.map(_._1) == rows.map(_._1).toSet, "every id labeled")
  }

  test("groupCols: pairs form only within equal groups, one output row " +
    "per matching group") {
    // videos A=1,B=2,C=3; frames 0..2. A and B agree (hamming 0 or 1)
    // on frames 0 and 1, disagree on 2; C matches A on frame 0 with the
    // SAME code B has on frame 1 — cross-group leakage would pair B/C.
    val code0 = 0x1234567890abcdefL
    val code1 = 0x0f0f0f0f0f0f0f0fL
    val far = ~code0
    val frames = Seq(
      (1L, 0, code0), (1L, 1, code1), (1L, 2, far),
      (2L, 0, code0 ^ 1L), (2L, 1, code1), (2L, 2, ~code1),
      (3L, 0, code1)).toDF("id", "g", "h")
    val got = Dedup.hammingNearDupPairs(
        frames, "id", "h", maxHamming = 3, groupCols = Seq("g"))
      .as[(Long, Long, Int)].collect().toList.sorted
    // A-B on frame 0 (hamming 1) and frame 1 (hamming 0); nothing else
    assert(got == List((1L, 2L, 0), (1L, 2L, 1)))
  }

  test("null hashes never pair") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, None))
      .toDF("id", "h")
    val got = Dedup.hammingNearDupPairs(df, "id", "h", 3)
      .as[(Long, Long, Int)].collect()
    assert(got.isEmpty)
  }
}
