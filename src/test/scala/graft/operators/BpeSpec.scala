package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Gate for q_bpe_train / q_bpe_encode: the incremental merge loop is
  * pinned against an INDEPENDENT naive reference implementation (full
  * pair recount every iteration — different code path, same contract),
  * the encode loop round-trips, the distributed encode equals the
  * per-word reference, and the whole fit is partition-invariant. */
class BpeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  /** Naive reference BPE trainer: recount ALL pairs each iteration,
    * same deterministic argmax (count DESC, pair ASC). O(merges × V×L)
    * — fine at test scale, structurally unlike the incremental loop. */
  private def referenceTrain(
      counts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Seq[(List[String], Long)] = counts.map { case (w, f) =>
      (w.map(_.toString).toList :+ Bpe.EndOfWord, f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + f)
      }
      if (pc.isEmpty) done = true
      else {
        val best = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out += best
        words = words.map { case (syms, f) =>
          val b = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              b += (best._1 + best._2); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.toList, f)
        }
        k += 1
      }
    }
    out.toSeq
  }

  test("trainFromCounts matches the naive reference on the classic corpus " +
    "and on fixture-derived counts") {
    // Sennrich et al.'s worked example corpus
    val classic = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = Bpe.trainFromCounts(classic, 10).map(m => (m.left, m.right))
    assert(got == referenceTrain(classic, 10))
    // first merge must be the most frequent pair: ("e","s") occurs 6+3=9
    assert(got.head == ("e", "s"))

    val fixture = Bpe.wordCounts(
        graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
          .limit(120), "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy { case (w, f) => (-f, w) }
    val gotF = Bpe.trainFromCounts(fixture, 60).map(m => (m.left, m.right))
    assert(gotF == referenceTrain(fixture, 60))
    assert(gotF.size == 60)
  }

  test("encodeWord: tokens concatenate back to word + EndOfWord; fully " +
    "merged training words collapse; unseen characters fall back") {
    val merges = Bpe.trainFromCounts(
      Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 30)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    for (w <- Seq("low", "newest", "lowest", "wide", "zzz")) {
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString == w + Bpe.EndOfWord, s"round-trip broke for $w")
    }
    // 30 merges on a 4-word corpus saturate: every training word is 1 token
    assert(Bpe.encodeWord("newest", ranks) == List("newest" + Bpe.EndOfWord))
    // unseen script: nothing merges, pure character fallback
    assert(Bpe.encodeWord("zzz", ranks).length == 4)
  }

  test("train is partition-invariant and deterministic across runs") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.train(docs.repartition(1), "text", 40)
    val b = Bpe.train(docs.repartition(7), "text", 40)
    val c = Bpe.train(docs, "text", 40)
    assert(a == b && b == c)
  }

  test("distributed encodeCounts equals the per-word reference loop") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(80)
    val merges = Bpe.train(docs, "text", 50)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val got = Bpe.encodeCounts(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val rx = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.bpeishPattern)
    docs.select("doc_id", "text").collect().foreach { r =>
      val m = rx.matcher(r.getString(1).toLowerCase)
      var nw = 0L; var nb = 0L
      while (m.find()) {
        nw += 1; nb += Bpe.encodeWord(m.group(), ranks).length
      }
      assert(got(r.getLong(0)) == ((nw, nb)), s"doc ${r.getLong(0)}")
    }
    // compression sanity: learned merges make BPE strictly shorter than
    // characters and no shorter than whole words
    got.values.foreach { case (nw, nb) => assert(nb >= nw) }
  }

  test("incremental trainer matches the naive reference at a REALISTIC " +
    "vocabulary (3000 distinct synthetic words, 150 merges)") {
    // the fixture corpus has ~31 distinct words — too small to exercise
    // the pair->words inverted index, stale-entry re-scan, and count
    // bookkeeping under churn. Synthesize a Zipf-ish vocabulary from a
    // deterministic hash (no RNG): words of length 3-10 over a 12-letter
    // alphabet, frequency ~ 1/(rank+3).
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val counts = (0 until 3000).map { r =>
      val len = 3 + (mix(r * 7L + 1).abs % 8).toInt
      val w = (0 until len).map(i =>
        ('a' + (mix(r * 31L + i).abs % 12).toInt).toChar).mkString
      w -> (30000L / (r + 3) + 1L)
    }.groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }.toSeq
      .sortBy { case (w, f) => (-f, w) }
    val inc = Bpe.trainFromCounts(counts, 150).map(m => (m.left, m.right))
    assert(inc == referenceTrain(counts, 150))
    assert(inc.size == 150)
    // merged tokens must strictly grow: each rank's pair concatenation
    // is a NEW symbol, never a repeat
    assert(inc.map { case (l, r) => l + r }.distinct.size == 150)
  }

  test("vocabulary cap keeps top words deterministically and still trains") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val full = Bpe.wordCounts(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(full.size > 12, "fixture must exceed the test cap")
    val top = full.sortBy { case (w, f) => (-f, w) }.take(12)
    val capped = Bpe.train(docs, "text", 20, maxWords = 12)
    assert(capped == Bpe.trainFromCounts(top, 20))
  }
}
