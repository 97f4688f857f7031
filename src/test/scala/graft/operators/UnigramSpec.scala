package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Gate for q_unigram_train / q_unigram_encode (the BpeSpec discipline —
  * independent naive reference, partition invariance, distributed =
  * per-word): the forward–backward E-step is pinned against an
  * ENUMERATE-ALL-SEGMENTATIONS reference (different code path, exact
  * posterior), Viterbi decode against an enumerate-argmax reference,
  * training is partition-invariant, char coverage never breaks, and the
  * distributed encodeCounts equals the per-word loop. */
class UnigramSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  /** All segmentations of `w` into pieces of the vocabulary (any length
    * ≤ maxPieceLen) — exponential, test-scale only. */
  private def segmentations(
      w: String, vocab: Set[String], maxPieceLen: Int): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(w.length, maxPieceLen)).flatMap { k =>
      val head = w.substring(0, k)
      if (vocab(head))
        segmentations(w.substring(k), vocab, maxPieceLen).map(head :: _)
      else Nil
    }

  test("forward–backward expected counts equal the exact enumeration " +
    "posterior on a nontrivial lattice") {
    val pieces = Array("a", "b", "ab", "ba", "aba", "bb")
    val probs = Array(0.30, 0.25, 0.20, 0.10, 0.10, 0.05)
    val logp = probs.map(math.log)
    val idx = pieces.zipWithIndex.toMap
    val words = Array("abab", "babb", "aabba")
    val freqs = Array(3.0, 2.0, 5.0)

    val (got, gotLL) =
      Unigram.expectedCounts(words, freqs, idx, logp, maxPieceLen = 8)

    // exact posterior: P(seg) ∝ Π p(piece); E[count(p)] = Σ_seg P(seg|w)·#p
    val want = new Array[Double](pieces.length)
    var wantLL = 0.0
    for (((w, f)) <- words.zip(freqs)) {
      val segs = segmentations(w, pieces.toSet, 8)
      val weights = segs.map(_.map(p => probs(idx(p))).product)
      val z = weights.sum
      assert(z > 0, s"no segmentation for $w")
      wantLL += f * math.log(z)
      for ((seg, wt) <- segs.zip(weights); p <- seg)
        want(idx(p)) += f * wt / z
    }
    for (i <- pieces.indices)
      assert(math.abs(got(i) - want(i)) < 1e-9,
        s"piece ${pieces(i)}: got ${got(i)} want ${want(i)}")
    assert(math.abs(gotLL - wantLL) < 1e-9)
  }

  test("viterbiLL equals the enumeration max, and the exclusion probe " +
    "removes exactly the excluded piece's paths") {
    val pieces = Array("a", "b", "ab", "abc", "c")
    val probs = Array(0.3, 0.2, 0.25, 0.2, 0.05)
    val logp = probs.map(math.log)
    val idx = pieces.zipWithIndex.toMap
    for (w <- Seq("abc", "abab", "cab", "aabbcc")) {
      val segs = segmentations(w, pieces.toSet, 8)
      val want = segs.map(_.map(p => math.log(probs(idx(p)))).sum).max
      assert(math.abs(
        Unigram.viterbiLL(w, idx, logp, 8, excl = -1) - want) < 1e-12, w)
    }
    // excluding "abc": best path for "abc" must re-segment without it
    val withAbc = Unigram.viterbiLL("abc", idx, logp, 8, excl = -1)
    val without = Unigram.viterbiLL("abc", idx, logp, 8, excl = idx("abc"))
    assert(withAbc == math.log(0.2)) // the whole-word piece wins
    val altWant = segmentations("abc", pieces.toSet - "abc", 8)
      .map(_.map(p => math.log(probs(idx(p)))).sum).max
    assert(math.abs(without - altWant) < 1e-12)
  }

  test("log-space E-step: a 300-char word (where linear-space alphas " +
    "underflow to zero) still contributes expected counts and LL") {
    val pieces = Array("a", "b")
    val logp = Array(math.log(0.004), math.log(0.996)) // tiny 'a' prob
    val idx = pieces.zipWithIndex.toMap
    val w = "ab" * 150 // 300 chars, best path ~150·log(0.004) ≈ -828
    val (exp, ll) = Unigram.expectedCounts(
      Array(w), Array(2.0), idx, logp, maxPieceLen = 1)
    // single segmentation (only chars in vocab at maxPieceLen=1):
    // exact counts 150·f each, LL = f·(150·log .004 + 150·log .996)
    assert(math.abs(exp(0) - 300.0) < 1e-6, s"a-count ${exp(0)}")
    assert(math.abs(exp(1) - 300.0) < 1e-6, s"b-count ${exp(1)}")
    val want = 2.0 * 150 * (math.log(0.004) + math.log(0.996))
    assert(math.abs(ll - want) < 1e-6, s"ll $ll want $want")
  }

  test("trainFromCounts: target size hit, full char coverage, probs " +
    "normalize, frequent whole words survive pruning") {
    val counts = Seq(
      "low" -> 50L, "lower" -> 20L, "lowest" -> 12L,
      "new" -> 40L, "newest" -> 60L, "wide" -> 9L, "widest" -> 30L)
    val vocab = Unigram.trainFromCounts(counts, vocabSize = 16)
    assert(vocab.size == 16)
    val pieces = vocab.map(_.piece).toSet
    // coverage: every character of the corpus is a piece
    val chars = counts.map(_._1).mkString.toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    // a proper distribution (within EM's floor tolerance)
    val mass = vocab.map(p => math.exp(p.logprob)).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"prob mass $mass")
    // the dominant words earn whole-word pieces at this budget
    assert(pieces.contains("est") || pieces.contains("newest"),
      s"high-freq unit missing from $pieces")
    // deterministic: identical rerun
    assert(Unigram.trainFromCounts(counts, vocabSize = 16) == vocab)
  }

  test("train is partition-invariant and deterministic across runs") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = Unigram.train(docs.repartition(1), "text", vocabSize = 96)
    val b = Unigram.train(docs.repartition(7), "text", vocabSize = 96)
    val c = Unigram.train(docs, "text", vocabSize = 96)
    assert(a == b && b == c)
    assert(a.size == 96)
  }

  test("encodeWord: pieces concatenate back; Viterbi picks the " +
    "enumeration argmax; unseen chars fall back without breaking") {
    val counts = Seq("low" -> 50L, "newest" -> 60L, "widest" -> 30L)
    val vocab = Unigram.trainFromCounts(counts, vocabSize = 14)
    val ranks = vocab.map(p => p.piece -> p.logprob).toMap
    for (w <- Seq("low", "newest", "lowest", "wide", "news"))
      assert(Unigram.encodeWord(w, ranks).mkString == w, s"round-trip $w")
    // argmax agreement on vocabulary-covered words
    val idx = vocab.map(_.piece).zipWithIndex.toMap
    val logp = vocab.map(_.logprob).toArray
    for (w <- Seq("low", "newest", "widest")) {
      val got = Unigram.encodeWord(w, ranks)
        .map(p => ranks(p)).sum
      assert(math.abs(got - Unigram.viterbiLL(w, idx, logp, 8, -1)) < 1e-12, w)
    }
    // unseen script: per-char fallback, never an exception or empty
    assert(Unigram.encodeWord("zzz", ranks).mkString == "zzz")
    assert(Unigram.encodeWord("", ranks).isEmpty)
  }

  test("distributed encodeCounts equals the per-word reference loop") {
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(80)
    val vocab = Unigram.train(docs, "text", vocabSize = 120)
    val ranks = vocab.map(p => p.piece -> p.logprob).toMap
    val got = Unigram.encodeCounts(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val rx = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.bpeishPattern)
    docs.select("doc_id", "text").collect().foreach { r =>
      val m = rx.matcher(r.getString(1).toLowerCase)
      var nw = 0L; var nt = 0L
      while (m.find()) {
        nw += 1; nt += Unigram.encodeWord(m.group(), ranks).length
      }
      assert(got(r.getLong(0)) == ((nw, nt)), s"doc ${r.getLong(0)}")
    }
    got.values.foreach { case (nw, nt) => assert(nt >= nw) }
  }
}
