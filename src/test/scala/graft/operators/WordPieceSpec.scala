package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Gate for q_wordpiece_train / q_wordpiece_encode: the incremental
  * likelihood-score merge loop is pinned against an INDEPENDENT naive
  * reference (full pair + symbol recount every iteration — different
  * code path, same contract), the trainer is proven to maximize the
  * LIKELIHOOD score rather than raw pair frequency (the property that
  * distinguishes WordPiece from BPE), greedy longest-match encoding
  * round-trips with [UNK] fallback, the distributed encode equals the
  * per-word reference, and the whole fit is partition-invariant. */
class WordPieceSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  /** Naive reference WordPiece trainer: recount ALL pair and symbol
    * frequencies each iteration; same exact-BigInt score compare, no
    * inverted index, no incremental bookkeeping. O(vocab × V×L) — fine
    * at test scale, structurally unlike the incremental loop. */
  private def referenceTrain(
      counts: Seq[(String, Long)], vocabSize: Int): Seq[String] = {
    val C = WordPiece.Continuation
    var words: Seq[(List[String], Long)] = counts.map { case (w, f) =>
      (w.zipWithIndex.map { case (ch, i) =>
        if (i == 0) ch.toString else C + ch
      }.toList, f)
    }
    val alphabet = words.flatMap(_._1).distinct
      .sortBy(s => (s.startsWith(C), s))
    val vocab = scala.collection.mutable.ArrayBuffer(WordPiece.Unk)
    vocab ++= alphabet
    var done = false
    while (vocab.length < vocabSize && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sc = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (syms, f) =>
        syms.foreach(s => sc(s) = sc.getOrElse(s, 0L) + f)
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + f)
      }
      if (pc.isEmpty) done = true
      else {
        // exact-ratio argmax: score = c/(sc(l)*sc(r)) via BigInt
        // cross-multiplication; ties on count DESC then pair ASC
        var best: (String, String) = null
        var bestC = 0L
        pc.toSeq.sortBy(_._1).foreach { case (p, c) =>
          val take =
            if (best == null) true
            else {
              val lhs = BigInt(c) * BigInt(sc(best._1)) * BigInt(sc(best._2))
              val rhs = BigInt(bestC) * BigInt(sc(p._1)) * BigInt(sc(p._2))
              if (lhs != rhs) lhs > rhs
              else if (c != bestC) c > bestC
              else false // pair-ASC iteration: first seen wins ties
            }
          if (take) { best = p; bestC = c }
        }
        val merged = best._1 + best._2.stripPrefix(C)
        vocab += merged
        words = words.map { case (syms, f) =>
          val b = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              b += merged; i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.toList, f)
        }
      }
    }
    vocab.toSeq
  }

  test("first merge maximizes the LIKELIHOOD score, not raw pair " +
    "frequency — the property that makes this WordPiece and not BPE") {
    // pair (a,##b): count 10 but a is very common → score 10/(100·10)=0.01
    // pair (x,##y): count 2, both rare            → score  2/(2·2)  =0.5
    val counts = Seq("ab" -> 10L, "a" -> 90L, "xy" -> 2L)
    val vocab = WordPiece.trainFromCounts(counts, vocabSize = 7)
    val firstMerged = vocab.map(_.token)
      .find(t => t.length > 1 && t != WordPiece.Unk && !t.startsWith("##"))
    assert(firstMerged.contains("xy"),
      s"likelihood argmax must pick xy over the frequent ab; got $vocab")
    // BPE's frequency argmax on the same counts picks the (a,</w>) pair
    // (count 90) — NOT the rare-but-associated (x,y)
    val bpeFirst = Bpe.trainFromCounts(counts, 1).head
    assert((bpeFirst.left, bpeFirst.right) == ("a", Bpe.EndOfWord))
  }

  test("trainFromCounts matches the naive reference on fixture counts") {
    val fixture = Bpe.wordCounts(
        graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
          .limit(120), "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy { case (w, f) => (-f, w) }
    val got = WordPiece.trainFromCounts(fixture, 80).map(_.token)
    assert(got == referenceTrain(fixture, 80))
    assert(got.head == WordPiece.Unk)
  }

  test("incremental trainer matches the naive reference at a REALISTIC " +
    "vocabulary (3000 distinct synthetic words)") {
    // deterministic Zipf-ish vocabulary, no RNG (the BpeSpec generator)
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
    val inc = WordPiece.trainFromCounts(counts, 180).map(_.token)
    assert(inc == referenceTrain(counts, 180))
    assert(inc.length == 180)
    // every learned (non-alphabet) token is new — never a repeat
    assert(inc.distinct.length == 180)
  }

  test("encodeWord: greedy longest-match with ## continuation; " +
    "round-trips; whole-word [UNK] on any unmatchable span; length guard") {
    val counts = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val vocab = WordPiece.trainFromCounts(counts, vocabSize = 40)
    val vset = vocab.map(_.token).toSet
    for (w <- Seq("low", "newest", "lowest", "wide")) {
      val toks = WordPiece.encodeWord(w, vset)
      assert(toks.head != WordPiece.Unk, s"$w must encode (alphabet covers it)")
      assert(toks.head + toks.tail.map(_.stripPrefix("##")).mkString == w,
        s"round-trip broke for $w: $toks")
      // continuation discipline: first bare, rest ##-prefixed
      assert(toks.tail.forall(_.startsWith("##")), s"$w: $toks")
    }
    // saturated training words collapse to one piece
    assert(WordPiece.encodeWord("newest", vset) == List("newest"))
    // unknown character anywhere → whole-word [UNK], the BERT contract
    assert(WordPiece.encodeWord("lowzz", vset + "##z") != List(WordPiece.Unk))
    assert(WordPiece.encodeWord("loqw", vset) == List(WordPiece.Unk))
    // BERT's 200-char guard
    assert(WordPiece.encodeWord("l" * 201, vset) == List(WordPiece.Unk))
  }

  test("train is partition-invariant and deterministic across runs") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = WordPiece.train(docs.repartition(1), "text", 120)
    val b = WordPiece.train(docs.repartition(7), "text", 120)
    val c = WordPiece.train(docs, "text", 120)
    assert(a == b && b == c)
  }

  test("distributed encodeCounts equals the per-word reference loop") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(80)
    val vocab = WordPiece.train(docs, "text", 120)
    val vset = vocab.map(_.token).toSet
    val got = WordPiece.encodeCounts(docs, "doc_id", "text", vocab)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val rx = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.bpeishPattern)
    docs.select("doc_id", "text").collect().foreach { r =>
      val m = rx.matcher(r.getString(1).toLowerCase)
      var nw = 0L; var nt = 0L; var nu = 0L
      while (m.find()) {
        val enc = WordPiece.encodeWord(m.group(), vset)
        nw += 1; nt += enc.length
        if (enc == List(WordPiece.Unk)) nu += 1
      }
      assert(got(r.getLong(0)) == ((nw, nt, nu)), s"doc ${r.getLong(0)}")
    }
    // alphabet coverage: the fixture's own corpus has no UNKs
    got.values.foreach { case (_, _, nu) => assert(nu == 0L) }
  }

  test("vocabulary save/load round-trips and the loaded table encodes " +
    "identically") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(60)
    val vocab = WordPiece.train(docs, "text", 100)
    val dir = graft.GraftQuery.tempDir("graft_wp_store") + "/v"
    try {
      WordPiece.saveVocab(spark, vocab, dir)
      val loaded = WordPiece.loadVocab(spark, dir)
      assert(loaded == vocab)
      val a = WordPiece.encodeCounts(docs, "doc_id", "text", vocab)
        .collect().map(_.toSeq).toSeq
      val b = WordPiece.encodeCounts(docs, "doc_id", "text", loaded)
        .collect().map(_.toSeq).toSeq
      assert(a == b)
    } finally graft.GraftQuery.deleteRecursively(
      new java.io.File(dir).getParentFile)
  }

  test("maxWords cap vs uncapped: identical merge sequence on a Zipf " +
    "fixture whose tail mass sits below every score gap (the documented " +
    "cap regime)") {
    import spark.implicits._
    // The cap-safe regime the scaladoc documents, constructed so it
    // PROVABLY holds for the likelihood score count(ab)/(count(a)·
    // count(b)): a Zipf head of 8 high-frequency words (letter x
    // repeated 4x, freq 3000/rank — distinct frequencies, so head score
    // gaps are factor-of-rank sized) plus a 200-word freq-1 tail built
    // ONLY from head letters. Tail pairs then score ~1/(F_x·3F_y) —
    // an extra 1/F factor below every head score ~1/(3F) — and tail
    // mass perturbs head unit counts by <= 400/F relatively, far under
    // the inter-letter gaps. Head merges therefore win every round in
    // BOTH runs and the capped (head-only) fit equals the uncapped one.
    val letters = "abcdefgh"
    val head = letters.zipWithIndex.map { case (c, r) =>
      (c.toString * 4, 3000L / (r + 1))
    }
    val tail = (for {
      a <- letters; b <- letters if a != b
      c <- letters.take(4) if c != b
    } yield s"$a$b$c").distinct.take(200).map(w => (w, 1L))
    val docs = (head ++ tail).zipWithIndex.map { case ((w, f), i) =>
      (i.toLong, Seq.fill(f.toInt)(w).mkString(" "))
    }.toDF("doc_id", "text")
    // IN the safe regime — a vocab budget that ends while head scores
    // still dominate (the first merges, where inter-letter frequency
    // gaps are factors of rank) — capped ≡ uncapped, real merges learned:
    val capped = WordPiece.train(docs, "text", vocabSize = 21, maxWords = 8)
    val uncapped = WordPiece.train(docs, "text", vocabSize = 21, maxWords = 1 << 16)
    assert(capped.size == 21 && capped.count(_.token.length > 1) >= 4,
      "fixture must learn real merges beyond the alphabet")
    assert(capped == uncapped,
      "cap perturbed the merge sequence in its documented-safe regime")
    // BEYOND the regime the cap is NOT free (the scaladoc's 100 TB
    // warning): a budget deep enough that head units get consumed lets
    // tail-pair scores compete (their denominators collapse), and the
    // sequences measurably drift — the documented reason production
    // callers must size maxWords to their memory budget, not trust the
    // default.
    val cappedDeep = WordPiece.train(docs, "text", vocabSize = 33, maxWords = 8)
    val uncappedDeep = WordPiece.train(docs, "text", vocabSize = 33, maxWords = 1 << 16)
    assert(cappedDeep != uncappedDeep,
      "expected the documented out-of-regime divergence — if this now " +
        "holds, the scaladoc's cap warning may be strengthenable")
  }
}
