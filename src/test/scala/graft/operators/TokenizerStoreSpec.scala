package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer persistence (train once, encode everywhere) and the
  * sampled subword-regularization encode: save→load round-trips are
  * exact for both families, a loaded vocabulary encodes identically to
  * the in-memory one, and lattice sampling (a) always concatenates back,
  * (b) is a pure function of (word, seed) hence partition-invariant,
  * (c) matches the exact lattice posterior in distribution, and
  * (d) degenerates to Viterbi as alpha grows. */
class TokenizerStoreSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"
  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("BPE merges and unigram vocab save→load round-trip exactly, and " +
    "the loaded tables encode identically") {
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(100)
    val merges = Bpe.train(docs, "text", numMerges = 60)
    val mDir = tmp("graft_bpe_store") + "/m"
    Bpe.saveMerges(spark, merges, mDir)
    assert(Bpe.loadMerges(spark, mDir) == merges)

    val vocab = Unigram.train(docs, "text", vocabSize = 96)
    val vDir = tmp("graft_uni_store") + "/v"
    Unigram.saveVocab(spark, vocab, vDir)
    val loaded = Unigram.loadVocab(spark, vDir)
    assert(loaded == vocab)

    // loaded tables drive the SAME distributed encode
    val a = Unigram.encodeCounts(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = Unigram.encodeCounts(docs, "doc_id", "text", loaded)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a == b)
  }

  test("ByteBpe merges save→load round-trip exactly and the loaded table " +
    "encodes identically on multi-script text (r17 verdict #8)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "größer straße füße — l'élève français"),
      (3L, "漢字かな交じり文 and emoji 🦀🦀 mixed"),
      (4L, "control\tchars\nand  doubled  spaces"),
      (5L, "the the the quick quick brown")).toDF("doc_id", "text")
    val merges = ByteBpe.train(docs, "text", numMerges = 40)
    val dir = tmp("graft_bytebpe_store") + "/m"
    Bpe.saveMerges(spark, merges, dir)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded == merges)
    val a = ByteBpe.encodeCounts(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val b = ByteBpe.encodeCounts(docs, "doc_id", "text", loaded)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(a == b)
    assert(a.nonEmpty && a.values.forall { case (_, nTok, nBytes) => nTok <= nBytes })
  }

  test("sampleWord: concatenates back, deterministic per (word, seed), " +
    "different across seeds, unseen chars fall back") {
    val vocab = Unigram.trainFromCounts(
      Seq("low" -> 50L, "newest" -> 60L, "widest" -> 30L), vocabSize = 14)
    val ranks = vocab.map(p => p.piece -> p.logprob).toMap
    for (w <- Seq("low", "newest", "lowest", "news", "zzz"); s <- 1L to 5L) {
      val toks = Unigram.sampleWord(w, ranks, alpha = 0.2, seed = s)
      assert(toks.mkString == w, s"round-trip $w seed $s")
      assert(Unigram.sampleWord(w, ranks, 0.2, s) == toks, "determinism")
    }
    // across many seeds a lattice with genuinely competing paths must
    // produce >1 distinct segmentation at small alpha (that IS the
    // regularization) — hand-built vocab: the trained toy corpus above
    // saturates "newest" into one dominant piece with nothing to sample
    val flat = Map("a" -> math.log(0.4), "b" -> math.log(0.3),
      "ab" -> math.log(0.3))
    val distinct = (1L to 64L)
      .map(s => Unigram.sampleWord("abab", flat, alpha = 0.5, seed = s))
      .distinct
    assert(distinct.size > 1, s"no segmentation diversity: $distinct")
  }

  test("sampling distribution matches the exact alpha-tempered lattice " +
    "posterior (tiny vocab, enumerated)") {
    val pieces = Array("a", "b", "ab")
    val probs = Array(0.5, 0.3, 0.2)
    val ranks = pieces.zip(probs.map(math.log)).toMap
    val alpha = 1.0
    // "ab" has two segmentations: [ab] p=.2 and [a,b] p=.15 →
    // posterior 4/7 vs 3/7
    val n = 4000
    val hits = (1 to n).count(s =>
      Unigram.sampleWord("ab", ranks, alpha, seed = s.toLong) == List("ab"))
    val want = 0.2 / (0.2 + 0.5 * 0.3)
    val got = hits.toDouble / n
    assert(math.abs(got - want) < 0.03, s"got $got want $want")
  }

  test("alpha -> large degenerates to the Viterbi segmentation") {
    val vocab = Unigram.trainFromCounts(
      Seq("low" -> 50L, "newest" -> 60L, "widest" -> 30L), vocabSize = 14)
    val ranks = vocab.map(p => p.piece -> p.logprob).toMap
    for (w <- Seq("newest", "low", "widest"); s <- 1L to 10L)
      assert(Unigram.sampleWord(w, ranks, alpha = 50.0, seed = s) ==
        Unigram.encodeWord(w, ranks), s"$w seed $s")
  }

  test("distributed sampledCounts equals the per-word reference and is " +
    "partition-invariant") {
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(60)
    val vocab = Unigram.train(docs, "text", vocabSize = 96)
    val ranks = vocab.map(p => p.piece -> p.logprob).toMap
    val got = Unigram.sampledCounts(docs, "doc_id", "text", vocab,
        alpha = 0.2, seed = 7L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val gotRepart = Unigram.sampledCounts(docs.repartition(7), "doc_id",
        "text", vocab, alpha = 0.2, seed = 7L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == gotRepart, "partition invariance")
    val rx = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.bpeishPattern)
    docs.select("doc_id", "text").collect().foreach { r =>
      val m = rx.matcher(r.getString(1).toLowerCase)
      var nw = 0L; var nt = 0L
      while (m.find()) {
        nw += 1
        nt += Unigram.sampleWord(m.group(), ranks, 0.2, 7L).length
      }
      assert(got(r.getLong(0)) == ((nw, nt)), s"doc ${r.getLong(0)}")
    }
    // a different epoch seed produces a different (valid) tokenization
    val other = Unigram.sampledCounts(docs, "doc_id", "text", vocab,
        alpha = 0.2, seed = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(other.keys == got.keys)
  }
}
