package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application, Spark-first.
  *
  * Scale shape (why this holds at 100 TB): the only corpus-sized work is
  * ONE distributed word count (explode + groupBy — the same shuffle
  * q_token_count already pays). The merge loop then runs over the
  * word-frequency TABLE, whose size is the corpus' distinct-word count,
  * capped at `maxWords` with a loud log — never over the corpus. This is
  * the published trainer shape (Sennrich et al., ACL 2016, learn merges
  * from word counts; production tokenizer trainers do the same): a
  * 100 TB corpus and a 100 GB corpus with the same vocabulary train in
  * the same driver time after the one count shuffle. The loop itself is
  * the standard incremental variant — a pair→words inverted index so
  * each merge touches only the words that contain the merged pair, not
  * the whole vocabulary.
  *
  * Encoding broadcasts the merge ranks and maps partitions with a
  * per-partition word→tokens memo; under a Zipfian corpus the memo hit
  * rate IS the speedup (the head of the distribution encodes once per
  * partition).
  *
  * Determinism (SURVEY §7.4 discipline): word cap keeps top-`maxWords`
  * by (count DESC, word ASC); each merge picks the pair with the
  * highest count, ties broken lexicographically on (left, right). No
  * RNG, no float accumulation — merge sequences are reproducible across
  * runs, partitionings, and JVMs.
  */
object Bpe {

  /** End-of-word sentinel appended to every word's symbol sequence so
    * merges can learn word-final units ("est</w>" vs mid-word "est"). */
  val EndOfWord = "</w>"

  final case class BpeMerge(rank: Int, left: String, right: String)

  /** Distributed word frequencies under the library's BPE-ish
    * pre-tokenizer (letter runs / single digits / punctuation —
    * [[graft.functions.TextFunctions.bpeishTokens]]), lowercased. One
    * explode + one groupBy; columns (word, freq). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(graft.functions.TextFunctions.bpeishTokens(
        lower(col(textCol)))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` BPE merges from a corpus. The distributed stage
    * is [[wordCounts]]; the collected table is capped at `maxWords`
    * (top by count, ties by word) with a loud log line — the dropped
    * tail is words too rare to earn a merge anyway. */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 1 << 16): Seq[BpeMerge] = {
    val counted = wordCounts(docs, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val capped =
      if (counted.length > maxWords) {
        // loud, not silent (SURVEY "no silent caps"): the dropped tail is
        // training-only — encoding stays total via character fallback
        System.err.println(
          s"[graft.Bpe] vocabulary cap hit: keeping top $maxWords distinct " +
            "words by (freq, word); rarer tail dropped from TRAINING only")
        counted.take(maxWords)
      } else counted
    trainFromCounts(capped.toSeq, numMerges)
  }

  /** The merge loop over a word-frequency table (driver-side by design —
    * the table is vocabulary-sized, not corpus-sized). Incremental
    * maintenance: pair counts plus a pair→word-indices inverted index,
    * so merge k re-scans only words containing the winning pair. */
  def trainFromCounts(
      counts: Seq[(String, Long)],
      numMerges: Int): Seq[BpeMerge] = {
    import scala.collection.mutable
    // word i as a growable symbol buffer; freq fixed
    val words: Array[mutable.ArrayBuffer[String]] = counts.map { case (w, _) =>
      val b = mutable.ArrayBuffer[String]()
      w.foreach(ch => b += ch.toString)
      b += EndOfWord
      b
    }.toArray
    mergeLoop(words, counts.map(_._2).toArray, numMerges)
  }

  /** The incremental merge loop over pre-symbolized words — shared by the
    * character-level trainer above and the byte-level trainer
    * ([[ByteBpe]]), which differ only in how a word becomes its initial
    * symbol sequence. Mutates `words` in place. */
  private[operators] def mergeLoop(
      words: Array[scala.collection.mutable.ArrayBuffer[String]],
      freqs: Array[Long],
      numMerges: Int): Seq[BpeMerge] = {
    import scala.collection.mutable
    val pairCount = mutable.Map.empty[(String, String), Long]
    val pairWords = mutable.Map.empty[(String, String), mutable.Set[Int]]
    def addWordPairs(wi: Int, sign: Long): Unit = {
      val syms = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * freqs(wi)
        if (c == 0L) { pairCount.remove(p); () } else pairCount(p) = c
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
      // membership removal is done lazily: a stale index entry is
      // harmless (the re-scan below just finds no occurrence)
    }
    words.indices.foreach(addWordPairs(_, 1L))

    val merges = mutable.ArrayBuffer.empty[BpeMerge]
    var rank = 0
    while (rank < numMerges && pairCount.nonEmpty) {
      // deterministic argmax: count DESC, then (left, right) ASC
      var best: (String, String) = null
      var bestC = Long.MinValue
      pairCount.foreach { case (p, c) =>
        if (c > bestC || (c == bestC &&
          (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      merges += BpeMerge(rank, best._1, best._2)
      val merged = best._1 + best._2
      val touched = pairWords.getOrElse(best, mutable.Set.empty).toArray
      pairWords.remove(best)
      touched.foreach { wi =>
        val syms = words(wi)
        // stale index entries possible — check before paying the rescan
        var has = false
        var i = 0
        while (!has && i < syms.length - 1) {
          has = syms(i) == best._1 && syms(i + 1) == best._2
          i += 1
        }
        if (has) {
          addWordPairs(wi, -1L)
          val out = mutable.ArrayBuffer[String]()
          i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          words(wi) = out
          addWordPairs(wi, 1L)
        }
      }
      rank += 1
    }
    merges.toSeq
  }

  /** Persist learned merges as parquet (rank, left, right) — train once,
    * encode everywhere (the [[Unigram.saveVocab]] operational shape);
    * round-trip pinned in TokenizerStoreSpec. */
  def saveMerges(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[BpeMerge],
      path: String): Unit = {
    import spark.implicits._
    merges.toDF().repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load merges written by [[saveMerges]], restored to rank order. */
  def loadMerges(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[BpeMerge] = {
    import spark.implicits._
    spark.read.parquet(path).as[BpeMerge].collect().toSeq.sortBy(_.rank)
  }

  /** Greedy BPE encode of one pre-tokenized word: start from characters
    * + [[EndOfWord]], repeatedly apply the LOWEST-rank applicable merge
    * (leftmost occurrence first) until none applies — the standard
    * GPT-2-style apply loop. Unseen character sequences fall back to
    * single characters (training cap never loses coverage). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): List[String] =
    applyMerges(word.map(_.toString).toVector :+ EndOfWord, ranks).toList

  /** The greedy lowest-rank-first apply loop over an initial symbol
    * sequence — shared with [[ByteBpe]] (which seeds byte units instead
    * of characters + sentinel). */
  private[operators] def applyMerges(
      initial: Vector[String],
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms: Vector[String] = initial
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Distributed encode: per input row, pre-tokenize `textCol` exactly
    * as training did, encode each word with the broadcast merge ranks
    * (per-partition word→tokens memo — Zipf head words encode once),
    * and emit (idCol, n_words, n_bpe_tokens). Output is scalar counts
    * (not the token arrays) so the frame stays narrow at corpus scale;
    * callers that need the tokens use [[encodeWord]] inside their own
    * projection. */
  def encodeCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    val pat = graft.functions.TextFunctions.bpeishPattern
    docs
      .select(col(idCol).cast("long").as("id"), lower(col(textCol)).as("t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val ranks = ranksB.value
        val memo = new java.util.HashMap[String, Int]()
        // Per-partition distinct-word memo, bounded: natural-language
        // corpora plateau around 10⁵–10⁶ distinct words per partition,
        // but adversarial input (random strings) would grow it without
        // limit — reset at the cap rather than evicting (the common case
        // never reaches it, and a reset keeps the hot loop branch-cheap).
        val memoCap = 1 << 20
        val rx = java.util.regex.Pattern.compile(pat)
        rows.map { case (id, t) =>
          val m = rx.matcher(if (t == null) "" else t)
          var nWords = 0L
          var nBpe = 0L
          while (m.find()) {
            val w = m.group()
            nWords += 1
            // explicit miss sentinel (encodeWord always returns >= 1
            // tokens, but -1 does not rely on that invariant)
            var k: Int = memo.getOrDefault(w, -1)
            if (k < 0) {
              k = encodeWord(w, ranks).length
              if (memo.size >= memoCap) memo.clear()
              memo.put(w, k)
            }
            nBpe += k
          }
          (id, nWords, nBpe)
        }
      }
      .toDF(idCol, "n_words", "n_bpe_tokens")
  }
}
