package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer TRAINING and application — the third major subword
  * family next to [[Bpe]] (merge-frequency) and [[Unigram]] (EM-pruned
  * LM): the BERT-style likelihood trainer (Schuster & Nakajima, ICASSP
  * 2012; the spelling below is the openly documented trainer used by the
  * BERT family), which merges the symbol pair maximizing the LIKELIHOOD
  * gain of a unigram LM over the corpus,
  *
  *   score(a, b) = count(ab) / (count(a) * count(b)),
  *
  * rather than raw pair frequency — rare-but-strongly-associated pieces
  * ("##zzle" after "pu") win over merely common ones.
  *
  * Scale shape (the [[Bpe]] discipline, why this holds at 100 TB): the
  * ONLY corpus-sized work is the same single word-count shuffle
  * ([[Bpe.wordCounts]] — explode + groupBy). The merge loop runs over
  * the capped word-frequency TABLE (vocabulary-sized, never
  * corpus-sized), incrementally: pair counts, per-symbol counts and a
  * pair→words inverted index are maintained per merge, so merge k
  * re-scans only the words containing the winning pair.
  *
  * Continuation convention: a word's first symbol is bare, every later
  * symbol carries the `##` prefix ("hello" → h ##e ##l ##l ##o); merging
  * (a, ##b) yields a·b with a's prefix status. Encoding is BERT's greedy
  * longest-match-first walk with whole-word [UNK] fallback.
  *
  * Determinism (SURVEY §7.4 discipline): the score is a RATIO — compared
  * as exact cross-multiplied BigInt products, never as floats (two pairs
  * whose double scores collide at 1e-17 would make the merge sequence
  * partition-luck); ties break on higher pair count, then
  * lexicographically on (left, right). No RNG, no float accumulation —
  * merge sequences are reproducible across runs, partitionings and JVMs.
  */
object WordPiece {

  /** BERT's unknown-word sentinel: a word with any un-encodable span
    * becomes one [UNK] token (whole-word fallback, not per-character). */
  val Unk = "[UNK]"

  /** The continuation prefix for non-word-initial pieces. */
  val Continuation = "##"

  /** One learned vocabulary entry; rank orders the table (alphabet first
    * in first-seen-deterministic order, then merges in learn order). */
  final case class WpToken(rank: Int, token: String)

  /** Learn a WordPiece vocabulary of (at most) `vocabSize` tokens from a
    * corpus. Distributed stage = ONE word-count shuffle; the collected
    * table is capped at `maxWords` (top by count, ties by word) with a
    * loud log.
    *
    * THE CAP'S SCORE-IMPACT ARGUMENT (r16 verdict item): WordPiece's
    * merge score count(ab)/(count(a)·count(b)) has corpus-wide
    * DENOMINATORS, so — unlike raw-frequency BPE, where a dropped word
    * can only remove its own pair counts — the tail's AGGREGATE mass
    * shifts every unit count. Dropping tail words with total frequency T
    * perturbs each count(x) by at most T, so a merge argmax can only
    * flip where two scores sit within a factor ~(1 ± T/count(x))² of
    * each other. Under a Zipf(1) distribution the mass beyond the top
    * 2¹⁶ words is ≈ ln(V/2¹⁶)/ln(V) of the corpus — ~10–20% at web-scale
    * V — so at 100 TB the default cap is NOT free: callers training
    * production vocabularies should either raise `maxWords` to their
    * memory budget (the table is (word, count) pairs — 2²⁴ words ≈
    * ~512 MB driver) or accept the documented approximation. The cap is
    * therefore an explicit parameter here, the log line is loud, and
    * WordPieceSpec pins cap-vs-uncapped merge-sequence EQUALITY on a
    * Zipf fixture where the tail mass is provably below every score
    * gap — the regime the default cap assumes.
    *
    * The result always contains [[Unk]] plus the full observed alphabet
    * (bare + `##` forms), so encoding stays total up to [UNK] — if the
    * alphabet alone exceeds `vocabSize`, the alphabet still ships whole
    * (the BERT convention: coverage beats the budget). */
  def train(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxWords: Int = 1 << 16): Seq[WpToken] = {
    val counted = Bpe.wordCounts(docs, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val capped =
      if (counted.length > maxWords) {
        System.err.println(
          s"[graft.WordPiece] vocabulary cap hit: keeping top $maxWords " +
            "distinct words by (freq, word); rarer tail dropped from " +
            "TRAINING only")
        counted.take(maxWords)
      } else counted
    trainFromCounts(capped.toSeq, vocabSize)
  }

  /** The merge loop over a word-frequency table (driver-side by design —
    * vocabulary-sized, not corpus-sized). Exposed for the spec's
    * independent-reference parity check. */
  def trainFromCounts(
      counts: Seq[(String, Long)],
      vocabSize: Int): Seq[WpToken] = {
    import scala.collection.mutable
    // word i as a growable symbol buffer (bare first char, ## tail)
    val words: Array[mutable.ArrayBuffer[String]] = counts.map { case (w, _) =>
      val b = mutable.ArrayBuffer[String]()
      w.zipWithIndex.foreach { case (ch, i) =>
        b += (if (i == 0) ch.toString else Continuation + ch)
      }
      b
    }.toArray
    val freqs: Array[Long] = counts.map(_._2).toArray

    // alphabet in deterministic order: sorted bare forms, then sorted
    // continuation forms (a fixed order, independent of corpus iteration)
    val alphabet: Seq[String] = {
      val bare = mutable.SortedSet.empty[String]
      val cont = mutable.SortedSet.empty[String]
      words.foreach(_.foreach(s =>
        if (s.startsWith(Continuation)) cont += s else bare += s))
      (bare.toSeq ++ cont.toSeq)
    }

    val pairCount = mutable.Map.empty[(String, String), Long]
    val symCount = mutable.Map.empty[String, Long]
    val pairWords = mutable.Map.empty[(String, String), mutable.Set[Int]]
    def addWord(wi: Int, sign: Long): Unit = {
      val syms = words(wi)
      var i = 0
      while (i < syms.length) {
        val sc = symCount.getOrElse(syms(i), 0L) + sign * freqs(wi)
        if (sc == 0L) { symCount.remove(syms(i)); () } else symCount(syms(i)) = sc
        if (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          val c = pairCount.getOrElse(p, 0L) + sign * freqs(wi)
          if (c == 0L) { pairCount.remove(p); () } else pairCount(p) = c
          if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
        }
        i += 1
      }
      // index removal is lazy: a stale entry is harmless (the rescan
      // below finds no occurrence) — the Bpe.trainFromCounts shape
    }
    words.indices.foreach(addWord(_, 1L))

    // merged spelling of a pair: right drops its ## (it is continuation
    // INSIDE the merged piece), merged keeps left's prefix status
    def glue(a: String, b: String): String = a + b.stripPrefix(Continuation)

    val vocab = mutable.ArrayBuffer.empty[String]
    vocab += Unk
    vocab ++= alphabet
    // exact score compare: count(ab)/ (count(a)*count(b)) as
    // cross-multiplied BigInts — counts reach 1e9+ at 100 TB, so the
    // three-way product overflows Long; floats would tie-break by luck
    def better(p: (String, String), c: Long, q: (String, String), d: Long): Boolean = {
      if (q == null) return true
      val lhs = BigInt(c) * BigInt(symCount(q._1)) * BigInt(symCount(q._2))
      val rhs = BigInt(d) * BigInt(symCount(p._1)) * BigInt(symCount(p._2))
      if (lhs != rhs) lhs > rhs
      else if (c != d) c > d
      else if (p._1 != q._1) p._1 < q._1
      else p._2 < q._2
    }
    while (vocab.length < vocabSize && pairCount.nonEmpty) {
      var best: (String, String) = null
      var bestC = 0L
      pairCount.foreach { case (p, c) =>
        if (better(p, c, best, bestC)) { best = p; bestC = c }
      }
      val merged = glue(best._1, best._2)
      vocab += merged
      val touched = pairWords.getOrElse(best, mutable.Set.empty).toArray
      pairWords.remove(best)
      touched.foreach { wi =>
        val syms = words(wi)
        var has = false
        var i = 0
        while (!has && i < syms.length - 1) {
          has = syms(i) == best._1 && syms(i + 1) == best._2
          i += 1
        }
        if (has) {
          addWord(wi, -1L)
          val out = mutable.ArrayBuffer[String]()
          i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          words(wi) = out
          addWord(wi, 1L)
        }
      }
    }
    vocab.zipWithIndex.map { case (t, r) => WpToken(r, t) }.toSeq
  }

  /** Persist a learned vocabulary as parquet (rank, token) — train once,
    * encode everywhere; round-trip pinned in WordPieceSpec. */
  def saveVocab(
      spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[WpToken],
      path: String): Unit = {
    import spark.implicits._
    vocab.toDF().repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a vocabulary written by [[saveVocab]], restored to rank order. */
  def loadVocab(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[WpToken] = {
    import spark.implicits._
    spark.read.parquet(path).as[WpToken].collect().toSeq.sortBy(_.rank)
  }

  /** Greedy longest-match-first encode of one pre-tokenized word — the
    * BERT WordpieceTokenizer walk: at each position take the LONGEST
    * vocabulary piece (`##`-prefixed after position 0); any un-matchable
    * span makes the WHOLE word [[Unk]]. `maxInputChars` mirrors BERT's
    * 200-char guard (pathological tokens become [UNK], not O(n²) scans). */
  def encodeWord(
      word: String,
      vocab: Set[String],
      maxInputChars: Int = 200): List[String] = {
    if (word.length > maxInputChars) return List(Unk)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var cur: String = null
      while (cur == null && start < end) {
        val sub0 = word.substring(start, end)
        val sub = if (start > 0) Continuation + sub0 else sub0
        if (vocab.contains(sub)) cur = sub else end -= 1
      }
      if (cur == null) return List(Unk)
      out += cur
      start = end
    }
    out.toList
  }

  /** Distributed encode: per input row, pre-tokenize `textCol` exactly as
    * training did, encode each word against the broadcast vocabulary
    * (per-partition word memo — the Zipf head encodes once per
    * partition), and emit (idCol, n_words, n_wp_tokens, n_unk). Scalar
    * counts keep the frame narrow at corpus scale; callers needing the
    * pieces use [[encodeWord]] in their own projection. */
  def encodeCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[WpToken]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabB = spark.sparkContext.broadcast(vocab.map(_.token).toSet)
    val pat = graft.functions.TextFunctions.bpeishPattern
    docs
      .select(col(idCol).cast("long").as("id"), lower(col(textCol)).as("t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val v = vocabB.value
        // (tokens, isUnk) per distinct word; bounded with reset-at-cap
        // (the Bpe.encodeCounts rationale)
        val memo = new java.util.HashMap[String, (Int, Int)]()
        val memoCap = 1 << 20
        val rx = java.util.regex.Pattern.compile(pat)
        rows.map { case (id, t) =>
          val m = rx.matcher(if (t == null) "" else t)
          var nWords = 0L
          var nTok = 0L
          var nUnk = 0L
          while (m.find()) {
            val w = m.group()
            nWords += 1
            var e = memo.get(w)
            if (e == null) {
              val enc = encodeWord(w, v)
              e = (enc.length, if (enc == List(Unk)) 1 else 0)
              if (memo.size() >= memoCap) memo.clear()
              memo.put(w, e)
            }
            nTok += e._1
            nUnk += e._2
          }
          (id, nWords, nTok, nUnk)
        }
      }
      .toDF(idCol, "n_words", "n_wp_tokens", "n_unk")
  }
}
