package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-class) tokenizer TRAINING and application,
  * Spark-first (VERDICT r14 item 6 — the second tokenizer family real LLM
  * data pipelines choose from, next to [[Bpe]]).
  *
  * Algorithm (Kudo, ACL 2018 — "Subword Regularization", the unigram
  * trainer SentencePiece ships): seed a large candidate vocabulary from
  * frequent substrings, then alternate (a) EM rounds that re-estimate
  * piece probabilities from their EXPECTED usage over every word's full
  * segmentation lattice (forward–backward, not just the best path) and
  * (b) prune rounds that drop the pieces whose removal costs the corpus
  * likelihood least (Viterbi re-segmentation of the piece by the rest of
  * the vocabulary), until the target vocabulary size is reached. Single
  * characters are never pruned, so encoding stays total.
  *
  * Scale shape (the [[Bpe]] discipline, why this holds at 100 TB): the
  * ONLY corpus-sized work is the one distributed word-count shuffle
  * ([[Bpe.wordCounts]] — explode + groupBy, the shuffle q_token_count
  * already pays). Every EM round and prune round runs over the collected
  * word-frequency TABLE (distinct-word-sized, capped at `maxWords` with a
  * loud log), re-weighting each distinct word by its corpus frequency —
  * exactly how the reference SentencePiece trainer consumes its
  * pre-counted sentence table. A 100 TB corpus and a 100 GB corpus with
  * the same vocabulary train in the same driver time after that one
  * shuffle.
  *
  * Determinism (SURVEY §7.4): no RNG anywhere — the seed vocabulary is
  * top-by-(count DESC, piece ASC), EM sums run in one fixed array order
  * over the (freq DESC, word ASC)-sorted word table, and every prune
  * tie-break is lexicographic. Training is a pure function of the word
  * counts, hence partition-invariant by construction (the spec pins
  * 1-vs-8-partition equality). Not SQL-replayable: the EM fixpoint is an
  * iterative data-dependent fit (the q_kmeans/q_bpe_train terminal class,
  * SURVEY §2.4a) — UnigramSpec gates it against an independent
  * enumerate-all-segmentations reference instead.
  */
object Unigram {

  final case class UnigramPiece(piece: String, logprob: Double)

  /** Learn a unigram-LM vocabulary of `vocabSize` pieces.
    *
    * @param vocabSize   target piece count (single chars always included)
    * @param maxPieceLen longest candidate substring (SentencePiece
    *                    default region; bounds lattice width)
    * @param seedFactor  seed vocabulary = seedFactor × vocabSize top
    *                    substrings (Kudo trains from a large seed and
    *                    prunes down)
    * @param emIters     EM rounds between prunes (SentencePiece uses 2)
    * @param shrink      fraction of prunable pieces dropped per prune
    *                    round (by lowest likelihood loss)
    */
  def train(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 8,
      seedFactor: Int = 4,
      emIters: Int = 2,
      shrink: Double = 0.25,
      maxWords: Int = 1 << 16): Seq[UnigramPiece] = {
    val counted = Bpe.wordCounts(docs, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val capped =
      if (counted.length > maxWords) {
        System.err.println(
          s"[graft.Unigram] vocabulary cap hit: keeping top $maxWords " +
            "distinct words by (freq, word); rarer tail dropped from " +
            "TRAINING only")
        counted.take(maxWords)
      } else counted
    trainFromCounts(capped.toSeq, vocabSize, maxPieceLen, seedFactor,
      emIters, shrink)
  }

  /** The EM + prune loop over a word-frequency table (driver-side by
    * design — vocabulary-sized, never corpus-sized). */
  def trainFromCounts(
      counts: Seq[(String, Long)],
      vocabSize: Int,
      maxPieceLen: Int = 8,
      seedFactor: Int = 4,
      emIters: Int = 2,
      shrink: Double = 0.25): Seq[UnigramPiece] = {
    import scala.collection.mutable
    val words: Array[String] = counts.map(_._1).toArray
    val freqs: Array[Double] = counts.map(_._2.toDouble).toArray

    // ---- seed vocabulary: all substrings ≤ maxPieceLen, freq-weighted;
    // single chars always in, then top (count DESC, piece ASC)
    val subCount = mutable.Map.empty[String, Double]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi); val f = freqs(wi)
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val s = w.substring(i, j)
          subCount(s) = subCount.getOrElse(s, 0.0) + f
          j += 1
        }
        i += 1
      }
      wi += 1
    }
    val chars = subCount.keysIterator.filter(_.length == 1).toArray.sorted
    val seedTarget = math.max(vocabSize * seedFactor, chars.length)
    val multi = subCount.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (s, c) => (-c, s) }
      .take(math.max(0, seedTarget - chars.length))
      .map(_._1)
    // piece table: sorted for a stable index; probs from seed counts
    var pieces: Array[String] = (chars ++ multi).sorted
    var logp: Array[Double] = {
      val tot = pieces.map(subCount(_)).sum
      pieces.map(p => math.log(subCount(p) / tot))
    }

    def pieceIndex: Map[String, Int] = pieces.zipWithIndex.toMap

    def mStep(exp: Array[Double]): Unit = {
      val tot = exp.sum
      var i = 0
      while (i < exp.length) {
        // floor: a piece with zero expected count would be -inf; keep it
        // prunable-but-finite so Viterbi alternatives stay computable
        logp(i) = if (exp(i) > 0 && tot > 0) math.log(exp(i) / tot)
                  else -1e9
        i += 1
      }
    }
    def eStep(idx: Map[String, Int]): (Array[Double], Double) =
      expectedCounts(words, freqs, idx, logp, maxPieceLen)

    // ---- EM + prune until the target size
    var idx = pieceIndex
    var round = 0
    while (pieces.length > vocabSize) {
      var it = 0
      while (it < emIters) { val (e, _) = eStep(idx); mStep(e); it += 1 }
      // prune by likelihood loss: usage(p) × (logp(p) − best alternative
      // segmentation of p's own string without p). Single chars immune.
      val (usage, _) = eStep(idx)
      val nChars = pieces.count(_.length == 1)
      val removable = pieces.indices.filter(pieces(_).length > 1)
      val targetDrop = math.min(
        removable.size,
        math.max(pieces.length - vocabSize,
          0) min math.max(1, (removable.size * shrink).toInt))
      if (targetDrop == 0 || removable.isEmpty) {
        // nothing prunable — loud, and return what we have
        System.err.println(
          s"[graft.Unigram] target vocabSize=$vocabSize below char " +
            s"coverage ($nChars single chars); returning ${pieces.length}")
        return result(pieces, logp)
      }
      val losses = removable.map { pi =>
        val alt = viterbiLL(pieces(pi), idx, logp, maxPieceLen, excl = pi)
        val loss =
          if (alt == Double.NegativeInfinity) Double.PositiveInfinity
          else usage(pi) * (logp(pi) - alt)
        (pi, loss)
      }
      // drop the lowest-loss pieces; ties lexicographic on the piece
      val drop = losses
        .sortBy { case (pi, loss) => (loss, pieces(pi)) }
        .take(targetDrop)
        .map(_._1)
        .toSet
      val keep = pieces.indices.filterNot(drop).toArray
      pieces = keep.map(pieces)
      logp = keep.map(logp)
      idx = pieceIndex
      round += 1
    }
    // final EM polish on the pruned vocabulary
    var it = 0
    while (it < emIters) { val (e, _) = eStep(idx); mStep(e); it += 1 }
    result(pieces, logp)
  }

  private def result(pieces: Array[String], logp: Array[Double]): Seq[UnigramPiece] =
    pieces.indices.map(i => UnigramPiece(pieces(i), logp(i)))
      .sortBy(p => (-p.logprob, p.piece))

  private def logSumExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log1p(math.exp(-math.abs(a - b))) }

  /** Lattice forward–backward over every word: expected usage count per
    * piece (freq-weighted posterior over ALL segmentations, not just the
    * best path) plus the total corpus log-likelihood. Runs ENTIRELY in
    * log space (log-sum-exp accumulation): linear-space alphas underflow
    * around ~140 pieces at typical logprobs of −5 (long identifier runs,
    * hash-like strings), which would silently drop those words from EM —
    * the reason the reference SentencePiece trainer is log-domain too
    * (review r15). Package-visible so UnigramSpec can pin it against an
    * enumerate-all-segmentations reference — the independent-gate
    * discipline BpeSpec set. */
  private[operators] def expectedCounts(
      words: Array[String],
      freqs: Array[Double],
      idx: Map[String, Int],
      logp: Array[Double],
      maxPieceLen: Int): (Array[Double], Double) = {
    val exp = new Array[Double](logp.length)
    var ll = 0.0
    var k = 0
    while (k < words.length) {
      val w = words(k); val f = freqs(k); val L = w.length
      val la = Array.fill(L + 1)(Double.NegativeInfinity); la(0) = 0.0
      var i = 0
      while (i < L) {
        if (la(i) > Double.NegativeInfinity) {
          var j = i + 1
          while (j <= math.min(L, i + maxPieceLen)) {
            idx.get(w.substring(i, j)) match {
              case Some(pi) => la(j) = logSumExp(la(j), la(i) + logp(pi))
              case None =>
            }
            j += 1
          }
        }
        i += 1
      }
      val lz = la(L)
      if (lz > Double.NegativeInfinity) {
        ll += f * lz
        val lb = Array.fill(L + 1)(Double.NegativeInfinity); lb(L) = 0.0
        i = L - 1
        while (i >= 0) {
          if (la(i) > Double.NegativeInfinity) {
            var j = i + 1
            while (j <= math.min(L, i + maxPieceLen)) {
              idx.get(w.substring(i, j)) match {
                case Some(pi) =>
                  if (lb(j) > Double.NegativeInfinity) {
                    lb(i) = logSumExp(lb(i), logp(pi) + lb(j))
                    exp(pi) += f * math.exp(la(i) + logp(pi) + lb(j) - lz)
                  }
                case None =>
              }
              j += 1
            }
          }
          i -= 1
        }
      }
      k += 1
    }
    (exp, ll)
  }

  /** Viterbi log-likelihood of segmenting `s` with the current table,
    * optionally excluding one piece index (the prune-loss probe;
    * excl = -1 disables). */
  private[operators] def viterbiLL(
      s: String,
      idx: Map[String, Int],
      logp: Array[Double],
      maxPieceLen: Int,
      excl: Int): Double = {
    val L = s.length
    val best = Array.fill(L + 1)(Double.NegativeInfinity); best(0) = 0.0
    var i = 0
    while (i < L) {
      if (best(i) > Double.NegativeInfinity) {
        var j = i + 1
        while (j <= math.min(L, i + maxPieceLen)) {
          idx.get(s.substring(i, j)) match {
            case Some(pi) if pi != excl =>
              val c = best(i) + logp(pi)
              if (c > best(j)) best(j) = c
            case _ =>
          }
          j += 1
        }
      }
      i += 1
    }
    best(L)
  }

  /** Viterbi-segment one pre-tokenized word into vocabulary pieces (the
    * standard unigram decode — most-probable segmentation, deterministic
    * leftmost-longest tie-break via strict `>`). Characters missing from
    * the vocabulary fall back to single-symbol pieces with a flat penalty
    * so encoding stays total. */
  def encodeWord(
      word: String,
      ranks: Map[String, Double],
      maxPieceLen: Int = 8): List[String] = {
    val L = word.length
    if (L == 0) return Nil
    val unkPenalty = -20.0
    val best = Array.fill(L + 1)(Double.NegativeInfinity); best(0) = 0.0
    val back = new Array[Int](L + 1)
    var i = 0
    while (i < L) {
      if (best(i) > Double.NegativeInfinity) {
        var j = i + 1
        while (j <= math.min(L, i + maxPieceLen)) {
          val s = word.substring(i, j)
          val lp = ranks.get(s) match {
            case Some(v) => v
            case None if j - i == 1 => unkPenalty // char fallback
            case None => Double.NegativeInfinity
          }
          if (lp > Double.NegativeInfinity && best(i) + lp > best(j)) {
            best(j) = best(i) + lp; back(j) = i
          }
          j += 1
        }
      }
      i += 1
    }
    var at = L
    var out: List[String] = Nil
    while (at > 0) { val from = back(at); out = word.substring(from, at) :: out; at = from }
    out
  }

  /** Distributed encode, the [[Bpe.encodeCounts]] shape: pre-tokenize
    * exactly as training did, Viterbi-encode each word under the
    * broadcast vocabulary (per-partition word→count memo), emit
    * (idCol, n_words, n_unigram_tokens) — narrow at corpus scale. */
  def encodeCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[UnigramPiece],
      maxPieceLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      vocab.map(p => p.piece -> p.logprob).toMap)
    val pat = graft.functions.TextFunctions.bpeishPattern
    docs
      .select(col(idCol).cast("long").as("id"), lower(col(textCol)).as("t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val ranks = ranksB.value
        val memo = new java.util.HashMap[String, Int]()
        val memoCap = 1 << 20 // the Bpe.encodeCounts bound + reset policy
        val rx = java.util.regex.Pattern.compile(pat)
        rows.map { case (id, t) =>
          val m = rx.matcher(if (t == null) "" else t)
          var nWords = 0L
          var nTok = 0L
          while (m.find()) {
            val w = m.group()
            nWords += 1
            var k: Int = memo.getOrDefault(w, -1)
            if (k < 0) {
              k = encodeWord(w, ranks, maxPieceLen).length
              if (memo.size >= memoCap) memo.clear()
              memo.put(w, k)
            }
            nTok += k
          }
          (id, nWords, nTok)
        }
      }
      .toDF(idCol, "n_words", "n_unigram_tokens")
  }
}
