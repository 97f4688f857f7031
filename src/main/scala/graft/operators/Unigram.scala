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

  /** Persist a trained vocabulary as parquet (piece, logprob) — train
    * once, encode everywhere: the operational shape of a tokenizer in a
    * 100 TB pipeline (the trainer runs once per corpus snapshot; every
    * downstream encode job loads the table). Round-trip exactness is
    * pinned in TokenizerStoreSpec. */
  def saveVocab(
      spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[UnigramPiece],
      path: String): Unit = {
    import spark.implicits._
    vocab.toDF().repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a vocabulary written by [[saveVocab]], restored to the
    * trainer's deterministic (logprob DESC, piece ASC) order. */
  def loadVocab(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[UnigramPiece] = {
    import spark.implicits._
    spark.read.parquet(path).as[UnigramPiece].collect().toSeq
      .sortBy(p => (-p.logprob, p.piece))
  }

  /** SAMPLE one segmentation of a word from the unigram posterior
    * P(seg | w) ∝ Π p(piece)^alpha — Kudo's subword regularization
    * (ACL 2018 §3), the training-time encode real LLM pipelines use so
    * each epoch sees different tokenizations of the same text. Exact
    * forward-filtering / backward-sampling on the lattice (alphas with
    * α-tempered probabilities, then walk backward drawing each incoming
    * edge with its exact posterior weight) — not an n-best
    * approximation. alpha → ∞ degenerates to Viterbi; alpha = 0 is
    * uniform over segmentations.
    *
    * DETERMINISTIC sampling: draws come from a counter-based splitmix64
    * stream seeded by (seed, the word's own bytes) — a pure function of
    * (word, seed), so results are identical across partitionings, JVMs
    * and re-runs (the SURVEY §7.4 discipline; pass a different seed per
    * epoch for fresh samples). Unknown characters fall back like
    * [[encodeWord]]. */
  def sampleWord(
      word: String,
      ranks: Map[String, Double],
      alpha: Double,
      seed: Long,
      maxPieceLen: Int = 8): List[String] = {
    val L = word.length
    if (L == 0) return Nil
    val unkPenalty = -20.0
    def lp(i: Int, j: Int): Double = ranks.get(word.substring(i, j)) match {
      case Some(v) => alpha * v
      case None if j - i == 1 => alpha * unkPenalty
      case None => Double.NegativeInfinity
    }
    // forward: log alpha over tempered probs
    val la = Array.fill(L + 1)(Double.NegativeInfinity); la(0) = 0.0
    var i = 0
    while (i < L) {
      if (la(i) > Double.NegativeInfinity) {
        var j = i + 1
        while (j <= math.min(L, i + maxPieceLen)) {
          val w = lp(i, j)
          if (w > Double.NegativeInfinity)
            la(j) = logSumExp(la(j), la(i) + w)
          j += 1
        }
      }
      i += 1
    }
    // counter-based deterministic uniform stream: mix(seed, wordHash, k)
    var wordHash = 0xcbf29ce484222325L
    word.foreach { c => wordHash = (wordHash ^ c) * 0x100000001b3L }
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    var draw = 0
    def uniform(): Double = {
      draw += 1
      val bits = mix(seed ^ mix(wordHash + draw * 0x632be59bd9b4e019L))
      ((bits >>> 11).toDouble + 0.5) / (1L << 53).toDouble
    }
    // backward sampling: at j, draw incoming edge i with posterior
    // exp(la(i) + w(i,j) − la(j))
    var at = L
    var out: List[String] = Nil
    while (at > 0) {
      val lo = math.max(0, at - maxPieceLen)
      var u = uniform()
      var chosen = -1
      var i2 = lo
      while (i2 < at && chosen < 0) {
        val w = lp(i2, at)
        if (w > Double.NegativeInfinity && la(i2) > Double.NegativeInfinity) {
          val p = math.exp(la(i2) + w - la(at))
          if (u < p) chosen = i2 else u -= p
        }
        i2 += 1
      }
      // float-tail guard: residual mass from rounding lands on the last
      // feasible edge (deterministic, bias ~1e-15)
      if (chosen < 0) {
        var k = at - 1
        while (k >= lo && chosen < 0) {
          if (lp(k, at) > Double.NegativeInfinity &&
            la(k) > Double.NegativeInfinity) chosen = k
          k -= 1
        }
      }
      out = word.substring(chosen, at) :: out
      at = chosen
    }
    out
  }

  /** Shared distributed-encode scaffold (the [[Bpe.encodeCounts]]
    * shape): pre-tokenize exactly as training did, apply `perWord`
    * under the broadcast vocabulary with a bounded per-partition
    * word→count memo, emit (idCol, n_words, `outCol`). One place for
    * the id-cast/lower/pattern/memo policy so the Viterbi and sampled
    * variants cannot drift (review r15 wave 2). `perWord` must be a
    * pure function of (word, ranks) — that is what keeps the memo
    * valid and the result partition-invariant. */
  private def encodeCountsWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[UnigramPiece],
      outCol: String)(
      perWord: (String, Map[String, Double]) => Int): DataFrame = {
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
              k = perWord(w, ranks)
              if (memo.size >= memoCap) memo.clear()
              memo.put(w, k)
            }
            nTok += k
          }
          (id, nWords, nTok)
        }
      }
      .toDF(idCol, "n_words", outCol)
  }

  /** Distributed SAMPLED encode (training-time variant): per doc,
    * (n_words, n_sampled_tokens) under α-tempered lattice sampling.
    * Sampling is seeded per WORD (a pure function of (word, seed)), so
    * within one epoch repeated occurrences of a word tokenize
    * identically — which keeps the per-partition memo valid AND the
    * result partition-invariant; vary `seed` per epoch for fresh
    * samples, exactly how subword regularization is driven in
    * practice. */
  def sampledCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[UnigramPiece],
      alpha: Double = 0.2,
      seed: Long = 1L,
      maxPieceLen: Int = 8): DataFrame =
    encodeCountsWith(docs, idCol, textCol, vocab, "n_sampled_tokens")(
      (w, ranks) => sampleWord(w, ranks, alpha, seed, maxPieceLen).length)

  /** Distributed Viterbi encode: per doc, (n_words, n_unigram_tokens)
    * — narrow at corpus scale. */
  def encodeCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[UnigramPiece],
      maxPieceLen: Int = 8): DataFrame =
    encodeCountsWith(docs, idCol, textCol, vocab, "n_unigram_tokens")(
      (w, ranks) => encodeWord(w, ranks, maxPieceLen).length)
}
