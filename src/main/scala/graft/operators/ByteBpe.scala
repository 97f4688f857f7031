package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BYTE-level byte-pair-encoding — the GPT-2-family tokenizer (Radford
  * et al. 2019, "Language Models are Unsupervised Multitask Learners";
  * the `bytes_to_unicode` construction is from the public GPT-2
  * `encoder.py`). The fourth subword family next to character BPE
  * ([[Bpe]]), Unigram-LM ([[Unigram]]) and WordPiece ([[WordPiece]]),
  * and the one most production LLM pipelines actually run, because it is
  * TOTAL: the base alphabet is the 256 byte values, so every string —
  * any script, emoji, control bytes, malformed fragments — encodes with
  * zero out-of-vocabulary tokens. No [UNK] exists by construction.
  *
  * Differences from character BPE, both load-bearing:
  *  - a word's initial symbols are its UTF-8 BYTES (mapped through a
  *    bijective byte→printable-char table so symbols stay strings), not
  *    its characters — a 3-byte CJK codepoint starts as 3 symbols;
  *  - no end-of-word sentinel — word boundaries are carried by the
  *    GPT-2 pre-tokenizer's LEADING-SPACE convention (" word" and
  *    "word" are distinct pre-tokens), and case is preserved.
  *
  * Scale shape is identical to [[Bpe]]: ONE distributed word-count
  * shuffle (the pre-tokenizer is a Spark `regexp_extract_all`, codegen'd
  * — no UDF), then the merge loop over the capped vocabulary-sized
  * frequency table, reusing [[Bpe.mergeLoop]] verbatim. Encoding
  * broadcasts merge ranks and memoizes per partition.
  *
  * Determinism: same discipline as [[Bpe]] — count DESC / lexicographic
  * tie-breaks, no RNG, no floats; merge sequences are reproducible
  * across runs, partitionings and JVMs (pinned by ByteBpeSpec).
  */
object ByteBpe {

  /** GPT-2 pre-tokenizer: contraction suffixes, optionally-space-prefixed
    * letter runs / digit runs / punctuation runs, then residual
    * whitespace (kept — byte-level BPE encodes whitespace too). Java
    * regex: `\p{L}`/`\p{N}` are Unicode categories, `(?!\S)` is the
    * standard lookahead. */
  val pretokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** Bijective byte → printable-char table (the GPT-2 `bytes_to_unicode`
    * construction): visible latin-1 bytes (33–126, 161–172, 174–255)
    * keep their codepoint; the 68 control/whitespace/soft-hyphen bytes
    * map to 256+k in byte order. Bijectivity is what makes encoding
    * LOSSLESS — decode is table inversion, pinned by spec. */
  val byteToChar: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }

  /** Inverse of [[byteToChar]]. */
  val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** A pre-token's initial symbol sequence: UTF-8 bytes, each mapped to
    * its unit char (as a 1-char string, so [[Bpe.mergeLoop]] and
    * [[Bpe.applyMerges]] apply unchanged). */
  def byteUnits(word: String): Vector[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => byteToChar(b & 0xff).toString).toVector

  /** Decode a merged symbol (a concatenation of unit chars) back to its
    * raw bytes — the losslessness witness used by the totality spec. */
  def unitsToBytes(symbol: String): Array[Byte] =
    symbol.map(c => charToByte(c).toByte).toArray

  /** Distributed word frequencies under the GPT-2 pre-tokenizer. Case
    * and leading spaces PRESERVED (unlike [[Bpe.wordCounts]]) — the
    * leading-space convention is the byte-level boundary marker. One
    * explode + one groupBy; columns (word, freq). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(regexp_extract_all(
        col(textCol), lit(pretokenPattern), lit(0))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` byte-level merges. Same cap discipline as
    * [[Bpe.train]]: top `maxWords` by (freq, word) with a loud log; the
    * dropped tail is TRAINING-only — encoding of any string stays total
    * via the 256-unit base alphabet. */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 1 << 16): Seq[Bpe.BpeMerge] = {
    val counted = wordCounts(docs, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val capped =
      if (counted.length > maxWords) {
        System.err.println(
          s"[graft.ByteBpe] vocabulary cap hit: keeping top $maxWords " +
            "distinct pre-tokens by (freq, word); rarer tail dropped from " +
            "TRAINING only — encoding remains total over the byte alphabet")
        counted.take(maxWords)
      } else counted
    trainFromCounts(capped.toSeq, numMerges)
  }

  /** The merge loop over a pre-token frequency table: symbolize each
    * word to byte units, then run the shared incremental loop. */
  def trainFromCounts(
      counts: Seq[(String, Long)],
      numMerges: Int): Seq[Bpe.BpeMerge] = {
    import scala.collection.mutable
    val words: Array[mutable.ArrayBuffer[String]] = counts.map { case (w, _) =>
      val b = mutable.ArrayBuffer[String]()
      byteUnits(w).foreach(b += _)
      b
    }.toArray
    Bpe.mergeLoop(words, counts.map(_._2).toArray, numMerges)
  }

  /** Greedy byte-level encode of one pre-token: start from byte units,
    * repeatedly apply the lowest-rank applicable merge. ALWAYS succeeds
    * — worst case is one token per byte; there is no unknown symbol. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): List[String] =
    Bpe.applyMerges(byteUnits(word), ranks).toList

  /** Distributed encode: pre-tokenize exactly as training did, encode
    * each pre-token under the broadcast merge ranks (per-partition memo
    * — the [[Bpe.encodeCounts]] shape) and emit
    * (idCol, n_pretokens, n_byte_tokens, n_bytes). n_bytes is the UTF-8
    * length over pre-tokens — the totality invariant n_byte_tokens ≤
    * n_bytes is pinned by spec. Scalar counts keep the frame narrow at
    * corpus scale. */
  def encodeCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Bpe.BpeMerge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    val pat = pretokenPattern
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val ranks = ranksB.value
        val memo = new java.util.HashMap[String, Int]()
        val memoCap = 1 << 20
        val rx = java.util.regex.Pattern.compile(pat)
        rows.map { case (id, t) =>
          val m = rx.matcher(if (t == null) "" else t)
          var nPre = 0L
          var nTok = 0L
          var nBytes = 0L
          while (m.find()) {
            val w = m.group()
            nPre += 1
            nBytes += w.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
            var k: Int = memo.getOrDefault(w, -1)
            if (k < 0) {
              k = encodeWord(w, ranks).length
              if (memo.size >= memoCap) memo.clear()
              memo.put(w, k)
            }
            nTok += k
          }
          (id, nPre, nTok, nBytes)
        }
      }
      .toDF(idCol, "n_pretokens", "n_byte_tokens", "n_bytes")
  }
}
