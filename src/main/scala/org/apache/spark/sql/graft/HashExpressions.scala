package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native hash-sketch expressions for the dedup path.
  *
  * Why custom (SURVEY.md §4.3): the expression-composed MinHash evaluates
  * `numHashes` seeded xxhash64 calls per shingle — k full rehashes of every
  * string. These kernels hash each element ONCE (64-bit Murmur-derived
  * base) and derive the k permutation values with one multiply-add each
  * (universal hashing: h_j(x) = a_j·h(x) + b_j over Z/2⁶⁴), turning an
  * O(k·len) inner loop into O(len + k). At 100 TB of shingled documents
  * that's the difference between hash-bound and scan-bound.
  */
object HashExpressions {

  /** 64-bit base hash of a UTF8String: two 32-bit Murmur3 passes with
    * different seeds combined — stable, allocation-free, available to both
    * interpreted eval and generated code. */
  def hash64(s: UTF8String, seed: Long): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, seed.toInt)
    val hi = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, (seed >>> 32).toInt ^ 0x9e3779b9)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  def minhash(arr: Column, numHashes: Int, seed: Long): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(arr), numHashes, seed))

  def simhash(arr: Column, seed: Long = 42L): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(arr), seed))

  def hyperplaneSig(vec: Column, planes: Int, seed: Long): Column =
    ExpressionUtils.column(HyperplaneSig(ExpressionUtils.expression(vec), planes, seed))

  def minhashText(text: Column, shingleN: Int, numHashes: Int, seed: Long): Column =
    ExpressionUtils.column(
      MinHashTextSig(ExpressionUtils.expression(text), shingleN, numHashes, seed))

  def langId(tokens: Column, markers: Seq[(String, Seq[String])]): Column =
    ExpressionUtils.column(LangIdExpr(ExpressionUtils.expression(tokens), markers))
}

/** MinHash signature: array<long> of length `numHashes`; position j is the
  * min over elements of a_j·hash(x)+b_j. Deterministic under `seed`.
  * Empty arrays all yield the identical all-Long.MaxValue signature —
  * i.e. empty documents are treated as exact duplicates of each other
  * (consistent with jaccard(∅, ∅) = 1); filter empties upstream if that
  * is not the intent. */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Deterministic permutation parameters; a_j odd so x -> a_j*x+b_j is a
  // bijection on Z/2^64.
  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = MinHashSig.params(numHashes, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashExpressions.hash64(arr.getUTF8String(i), seed)
        var j = 0
        while (j < numHashes) {
          val v = as(j) * h + bs(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    val he = "org.apache.spark.sql.graft.HashExpressions"
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $he.hash64($c.getUTF8String($i), ${seed}L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $v = $aRef[$j] * $h + $bRef[$j];
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinHashSig {
  private[graft] def params(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.SplittableRandom(seed)
    val as = Array.fill(numHashes)(rnd.nextLong() | 1L)
    val bs = Array.fill(numHashes)(rnd.nextLong())
    (as, bs)
  }
}

/** Fused text → MinHash signature: whitespace-tokenize, form word
  * `shingleN`-grams and fold them straight into the k-permutation minima —
  * one pass, no materialized shingle array. Bit-identical to
  * `MinHashSig(shingles(text, n), k, seed)` (the composed
  * tokens→shingles→hash pipeline), including the edge cases: texts with
  * ≤ n tokens yield the single whole-text shingle, and `split("\\s+")`
  * artifacts (leading-empty token, kept trailing empties) are reproduced
  * exactly.
  *
  * Why: the signature pass IS the full-corpus scan of MinHash dedup. The
  * composed form runs `transform`/`slice`/`array_join` higher-order
  * functions (CodegenFallback — interpreted per row) and materializes
  * every document's shingle strings; at 100 TB that intermediate dwarfs
  * the input. This expression keeps the scan inside whole-stage codegen
  * and allocates only the k-long signature per row; exact-Jaccard
  * verification recomputes shingles for the candidate pairs only. */
case class MinHashTextSig(child: Expression, shingleN: Int, numHashes: Int, seed: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(shingleN > 0 && numHashes > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val (as, bs): (Array[Long], Array[Long]) =
    MinHashSig.params(numHashes, seed)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashTextSig.compute(
      input.asInstanceOf[UTF8String], shingleN, as, bs, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhtA", as, "long[]")
    val bRef = ctx.addReferenceObj("mhtB", bs, "long[]")
    val cls = "org.apache.spark.sql.graft.MinHashTextSig"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.compute($c, $shingleN, $aRef, $bRef, ${seed}L));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashTextSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_text"
}

object MinHashTextSig {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Single-pass tokenize → shingle → k-min fold. Called from both
    * interpreted eval and generated code (static forwarder). */
  def compute(
      text: UTF8String,
      shingleN: Int,
      as: Array[Long],
      bs: Array[Long],
      seed: Long): Array[Long] = {
    // limit -1 matches Spark's split(text, "\\s+"): trailing empty
    // strings are KEPT, and leading whitespace yields an empty first token
    val toks = ws.split(text.toString, -1)
    val mins = Array.fill(numHashesOf(as))(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)

    def fold(shingle: String): Unit = {
      val h = HashExpressions.hash64(UTF8String.fromString(shingle), seed)
      var j = 0
      while (j < as.length) {
        val v = as(j) * h + bs(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }

    if (toks.length <= shingleN) {
      sb.setLength(0)
      var i = 0
      while (i < toks.length) {
        if (i > 0) sb.append(' ')
        sb.append(toks(i)); i += 1
      }
      fold(sb.toString)
    } else {
      var start = 0
      val last = toks.length - shingleN
      while (start <= last) {
        sb.setLength(0)
        var i = 0
        while (i < shingleN) {
          if (i > 0) sb.append(' ')
          sb.append(toks(start + i)); i += 1
        }
        fold(sb.toString)
        start += 1
      }
    }
    mins
  }

  private def numHashesOf(as: Array[Long]): Int = as.length
}

/** Random-hyperplane LSH bucket id over an `array<float>` vector: bit p
  * (plane 0 = most significant of the low `planes` bits) is the sign of
  * the dot product with pseudo-random plane p, whose component j is
  * `pmod(xxhash64(seed, p, j), 2000001) - 1000000` — EXACTLY the value
  * the composed higher-order-function form
  * (`Similarity.hyperplaneBucketHof`) computes, so buckets are
  * bit-compatible between the two. This fused loop replaces
  * planes × d lambda frames + an intermediate products array per row with
  * planes × d inlined `XXH64.hashInt` calls inside whole-stage codegen —
  * it runs over the FULL corpus in `embeddingNearDup` / `lshTopK`, the
  * hottest scan of the ANN path.
  *
  * Parity notes vs the HOF form: a NULL element nulls that plane's dot →
  * bit 0 (any null element zeroes every plane, hence bucket 0); an empty
  * vector dots to 0.0 → every bit 1. One divergence: a NULL input vector
  * yields NULL here (standard null-intolerant expression) where the HOF
  * composition folds it to bucket 0 — filter null vectors upstream. */
case class HyperplaneSig(child: Expression, planes: Int, seed: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(planes > 0 && planes <= 63, s"planes=$planes must be in [1, 63]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType

  // Per-plane seed: xxhash64 folds its argument list left-to-right starting
  // from the literal seed 42 — hashLong(seed, 42) then hashInt(p, ·). The
  // element term hashInt(j, planeSeed) stays in the inner loop.
  @transient private lazy val planeSeeds: Array[Long] = HyperplaneSig.planeSeeds(planes, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var anyNull = false
    var j = 0
    while (j < n && !anyNull) { if (arr.isNullAt(j)) anyNull = true; j += 1 }
    var bucket = 0L
    if (!anyNull) {
      var p = 0
      while (p < planes) {
        val ps = planeSeeds(p)
        var dot = 0.0
        var i = 0
        while (i < n) {
          val h = XXH64.hashInt(i, ps)
          val m = ((h % 2000001L) + 2000001L) % 2000001L - 1000000L
          dot += arr.getFloat(i).toDouble * m.toDouble
          i += 1
        }
        bucket = (bucket << 1) | (if (dot >= 0.0) 1L else 0L)
        p += 1
      }
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("planeSeeds", planeSeeds, "long[]")
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val anyNull = ctx.freshName("anyNull")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val ps = ctx.freshName("ps")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      s"""
         |int $n = $c.numElements();
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |  if ($c.isNullAt($i)) $anyNull = true;
         |}
         |long $bucket = 0L;
         |if (!$anyNull) {
         |  for (int $p = 0; $p < $planes; $p++) {
         |    long $ps = $seedsRef[$p];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $h = $xxh.hashInt($i, $ps);
         |      long $m = (($h % 2000001L) + 2000001L) % 2000001L - 1000000L;
         |      $dot += ((double) $c.getFloat($i)) * ((double) $m);
         |    }
         |    $bucket = ($bucket << 1) | ($dot >= 0.0 ? 1L : 0L);
         |  }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_sig"
}

object HyperplaneSig {
  private[graft] def planeSeeds(planes: Int, seed: Long): Array[Long] = {
    val h0 = XXH64.hashLong(seed, 42L) // xxhash64's default literal seed
    Array.tabulate(planes)(p => XXH64.hashInt(p, h0))
  }
}

/** 64-bit SimHash over a string array: bit j of the result is set iff the
  * ±1 votes of bit j across element hashes sum positive. Empty → 0. */
case class SimHash64(child: Expression, seed: Long)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashExpressions.hash64(arr.getUTF8String(i), seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val he = "org.apache.spark.sql.graft.HashExpressions"
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $he.hash64($c.getUTF8String($i), ${seed}L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) { if ($votes[$j] > 0) $out |= (1L << $j); }
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

/** Fused text → word-`n`-gram → per-shingle 64-bit hashes in ONE
  * codegen'd pass, materializing no shingle strings in the row output —
  * the corpus-side scan of benchmark decontamination
  * (graft.operators.Decontaminate). Shingle walk and ≤n-token whole-doc
  * fallback are identical to MinHashTextSig's (and TextFunctions.shingles);
  * only the fold differs: every shingle hash is emitted instead of k mins.
  */
case class ShingleHashes(child: Expression, shingleN: Int, seed: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(shingleN > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleHashes.compute(input.asInstanceOf[UTF8String], shingleN, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.sql.graft.ShingleHashes"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.compute($c, $shingleN, ${seed}L));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_hashes"
}

object ShingleHashes {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, shingleN: Int, seed: Long): Array[Long] = {
    val toks = ws.split(text.toString, -1)
    val sb = new java.lang.StringBuilder(64)
    def hashOf(): Long =
      HashExpressions.hash64(UTF8String.fromString(sb.toString), seed)
    if (toks.length <= shingleN) {
      var i = 0
      while (i < toks.length) {
        if (i > 0) sb.append(' ')
        sb.append(toks(i)); i += 1
      }
      Array(hashOf())
    } else {
      val out = new Array[Long](toks.length - shingleN + 1)
      var start = 0
      while (start < out.length) {
        sb.setLength(0)
        var i = 0
        while (i < shingleN) {
          if (i > 0) sb.append(' ')
          sb.append(toks(start + i)); i += 1
        }
        out(start) = hashOf()
        start += 1
      }
      out
    }
  }

  def column(text: org.apache.spark.sql.Column, n: Int, seed: Long): org.apache.spark.sql.Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(text), n, seed))
}
