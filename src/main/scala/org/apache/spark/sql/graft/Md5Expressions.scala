package org.apache.spark.sql.graft

import java.math.RoundingMode
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the ORACLE-REPLAYABLE md5 hash family (SURVEY §4.3,
  * r13 promotion pattern).
  *
  * The replayable dedup paths (`Dedup.minhashNearDupReplayable`,
  * `Dedup.embeddingNearDupReplayable`, `Clustering.semanticDedupBuckets`)
  * were first written as composed SQL expressions so that DuckDB could
  * replay every stage bit-identically — which bought four oracle
  * promotions but priced the corpus scan at interpreted higher-order-
  * function speed: `transform`/`aggregate`/`zip_with` are CodegenFallback
  * (a lambda frame per element per row), and the MinHash form evaluated
  * `md5 → hex → substring → conv` per shingle plus k separate
  * `array_min(transform(...))` folds over the materialized base array.
  * The r13 bench priced that at 2.8× (minhash) / 2.2× (embedding) the
  * fused-kernel variants.
  *
  * These expressions compute the IDENTICAL values — the md5 is the same
  * digest, the quantization replicates `round()`'s BigDecimal.valueOf
  * HALF_UP semantics exactly, the Carter–Wegman multiply-add-mod and the
  * int64 plane dots are the same exact integer arithmetic — in one fused
  * per-row loop: one MessageDigest call per shingle (no hex string round
  * trip), one quantization pass per vector, k multiply-adds per base.
  * Parity with the composed forms is pinned per expression in
  * Md5KernelParitySpec, and the DuckDB oracle SQL is UNCHANGED: the
  * oracle replays the same algebra it always did; only the engine-side
  * evaluation strategy moved.
  */
object Md5Expressions {

  /** Mersenne prime 2³¹−1 — must match TextFunctions.ReplayP. */
  val P: Long = 2147483647L

  private val digestTL = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Full 16-byte md5 digest via the per-thread MessageDigest. */
  def md5Digest(bytes: Array[Byte]): Array[Byte] = {
    val d = digestTL.get()
    d.reset()
    d.digest(bytes)
  }

  /** First 4 digest bytes as the unsigned 32-bit int the SQL spelling
    * `('0x' || substring(md5(s), 1, 8))::BIGINT` produces. */
  def md5Base32(bytes: Array[Byte]): Long = {
    val h = md5Digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  def md5MinhashText(text: Column, shingleN: Int, numHashes: Int): Column =
    ExpressionUtils.column(
      Md5MinHashTextSig(ExpressionUtils.expression(text), shingleN, numHashes))

  def md5PlaneSig(vec: Column, planes: Int, dim: Int): Column =
    ExpressionUtils.column(Md5PlaneSig(ExpressionUtils.expression(vec), planes, dim))

  def md5SimHashText(text: Column): Column =
    ExpressionUtils.column(Md5SimHashText(ExpressionUtils.expression(text)))
}

/** Fused text → whitespace tokens → md5-half votes → 64-bit SimHash;
  * bit-identical to
  * `TextFunctions.simhash64Replayable(TextFunctions.tokens(text))` (the
  * q_simhash_pairs / q_media_curate* oracle algebra): per token the two
  * 32-bit md5 halves (bits 32–63 from hex chars [0,8) = digest bytes
  * 0–3, bits 0–31 from [8,16) = bytes 4–7) vote ±1 per bit position and
  * result bit j is set iff the vote sum is positive. The composed form
  * is a CodegenFallback higher-order tree (a 64-wide zip_with per token
  * plus TWO separate md5 → hex → substring → conv chains per token);
  * this kernel is one digest and two unrolled 32-bit vote loops per
  * token. NULL text yields NULL, exactly like the composed form
  * (tokens(NULL) = NULL → aggregate(NULL) = NULL). Empty text matches
  * too: split("", -1) = [""] both here and in Spark's split. Parity is
  * pinned in Md5KernelParitySpec; the DuckDB oracle SQL is unchanged. */
case class Md5SimHashText(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      Md5SimHashText.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.sql.graft.Md5SimHashText"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5SimHashText =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_simhash_text"
}

object Md5SimHashText {
  // identical token walk to Spark's split(text, "\\s+") (limit -1:
  // trailing empties kept, leading whitespace yields an empty first
  // token) — the same pattern Md5MinHashTextSig pins parity for
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** One pass: tokenize, digest each token once, accumulate the 64 ±1
    * vote sums, fold signs into the fingerprint. Static forwarder shared
    * by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val toks = ws.split(text.toString, -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = Md5Expressions.md5Digest(
        toks(i).getBytes(StandardCharsets.UTF_8))
      val hi = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      val lo = ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
        ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
      var j = 0
      while (j < 32) {
        if (((lo >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      while (j < 64) {
        if (((hi >>> (j - 32)) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

/** Fused text → word-`shingleN`-gram → md5-base → Carter–Wegman MinHash
  * signature; bit-identical to
  * `TextFunctions.minhashSignatureReplayable(shingles(text, n), k)` with
  * the same shingle walk as [[MinHashTextSig]] (≤ n tokens → one
  * whole-text shingle; `split("\\s+")` artifacts reproduced exactly).
  * NULL text yields NULL (standard null-intolerant expression) where the
  * composed form yields an all-NULL array — filter null text upstream,
  * as every registered caller does. */
case class Md5MinHashTextSig(child: Expression, shingleN: Int, numHashes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(shingleN > 0 && numHashes > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val (as, bs): (Array[Long], Array[Long]) =
    Md5MinHashTextSig.coefs(numHashes)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Md5MinHashTextSig.compute(input.asInstanceOf[UTF8String], shingleN, as, bs))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("md5mhA", as, "long[]")
    val bRef = ctx.addReferenceObj("md5mhB", bs, "long[]")
    val cls = "org.apache.spark.sql.graft.Md5MinHashTextSig"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.compute($c, $shingleN, $aRef, $bRef));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashTextSig =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_minhash_text"
}

object Md5MinHashTextSig {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Same derivation as TextFunctions.replayCoefs (md5("mha:i")/("mhb:i")
    * prefixes) — computed here so the expression is self-contained; the
    * two are pinned equal in Md5KernelParitySpec. */
  def coefs(numHashes: Int): (Array[Long], Array[Long]) = {
    def c(tag: String, i: Int, mod: Long): Long = {
      val md = MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$tag:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % mod
    }
    val as = Array.tabulate(numHashes)(i => c("mha", i, Md5Expressions.P - 1) + 1)
    val bs = Array.tabulate(numHashes)(i => c("mhb", i, Md5Expressions.P))
    (as, bs)
  }

  /** One-pass tokenize → shingle → md5 base → k-permutation min fold.
    * Static forwarder shared by interpreted eval and generated code. */
  def compute(
      text: UTF8String,
      shingleN: Int,
      as: Array[Long],
      bs: Array[Long]): Array[Long] = {
    // limit -1 matches Spark's split(text, "\\s+"): trailing empties kept,
    // leading whitespace yields an empty first token
    val toks = ws.split(text.toString, -1)
    val mins = Array.fill(as.length)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)

    def fold(): Unit = {
      val x = Md5Expressions.md5Base32(
        sb.toString.getBytes(StandardCharsets.UTF_8)) % Md5Expressions.P
      var j = 0
      while (j < as.length) {
        val v = (x * as(j) + bs(j)) % Md5Expressions.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }

    if (toks.length <= shingleN) {
      var i = 0
      while (i < toks.length) {
        if (i > 0) sb.append(' ')
        sb.append(toks(i)); i += 1
      }
      fold()
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
        fold()
        start += 1
      }
    }
    mins
  }
}

/** Fused md5-hyperplane bucket over an `array<float>` or `array<double>`
  * vector; bit-identical to `Similarity.replayableHyperplaneBucket(vec,
  * planes, dim)`: elements quantize via the same `round()` semantics
  * (BigDecimal.valueOf → HALF_UP — NOT Math.round, which rounds
  * negative halves toward +∞), plane dots are the same exact int64
  * sums over the md5-derived component table, bit p sits at position
  * planes−1−p. Both element types are accepted because the composed
  * higher-order-function form cast per element (`x.cast("double")`) and
  * so took any numeric array — a float-only signature would reject
  * callers the public operator API used to accept. Degenerate inputs
  * reproduce the composed form's algebra: any NULL element, or a vector
  * whose length ≠ dim (zip_with pads with NULL), nulls every plane dot
  * → every bit 0 → bucket 0. */
case class Md5PlaneSig(child: Expression, planes: Int, dim: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(planes >= 1 && planes <= 30, s"planes=$planes out of range")
  require(dim >= 1, s"dim=$dim out of range")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = LongType

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // planes × dim component table, flattened row-major — bounded metadata
  // (≤ 30 × dim longs), same values as Similarity.md5PlaneComponent.
  @transient private lazy val comps: Array[Long] = Md5PlaneSig.components(planes, dim)

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      Md5PlaneSig.compute(input.asInstanceOf[ArrayData], planes, dim, comps, isDouble))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compsRef = ctx.addReferenceObj("md5planes", comps, "long[]")
    val cls = "org.apache.spark.sql.graft.Md5PlaneSig"
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = $cls.compute($c, $planes, $dim, $compsRef, $isDouble);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5PlaneSig =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_plane_sig"
}

object Md5PlaneSig {

  def components(planes: Int, dim: Int): Array[Long] = {
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Long](planes * dim)
    var p = 0
    while (p < planes) {
      var j = 0
      while (j < dim) {
        md.reset()
        val hex = md.digest(s"gp:$p:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
        out(p * dim + j) = java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2000001L - 1000000L
        j += 1
      }
      p += 1
    }
    out
  }

  /** `round(x·10⁶)` with Spark's DoubleType Round semantics:
    * BigDecimal.valueOf (decimal-string value, not exact binary) then
    * HALF_UP, then the double→long cast. */
  def quantize(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, RoundingMode.HALF_UP).doubleValue().toLong

  def compute(
      arr: ArrayData, planes: Int, dim: Int, comps: Array[Long],
      isDouble: Boolean): Long = {
    val n = arr.numElements()
    if (n != dim) return 0L
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L
      q(i) = quantize(if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble)
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dot = 0L
      val base = p * dim
      var j = 0
      while (j < n) {
        dot += q(j) * comps(base + j)
        j += 1
      }
      bucket = (bucket << 1) | (if (dot >= 0L) 1L else 0L)
      p += 1
    }
    bucket
  }
}
