package graft.functions

import graft.flow.SparkTestSession
import graft.functions.TextFunctions._
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Md5Expressions, Md5MinHashTextSig, Md5PlaneSig}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused native md5 kernels bit-equal to the composed SQL forms
  * whose algebra the DuckDB oracle replays. This parity is the entire
  * contract that lets q_minhash_pairs / q_embedding_near_dup /
  * q_semantic_dedup keep their r13 oracle promotions while the engine
  * scan runs the fast path: oracle SQL unchanged, engine values proven
  * identical to what the SQL spelling computes. */
class Md5KernelParitySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "", // single empty token after split
    "one",
    "one two",
    "one two three",
    "  leading and   multiple   spaces ", // split artifacts: empty first token, kept trailing empty
    "tabs\tand\nnewlines count as whitespace",
    "unicode æøå 中文 emoji 😀 bytes",
    ("w " * 200).trim // long doc: 200 tokens, 198 shingles at n=3
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("native md5 minhash signature == composed replayable form, all edge texts") {
    for (n <- Seq(1, 2, 3); k <- Seq(4, 32)) {
      val df = texts.toDF("id", "text")
      val both = df.select(
        col("id"),
        Md5Expressions.md5MinhashText(col("text"), n, k).as("fused"),
        minhashSignatureReplayable(shingles(col("text"), n), k).as("composed"))
      val rows = both.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"minhash mismatch n=$n k=$k id=${r.getLong(0)}")
      }
    }
  }

  test("native md5 simhash == composed replayable form, all edge texts") {
    val df = texts.toDF("id", "text")
    val rows = df.select(
      col("id"),
      simhash64ReplayableText(col("text")).as("fused"),
      simhash64Replayable(tokens(col("text"))).as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"simhash mismatch id=${r.getLong(0)}: " +
          s"fused=${r.getLong(1)} composed=${r.getLong(2)}")
    }
  }

  test("native md5 simhash: NULL text yields NULL like the composed form") {
    val df = Seq((0L, Option.empty[String]), (1L, Some("a b"))).toDF("id", "text")
    val rows = df.select(
      col("id"),
      simhash64ReplayableText(col("text")).as("fused"),
      simhash64Replayable(tokens(col("text"))).as("composed"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(!rows(1).isNullAt(1) && rows(1).getLong(1) == rows(1).getLong(2))
  }

  test("coefficient families agree between expression object and TextFunctions") {
    val (as, bs) = Md5MinHashTextSig.coefs(32)
    val ref = replayCoefs(32)
    assert(as.toSeq == ref.map(_._1))
    assert(bs.toSeq == ref.map(_._2))
  }

  test("plane component table agrees with Similarity.md5PlaneComponent") {
    val dim = 5
    val comps = Md5PlaneSig.components(4, dim)
    for (p <- 0 until 4; j <- 0 until dim)
      assert(comps(p * dim + j) == Similarity.md5PlaneComponent(p, j))
  }

  test("native md5 plane bucket == composed HOF form, incl. rounding edges") {
    val dim = 6
    val vecs = Seq(
      Array(0.1f, -0.2f, 0.3f, -0.4f, 0.5f, -0.6f),
      Array(1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f),
      Array(-1.0f, -1.0f, -1.0f, -1.0f, -1.0f, -1.0f),
      // exact .5 quantization edges where HALF_UP and Math.round diverge
      // for negatives: -0.0000005·10⁶ = -0.5 → HALF_UP -1, Math.round 0
      Array(0.0000005f, -0.0000005f, 0.0000015f, -0.0000015f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 0f, 0f),
      Array(0.9999995f, -0.9999995f, 0.1234567f, -0.7654321f, 0.5f, -0.5f)
    ).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    for (planes <- Seq(2, 4, 8)) {
      val df = vecs.toDF("id", "vec")
      val rows = df.select(
        col("id"),
        Similarity.replayableHyperplaneBucket(col("vec"), planes, dim).as("fused"),
        Similarity.replayableHyperplaneBucketHof(col("vec"), planes, dim).as("composed"))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"plane bucket mismatch planes=$planes id=${r.getLong(0)}")
      }
    }
  }

  test("array<double> input buckets identically to its float spelling — " +
    "the composed HOF form accepted any numeric array, so the fused " +
    "kernel must not narrow the public operator API") {
    val dim = 6
    val vecs = Seq(
      Array(0.1f, -0.2f, 0.3f, -0.4f, 0.5f, -0.6f),
      Array(0.0000005f, -0.0000005f, 0.0000015f, -0.0000015f, 0f, 0f),
      Array(0.9999995f, -0.9999995f, 0.1234567f, -0.7654321f, 0.5f, -0.5f)
    ).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val planes = 4
    val fl = vecs.toDF("id", "vec")
      .select(col("id"),
        Similarity.replayableHyperplaneBucket(col("vec"), planes, dim).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // float→double per element is exact, so the double spelling of the
    // same vectors must land in the same buckets
    val db = vecs.map { case (i, v) => (i, v.map(_.toDouble)) }.toDF("id", "vec")
      .select(col("id"),
        Similarity.replayableHyperplaneBucket(col("vec"), planes, dim).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fl == db, s"float=$fl double=$db")
  }

  test("quantize replicates Spark round()'s BigDecimal HALF_UP, not Math.round") {
    // -0.5 must round away from zero: Spark round(-0.5) = -1
    assert(Md5PlaneSig.quantize(-0.0000005d) == -1L)
    assert(Md5PlaneSig.quantize(0.0000005d) == 1L)
    // spot-check against the engine's own round() on a float-cast grid
    val xs = Seq(-1.5e-6f, -5e-7f, -1e-7f, 0f, 1e-7f, 5e-7f, 1.5e-6f,
      0.1234567f, -0.9876543f)
    val engine = xs.toDF("x")
      .select(round(col("x").cast("double") * lit(1000000.0)).cast("long"))
      .as[Long].collect()
    val kernel = xs.map(x => Md5PlaneSig.quantize(x.toDouble))
    assert(engine.toSeq == kernel)
  }

  test("degenerate vectors bucket to 0 like the composed algebra") {
    val dim = 4
    val df = Seq(
      (0L, Array[java.lang.Float](1f, 2f, null, 4f)), // null element
      (1L, Array[java.lang.Float](1f, 2f))            // shorter than dim
    ).toDF("id", "vec").select(col("id"), col("vec").cast("array<float>").as("vec"))
    val rows = df.select(
      Similarity.replayableHyperplaneBucket(col("vec"), 3, dim)).as[Long].collect()
    assert(rows.toSeq == Seq(0L, 0L))

    val hof = df.select(
      Similarity.replayableHyperplaneBucketHof(col("vec"), 3, dim)).as[Long].collect()
    assert(hof.toSeq == Seq(0L, 0L))
  }
}
