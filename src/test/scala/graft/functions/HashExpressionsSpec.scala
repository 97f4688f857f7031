package graft.functions

import graft.GraftExtensions
import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HashExpressionsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight again"),
    (1L, "the quick brown fox jumps over the lazy dog tonight again"), // dup of 0
    (2L, "the quick brown fox jumps over the lazy dog today again"),   // near dup
    (3L, "completely different text about query engines and planners")
  ).toDF("doc_id", "text")

  test("native minhash: identical docs share the full signature; near docs most of it") {
    val sigs = docs.select(TextFunctions.minhashSignatureFast(
      TextFunctions.shingles(col("text"), 2), 64).as("s")).as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    val nearAgree = sigs(0).zip(sigs(2)).count { case (a, b) => a == b }
    val farAgree = sigs(0).zip(sigs(3)).count { case (a, b) => a == b }
    assert(nearAgree > 64 / 2, s"near doc agreed on $nearAgree/64")
    assert(farAgree < 8, s"unrelated doc agreed on $farAgree/64")
  }

  test("native minhash is deterministic and seed-sensitive") {
    val s1 = docs.select(TextFunctions.minhashSignatureFast(
      TextFunctions.shingles(col("text"), 2), 32, seed = 7).as("s")).as[Seq[Long]].collect()
    val s2 = docs.select(TextFunctions.minhashSignatureFast(
      TextFunctions.shingles(col("text"), 2), 32, seed = 7).as("s")).as[Seq[Long]].collect()
    val s3 = docs.select(TextFunctions.minhashSignatureFast(
      TextFunctions.shingles(col("text"), 2), 32, seed = 8).as("s")).as[Seq[Long]].collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.head != s3.head)
  }

  test("native simhash: hamming tracks similarity, matches interpreted eval") {
    val h = docs.select(TextFunctions.simhash64Fast(
      TextFunctions.tokens(col("text"))).as("h")).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(0) == h(1))
    assert(ham(h(0), h(2)) < ham(h(0), h(3)))
  }

  test("SQL registration: graft_minhash and graft_simhash callable from SQL") {
    GraftExtensions.install(spark)
    docs.createOrReplaceTempView("graft_hash_docs")
    val n = spark.sql(
      """SELECT graft_simhash(split(text, ' '), 42) AS h,
        |       graft_minhash(split(text, ' '), 16, 42) AS m
        |FROM graft_hash_docs""".stripMargin)
    val rows = n.collect()
    assert(rows.length == 4)
    assert(rows.head.getSeq[Long](1).length == 16)
  }

  test("SQL registration: graft_minhash_text and the graft_top_k aggregate") {
    GraftExtensions.install(spark)
    docs.createOrReplaceTempView("graft_hash_docs2")
    val sig = spark.sql(
      "SELECT graft_minhash_text(text, 2, 16, 42) AS s FROM graft_hash_docs2")
      .collect()
    assert(sig.length == 4 && sig.head.getSeq[Long](0).length == 16)
    // aggregate usable straight from SQL GROUP BY
    val top = spark.sql(
      """SELECT doc_id % 2 AS grp,
        |       graft_top_k(struct(length(text), doc_id), 1) AS best
        |FROM graft_hash_docs2 GROUP BY 1 ORDER BY grp""".stripMargin)
      .collect()
    assert(top.length == 2)
    assert(top.forall(_.getSeq[Any](1).length == 1))
  }

  test("fused text minhash is bit-identical to the composed shingles→minhash pipeline") {
    // fixture docs + adversarial whitespace shapes the split("\\s+")
    // semantics must reproduce (leading empty token, kept trailing
    // empties, multi-space runs, short texts, empty text)
    val tricky = Seq(
      (100L, ""), (101L, "one"), (102L, "one two"), (103L, " leading space"),
      (104L, "trailing space "), (105L, "multi   space   runs"),
      (106L, "tabs\tand\nnewlines mixed  in")
    ).toDF("doc_id", "text")
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").unionByName(tricky)
    for (n <- Seq(1, 3, 5); k <- Seq(16, 64)) {
      val both = d.select(
        TextFunctions.minhashTextSignature(col("text"), n, k, seed = 7).as("fused"),
        TextFunctions.minhashSignatureFast(
          TextFunctions.shingles(col("text"), n), k, seed = 7).as("composed"))
      val mismatches = both.filter(col("fused") =!= col("composed")).count()
      assert(mismatches == 0, s"n=$n k=$k: $mismatches signatures diverge")
    }
  }

  test("native hyperplane sig is bit-identical to the HOF formulation on fixtures") {
    import graft.operators.Similarity
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    for (planes <- Seq(2, 8, 16); seed <- Seq(42L, 7L)) {
      val both = e.select(
        col("vec_id"),
        Similarity.hyperplaneBucket(col("embedding"), planes, seed).as("native"),
        Similarity.hyperplaneBucketHof(col("embedding"), planes, seed).as("hof"))
      val mismatches = both.filter(col("native") =!= col("hof")).count()
      assert(mismatches == 0, s"planes=$planes seed=$seed: $mismatches buckets diverge")
    }
  }

  test("native hyperplane sig edge cases: empty vector → all bits set; null element → 0") {
    val df = Seq(
      (0L, Some(Array.empty[Float])),
      (1L, Some(Array(1.0f, -2.0f)))).toDF("id", "v")
    val out = df.select(col("id"),
      graft.operators.Similarity.hyperplaneBucket(col("v"), 4).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(out(0L) == 15L) // empty → dot 0.0 per plane → every bit 1
    // null element zeroes every plane's dot under the HOF semantics
    val withNullElem = spark.sql("SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS v")
    val b = withNullElem.select(
      graft.operators.Similarity.hyperplaneBucket(col("v"), 4).as("b")).as[Long].head()
    assert(b == 0L)
  }

  test("codegen path active for native hash expressions") {
    // must read from parquet: a local Seq relation is constant-folded by
    // ConvertToLocalRelation (interpreted eval), leaving no codegen stage.
    // simhash's input (split) is codegen-able; shingles' lambda exprs are
    // CodegenFallback and would drag the whole Project out of codegen —
    // which is exactly why Dedup persists the shingle frame before the
    // signature projection (the minhash Project then reads the cache).
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val q = d.select(
      TextFunctions.simhash64Fast(TextFunctions.tokens(col("text"))).as("h"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("graft_simhash") && l.contains("*(")), plan)

    val sh = d.select(TextFunctions.shingles(col("text"), 3).as("s")).persist()
    val q2 = sh.select(TextFunctions.minhashSignatureFast(col("s"), 32).as("m"))
    q2.collect()
    val plan2 = q2.queryExecution.executedPlan.toString
    assert(plan2.linesIterator.exists(l => l.contains("graft_minhash") && l.contains("*(")), plan2)
    sh.unpersist()

    // hyperplane sig must stay inside whole-stage codegen — it scans the
    // full corpus in the ANN/near-dup bucketing pass
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q3 = emb.select(
      graft.operators.Similarity.hyperplaneBucket(col("embedding"), 8).as("b"))
    q3.collect()
    val plan3 = q3.queryExecution.executedPlan.toString
    assert(plan3.linesIterator.exists(l =>
      l.contains("graft_hyperplane_sig") && l.contains("*(")), plan3)
  }

  test("fused shingle hashes equal hash64 over the composed shingle walk " +
    "(incl. short-doc and whitespace edges)") {
    import org.apache.spark.unsafe.types.UTF8String
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one", "a b", "exactly three tokens", " leading space",
      "trailing space ", "double  space", "")
    val df = samples.toDF("text")
    val got = df.select(
      org.apache.spark.sql.graft.ShingleHashes.column(col("text"), 3, 42L).as("h"))
      .as[Seq[Long]].collect()
    // reference walk: the composed shingles() column, hashed driver-side
    val want = df.select(TextFunctions.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect()
      .map(_.map(s => org.apache.spark.sql.graft.HashExpressions
        .hash64(UTF8String.fromString(s), 42L)))
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("shingle-hash scan stays inside whole-stage codegen") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val q = d.select(
      org.apache.spark.sql.graft.ShingleHashes.column(col("text"), 8, 42L).as("h"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_shingle_hashes") && l.contains("*(")), plan)
  }
}
