package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CurationOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chunker emits overlapping windows and never drops the tail") {
    val docs = Seq((1L, "a b c d e f g h i j k")).toDF("doc_id", "text") // 11 tokens
    val out = Chunker.chunk(docs, "doc_id", "text", chunkTokens = 5, stride = 3)
      .as[(Long, Int, String)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == Seq(
      "a b c d e",   // 1..5
      "d e f g h",   // 4..8
      "g h i j k"))  // 7..11 — reaches the end, so no (contained) 10..11 tail
    // overlap = chunkTokens - stride = 2 tokens between consecutive chunks
    assert(out(0)._3.split(" ").takeRight(2).sameElements(out(1)._3.split(" ").take(2)))
  }

  test("chunker never emits a tail chunk fully contained in the previous one " +
    "(chunkTokens > stride)") {
    // 400 tokens at defaults 512/384: one chunk covers everything; the old
    // start sequence also emitted chunk 1 = tokens 385..400, a duplicate
    // of chunk 0's tail — poisoned training text
    val text = (1 to 400).map(i => s"t$i").mkString(" ")
    val out = Chunker.chunk(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, Int, String)].collect()
    assert(out.length == 1 && out.head._2 == 0)
    assert(out.head._3.split(" ").length == 400)
  }

  test("chunker emits a shorter final chunk when the tail extends past the " +
    "previous chunk's end") {
    // 11 tokens, 10/8: chunk 0 = 1..10, chunk 1 = 9..11 (token 11 is new)
    val text = (1 to 11).map(i => s"t$i").mkString(" ")
    val out = Chunker.chunk(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 10, stride = 8)
      .as[(Long, Int, String)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == Seq(
      (1 to 10).map(i => s"t$i").mkString(" "),
      (9 to 11).map(i => s"t$i").mkString(" ")))
    // every token still appears in some chunk (tail never dropped)
    assert(out.flatMap(_._3.split(" ")).toSet == (1 to 11).map(i => s"t$i").toSet)
  }

  test("chunker: document shorter than one chunk yields exactly one chunk") {
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val out = Chunker.chunk(docs, "doc_id", "text", chunkTokens = 10, stride = 8)
      .as[(Long, Int, String)].collect()
    assert(out.toSeq == Seq((1L, 0, "x y")))
  }

  test("chunker rejects stride > chunkTokens (tokens would be dropped)") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunker.chunk(docs, "doc_id", "text", chunkTokens = 4, stride = 5)
    }
  }

  test("decontamination flags docs sharing an n-gram with the benchmark " +
    "and clean() drops exactly those") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // contains bench 3-gram
      (2L, "completely unrelated text about spark engines"),
      (3L, "another doc where quick brown fox appears too")) // same 3-gram
      .toDF("doc_id", "text")
    val benchmark = Seq("benchmark asks about the quick brown fox story")
      .toDF("q")
    val flagged = Decontaminate
      .contaminatedIds(corpus, "doc_id", "text", benchmark, "q", n = 3)
      .as[Long].collect().toSet
    assert(flagged == Set(1L, 3L))
    val kept = Decontaminate.clean(corpus, "doc_id", "text", benchmark, "q", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("decontamination with no overlap keeps the whole corpus") {
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val benchmark = Seq("epsilon zeta eta theta").toDF("q")
    assert(Decontaminate.clean(corpus, "doc_id", "text", benchmark, "q", n = 2)
      .count() == 1)
  }

  test("token-budget two-pass selection equals the naive single-window " +
    "cumsum on real documents, at two scales") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the scale-safe plan (bucket aggregate + boundary-only window) must
    // admit EXACTLY the docs — with exactly the cum_toks — of the
    // one-task-per-language window it replaces (which is also what the
    // DuckDB oracle runs)
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val d = s"/root/testdata/$sf"
      val fast = graft.SparkEntry.queries("q_token_budget")(spark, d)
      val toks = split(col("text"), " ")
      val scored = graft.sources.Tables.documents(spark, d).select(
        col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_toks"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 6)
          .as("uq"))
      val w = Window.partitionBy("lang")
        .orderBy(col("uq").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = scored.withColumn("cum_toks", sum("n_toks").over(w))
        .filter(col("cum_toks") <= 3000)
        .select("doc_id", "lang", "n_toks", "cum_toks")
        .orderBy("lang", "doc_id")
      assert(fast.collect().toSeq == naive.collect().toSeq, sf)
    }
  }
}
