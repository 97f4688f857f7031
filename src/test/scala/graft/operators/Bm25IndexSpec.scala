package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class Bm25IndexSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join spark"),
    (2L, "join window merge"),
    (3L, "spark window window window"),
    (4L, "merge merge merge merge"))
    .toDF("doc_id", "text")

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_bm25idx").toString + "/idx"

  test("index path reproduces Bm25.topK exactly — scores, ranking, " +
    "truncation — across a reload") {
    val dir = tmp()
    Bm25Index.buildAndSave(docs, dir, "doc_id", "text")
    val idx = Bm25Index.load(spark, dir)
    val queries = Seq("q1" -> "spark join", "q2" -> "merge window", "q3" -> "spark spark")
    for (k <- Seq(1, 2, 10)) {
      val direct = Bm25.topK(docs, "doc_id", "text", queries, k)
        .as[(String, Long, Double)].collect().toSeq
      val indexed = idx.topK(queries, k)
        .as[(String, Long, Double)].collect().toSeq
      assert(indexed == direct, s"k=$k")
    }
  }

  test("a query reads only its terms' hash-bucket partitions") {
    val dir = tmp()
    val idx = Bm25Index.buildAndSave(docs, dir, "doc_id", "text", buckets = 16)
    val plan = idx.topK(Seq("q" -> "spark"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb#"),
      plan.take(4000))
    // and the pruned read misses terms outside those buckets: a term
    // absent from the corpus scores nothing rather than erroring
    assert(idx.topK(Seq("q" -> "zzz_not_a_term"), 5).count() == 0)
  }
}
