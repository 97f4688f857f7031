package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rrfFuse matches the hand-computed 1/(c+r) sum and tie-breaks by doc_id") {
    // list A ranks docs 1,2,3; list B ranks docs 3,2,4
    val a = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3)).toDF("query_id", "doc_id", "rank")
    val b = Seq(("q", 3L, 1), ("q", 2L, 2), ("q", 4L, 3)).toDF("query_id", "doc_id", "rank")
    val rows = Retrieval.rrfFuse(Seq(a, b), k = 4, c = 60)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    def rr(r: Int) = 1.0 / (60 + r)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(1L) == rnd(rr(1)))
    assert(rows(2L) == rnd(rr(2) + rr(2)))
    assert(rows(3L) == rnd(rr(3) + rr(1)))
    assert(rows(4L) == rnd(rr(3)))
    // RRF rewards the rank-1 hit: doc 3 (1/61 + 1/63) edges doc 2 (2/62)
    assert(rows(3L) > rows(2L))
  }

  test("rrfFuse keeps only top-k per query, cut by rounded score then doc_id") {
    val a = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a), k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(1L, 2L))
  }

  test("hybridTopK dense side scans the embeddings table exactly once for all probes") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def probe(id: Long) = emb.filter($"vec_id" === id).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    val out = Retrieval.hybridTopK(docs, "doc_id", "text", emb, "vec_id", "embedding",
      Seq(("q1", "spark join window", probe(1)),
        ("q2", "merge batch stream", probe(2)),
        ("q3", "filter scan union", probe(3))), k = 5, poolK = 20)
    val plan = out.queryExecution.executedPlan.toString
    val scans = "embeddings\\.parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"expected ONE embeddings scan for 3 probes, plan has $scans:\n$plan")
  }

  test("hybridTopK surfaces sparse-only and dense-only candidates") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probe = emb.filter($"vec_id" === 1).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    val out = Retrieval.hybridTopK(docs, "doc_id", "text", emb, "vec_id", "embedding",
      Seq(("q1", "spark join window", probe)), k = 10, poolK = 50)
      .collect()
    assert(out.length == 10)
    // the dense ranker's self-match (vec 1 at rank 1) must surface
    assert(out.exists(_.getLong(1) == 1L), "dense rank-1 self match missing from fusion")
  }
}
