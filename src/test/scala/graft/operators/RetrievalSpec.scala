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

  // ---- mmrRerank ----

  private def vecsDF(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("mmrRerank with lambda=1 is pure relevance order") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probe = emb.filter($"vec_id" === 0).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    val corpus = emb.filter($"vec_id" =!= 0)
    val mmr = Retrieval.mmrRerank(corpus, "vec_id", "embedding", probe,
      k = 5, lambda = 1.0, poolK = 20)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val rel = corpus.select($"vec_id",
      org.apache.spark.sql.functions.round(
        Similarity.cosine($"embedding",
          org.apache.spark.sql.functions.array(probe.map(
            org.apache.spark.sql.functions.lit(_)): _*)), 4).as("rel"))
      .orderBy($"rel".desc, $"vec_id".asc).limit(5)
      .collect().map(_.getLong(0))
    assert(mmr.sortBy(_._1).map(_._2).toSeq == rel.toSeq)
  }

  test("mmrRerank demotes a redundant near-duplicate below a diverse result") {
    val df = vecsDF(Seq(
      1L -> Seq(1f, 0f),        // exact probe match
      2L -> Seq(0.999f, 0.01f), // near-dup of 1: high rel, redundant
      3L -> Seq(0.5f, 0.866f))) // diverse: lower rel
    val out = Retrieval.mmrRerank(df, "vec_id", "embedding", Array(1f, 0f),
      k = 3, lambda = 0.3, poolK = 3)
      .collect().map(_.getLong(1)).toSeq
    // relevance alone would give 1, 2, 3; MMR at low lambda flips 2 and 3
    assert(out == Seq(1L, 3L, 2L), s"got $out")
  }

  test("mmrRerank matches an independent driver-side greedy replay") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probeF = emb.filter($"vec_id" === 0).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    val corpus = emb.filter($"vec_id" =!= 0)
    val got = Retrieval.mmrRerank(corpus, "vec_id", "embedding", probeF,
      k = 6, lambda = 0.7, poolK = 15)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).map(_._2).toSeq

    // independent replay: plain-Scala cosine (same left-to-right fold),
    // same 4-decimal rounding, same greedy recurrence
    def r4(x: Double) = BigDecimal.valueOf(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).doubleValue
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probe = probeF.map(_.toDouble)
    val all = corpus.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val pool = all.map { case (id, v) => (id, v, r4(cos(v, probe))) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(15)
    var cand = pool.toList
    var sel = List.empty[(Long, Array[Double])]
    val want = scala.collection.mutable.ArrayBuffer.empty[Long]
    (1 to 6).foreach { _ =>
      val pick =
        if (sel.isEmpty) cand.minBy { case (id, _, rel) => (-rel, id) }
        else cand.map { case (id, v, rel) =>
          val ms = sel.map(s => r4(cos(v, s._2))).max
          (id, v, rel, r4(0.7 * rel - (1 - 0.7) * ms))
        }.minBy { case (id, _, _, sc) => (-sc, id) } match {
          case (id, v, rel, _) => (id, v, rel)
        }
      want += pick._1
      sel = (pick._1, pick._2) :: sel
      cand = cand.filterNot(_._1 == pick._1)
    }
    assert(got == want.toSeq, s"engine $got != replay ${want.toSeq}")
  }

  test("mmrRerank is deterministic across upstream partitionings") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probe = emb.filter($"vec_id" === 0).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    val corpus = emb.filter($"vec_id" =!= 0)
    def run(df: org.apache.spark.sql.DataFrame) =
      Retrieval.mmrRerank(df, "vec_id", "embedding", probe, k = 5, poolK = 20)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(corpus) == run(corpus.repartition(17)))
  }
}
