package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join spark"), // tf(spark)=2, dl=3
    (2L, "join window merge"),
    (3L, "spark window window window"),
    (4L, "merge merge merge merge")) // no query terms for q1
    .toDF("doc_id", "text")

  /** Reference BM25 computed independently, plain Scala. */
  private def ref(qTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
    : Map[Long, Double] = {
    val toks = Map(
      1L -> Seq("spark", "join", "spark"),
      2L -> Seq("join", "window", "merge"),
      3L -> Seq("spark", "window", "window", "window"),
      4L -> Seq("merge", "merge", "merge", "merge"))
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    toks.flatMap { case (id, ts) =>
      val score = qTerms.distinct.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = toks.values.count(_.contains(t)).toDouble
          math.log(1 + (n - df + 0.5) / (df + 0.5)) * tf * (k1 + 1) /
            (tf + k1 * (1 - b + b * ts.size / avgdl))
        }
      }.sum
      if (score > 0) Some(id -> score) else None
    }
  }

  test("scores match an independent reference and rank by rounded score " +
    "with doc_id tie-break") {
    val got = Bm25.topK(docs, "doc_id", "text",
      Seq("q1" -> "spark join"), k = 10)
      .as[(String, Long, Double)].collect()
    val expected = ref(Seq("spark", "join"))
    assert(got.map(_._2).toSet == expected.keySet) // doc 4 absent
    got.foreach { case (_, id, s) =>
      assert(math.abs(s - expected(id)) < 1e-4, s"doc $id: $s vs ${expected(id)}")
    }
    assert(got.forall(_._1 == "q1"))
  }

  test("duplicate query terms collapse; k truncates per query by score") {
    val one = Bm25.topK(docs, "doc_id", "text",
      Seq("q" -> "spark spark"), k = 10).as[(String, Long, Double)].collect()
    val dedup = Bm25.topK(docs, "doc_id", "text",
      Seq("q" -> "spark"), k = 10).as[(String, Long, Double)].collect()
    assert(one.toSeq == dedup.toSeq)

    val top1 = Bm25.topK(docs, "doc_id", "text",
      Seq("q" -> "spark join"), k = 1).as[(String, Long, Double)].collect()
    assert(top1.length == 1)
    val full = ref(Seq("spark", "join"))
    val best = full.toSeq
      .sortBy { case (id, s) => (-BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, id) }.head._1
    assert(top1.head._2 == best)
  }

  test("multiple queries score independently in one pass") {
    val got = Bm25.topK(docs, "doc_id", "text",
      Seq("a" -> "spark", "b" -> "merge"), k = 10)
      .as[(String, Long, Double)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ("a").map(_._2).toSet == Set(1L, 3L))
    assert(byQ("b").map(_._2).toSet == Set(2L, 4L))
  }
}
