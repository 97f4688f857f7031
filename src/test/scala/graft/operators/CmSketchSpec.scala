package graft.operators

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the r14 oracle promotions: the replayable count-min sketch
  * (q_freq_sketch) and the rank-exact adaptive-accuracy configuration of
  * approx_percentile (q_approx_percentile). */
class CmSketchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def terms = {
    // Zipf-ish term stream: term_k appears 200/k times
    val rows = (1 to 40).flatMap(k => Seq.fill(200 / k)(s"term_$k"))
    rows.toDF("term")
  }

  test("CMS never underestimates, and the bound holds at every probe") {
    val t = terms
    val n = t.count()
    val width = 256
    val sketch = CmSketch.build(t, "term", depth = 5, width = width)
    val exact = t.groupBy("term").agg(count(lit(1)).as("n_exact"))
    val est = CmSketch.estimate(sketch, exact, "term", depth = 5, width = width)
      .select("term", "n_exact", "n_est").as[(String, Long, Long)].collect()
    assert(est.length == 40)
    est.foreach { case (term, ex, e) =>
      assert(e >= ex, s"$term: est $e < exact $ex — CMS must never underestimate")
      // e/width slack is the standard expected-overestimate bound; with
      // depth 5 a violation at ANY probe on this fixed corpus would mean
      // the hash family is broken, not bad luck (the corpus and hashes
      // are deterministic, so this is a pinned value, not a flake).
      assert(e <= ex + (math.E / width * n).ceil.toLong * 5,
        s"$term: est $e way over exact $ex")
    }
  }

  test("out-of-corpus probes estimate 0, not vanish: absent cells read " +
    "as 0 through the left join") {
    val t = terms
    val width = 256
    val sketch = CmSketch.build(t, "term", depth = 5, width = width)
    val probes = Seq("term_1", "never_seen_a", "never_seen_b").toDF("term")
    val est = CmSketch.estimate(sketch, probes, "term", depth = 5, width = width)
      .select("term", "n_est").as[(String, Long)].collect().toMap
    assert(est.size == 3, s"every probe must appear in the output: $est")
    assert(est("term_1") >= 200)
    // an unseen term's cells are (with this corpus/width) untouched, so
    // the true CMS answer is the zero min — an inner join used to DROP
    // these rows entirely
    assert(est("never_seen_a") == 0 && est("never_seen_b") == 0, s"$est")
  }

  test("sketch build is deterministic and mergeable: union of halves == whole") {
    val t = terms.withColumn("half", (crc32(col("term")) % 2).cast("int"))
    val whole = CmSketch.build(t, "term", 5, 256)
    val merged = CmSketch.build(t.filter(col("half") === 0), "term", 5, 256)
      .unionByName(CmSketch.build(t.filter(col("half") =!= 0), "term", 5, 256))
      .groupBy("row", "col").agg(sum("n").as("n"))
    val a = whole.orderBy("row", "col").as[(Int, Long, Long)].collect().toSeq
    val b = merged.orderBy("row", "col").as[(Int, Long, Long)].collect().toSeq
    assert(a == b, "cell-wise merge must equal the one-shot build")
  }

  test("adaptive accuracy = 2N+1 makes approx_percentile rank-exact") {
    // the q_approx_percentile oracle contract: with targetError < 0.5 the
    // GK summaries cannot merge, and query(q) returns the element at rank
    // ceil(q*n) — verified here against an explicit window ranking
    val vals = (1 to 999).map(i => ((i * 7919) % 997).toDouble / 3.0)
    val df = vals.toDF("x").repartition(8) // multi-partition merge path
    val n = vals.length
    val acc = 2L * n + 1
    val got = df.agg(expr(
      s"approx_percentile(x, array(0.1, 0.5, 0.9), $acc)")).head
      .getSeq[Double](0)
    val sorted = vals.sorted
    val want = Seq(0.1, 0.5, 0.9).map(q => sorted(math.ceil(q * n).toInt - 1))
    assert(got == want,
      s"adaptive-accuracy approx_percentile must hit rank ceil(q*n) exactly: $got vs $want")
  }
}
