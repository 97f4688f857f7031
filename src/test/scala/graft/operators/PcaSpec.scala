package graft.operators

import graft.flow.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sf)

  private def collectVecs(): Array[Array[Double]] =
    emb.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)

  test("explained variances are non-negative and descending") {
    val m = Pca.fit(emb, "embedding", k = 8)
    assert(m.variances.forall(_ >= 0))
    m.variances.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
  }

  test("components are orthonormal") {
    val m = Pca.fit(emb, "embedding", k = 8)
    for (i <- m.components.indices; j <- m.components.indices) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"components $i,$j dot $dot")
    }
  }

  test("fit is deterministic across upstream partitionings (sign pinned)") {
    val a = Pca.fit(emb, "embedding", k = 4)
    val b = Pca.fit(emb.repartition(7), "embedding", k = 4)
    a.components.zip(b.components).foreach { case (ca, cb) =>
      ca.zip(cb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("the projection expression equals driver-side math") {
    val m = Pca.fit(emb, "embedding", k = 4)
    val got = Pca.project(emb, "embedding", m)
      .select(col("vec_id"), col("pca")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    vecs.foreach { case (id, v) =>
      val centered = v.zip(m.mean).map { case (x, mu) => x - mu }
      val want = m.components.map(c => c.zip(centered).map { case (w, x) => w * x }.sum)
      got(id).zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"vec $id")
      }
    }
  }

  test("projected variance beats a random-direction projection (top component)") {
    val m = Pca.fit(emb, "embedding", k = 1)
    val vecs = collectVecs()
    val mean = m.mean
    def varAlong(dir: Array[Double]): Double = {
      val n = math.sqrt(dir.map(x => x * x).sum)
      val scores = vecs.map(v =>
        v.zip(mean).map { case (x, mu) => x - mu }
          .zip(dir).map { case (x, w) => x * w / n }.sum)
      val mu = scores.sum / scores.length
      scores.map(s => (s - mu) * (s - mu)).sum / scores.length
    }
    val rnd = new scala.util.Random(7)
    val randomDir = Array.fill(mean.length)(rnd.nextGaussian())
    assert(varAlong(m.components(0)) >= varAlong(randomDir),
      "top principal direction must capture at least a random direction's variance")
  }

  test("whitening gives unit variance per output component") {
    val m = Pca.fit(emb, "embedding", k = 4)
    val rows = Pca.project(emb, "embedding", m, whiten = true)
      .select(col("pca")).collect().map(_.getSeq[Double](0).toArray)
    for (j <- 0 until 4) {
      val xs = rows.map(_(j))
      val mu = xs.sum / xs.length
      // colStats/computeCovariance use the n-1 (sample) normalization
      val v = xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
      assert(math.abs(v - 1.0) < 1e-6, s"component $j variance $v")
    }
  }

  test("pcaTopK reranks to high recall against the exact scan at 4x compression") {
    val probe = emb.filter(col("vec_id") === 1).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    val corpus = emb.filter(col("vec_id") =!= 1)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", probe, 10)
      .as[(Long, Double)].collect()
    val m = Pca.fit(corpus, "embedding", k = 16) // 16 of 64 dims
    val approx = Similarity.pcaTopK(corpus, "vec_id", "embedding", probe, 10,
      m, poolK = 100).as[(Long, Double)].collect()
    assert(approx.length == 10)
    assert(approx.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
    val recall = (exact.map(_._1).toSet intersect approx.map(_._1).toSet).size / 10.0
    // the fixture embeddings are near-isotropic — PCA's WORST case, the
    // truncated tail carries real mass — so this demands a 10× pool for
    // 0.9; real embedding spectra concentrate and do far better
    assert(recall >= 0.9, s"recall=$recall with k'=16, poolK=100")
  }

  test("projection plan is narrow — no exchange added") {
    val m = Pca.fit(emb, "embedding", k = 4)
    val plan = Pca.project(emb, "embedding", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }
}
