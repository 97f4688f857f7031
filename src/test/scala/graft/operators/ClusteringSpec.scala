package graft.operators

import graft.flow.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sf)

  private def collectVecs(): Array[(Long, Array[Double])] =
    emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  test("assign picks the truly nearest rounded centroid with lower-id ties") {
    val cents = Clustering.labelCentroids(emb, "label", "embedding")
    val got = Clustering.assign(emb, "embedding", cents)
      .select(col("vec_id"), col("cluster"))
      .as[(Long, Int)].collect().toMap
    val vecs = collectVecs()
    def d2(v: Array[Double], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    vecs.foreach { case (id, v) =>
      val want = cents.map { case (cid, c) => (d2(v, c), cid) }.minBy(identity)._2
      assert(got(id) == want, s"vec $id assigned ${got(id)}, nearest is $want")
    }
  }

  test("kmeansFit is deterministic across upstream partitionings") {
    val a = Clustering.kmeansFit(emb, "vec_id", "embedding", k = 8)
    val b = Clustering.kmeansFit(emb.repartition(7), "vec_id", "embedding", k = 8)
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, ca), (_, cb)) =>
      assert(ca.toSeq == cb.toSeq, "centroids differ across partitionings")
    }
  }

  test("kmeans inertia beats the first-k-vectors strawman centroids") {
    def inertia(cents: Seq[(Int, Array[Double])]): Double =
      Clustering.assign(emb, "embedding", cents)
        .agg(sum("d2")).as[Double].head()
    val fitted = Clustering.kmeansFit(emb, "vec_id", "embedding", k = 8)
    val strawman = collectVecs().sortBy(_._1).take(8).zipWithIndex
      .map { case ((_, v), j) => (j, v) }.toSeq
    assert(inertia(fitted) < inertia(strawman),
      "k-means should beat arbitrary seed vectors as centroids")
  }

  test("semanticDedup with k=1 equals exact brute-force dedup") {
    val sem = Clustering.semanticDedup(emb, "vec_id", "embedding",
      k = 1, threshold = 0.3)
      .select("vec_id").as[Long].collect().toSet
    // brute force: drop any id with a lower-id neighbor at cosine >= t
    val vecs = collectVecs()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val dropped = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && cos(va, vb) >= 0.3
    } yield ib).toSet
    val want = vecs.map(_._1).toSet -- dropped
    assert(sem == want)
  }

  test("kmeansFit row cap is deterministic across partitionings and bounds the driver copy") {
    val a = Clustering.kmeansFit(emb, "vec_id", "embedding", k = 4, maxFitRows = 100)
    val b = Clustering.kmeansFit(emb.repartition(5), "vec_id", "embedding", k = 4, maxFitRows = 100)
    a.zip(b).foreach { case ((_, ca), (_, cb)) =>
      assert(ca.toSeq == cb.toSeq, "capped fit differs across partitionings")
    }
    // capped fit really fits on the id-prefix: identical to fitting the
    // prefix explicitly
    val ids = emb.select("vec_id").as[Long].collect().sorted.take(100)
    val c = Clustering.kmeansFit(
      emb.filter(col("vec_id") <= ids.last), "vec_id", "embedding", k = 4)
    a.zip(c).foreach { case ((_, ca), (_, cc)) =>
      assert(ca.toSeq == cc.toSeq, "capped fit != explicit id-prefix fit")
    }
  }

  test("hot cluster: witness side stays bounded, dedup completes, plan broadcasts") {
    // one dominant direction -> one hot cluster under k=1; plus an
    // orthogonal duplicate pair junior to the witness cap
    val n = 400
    val hot = (0 until n).map { i =>
      (i.toLong, Array.tabulate(8)(d => (if (d == 0) 1.0 else 0.001 * ((i + d) % 7)).toFloat))
    }
    val juniors = Seq(
      (1000L, Array.tabulate(8)(d => if (d == 7) 1.0f else 0.0f)),
      (1001L, Array.tabulate(8)(d => if (d == 7) 1.0f else 0.0f)))
    val df = (hot ++ juniors).toDF("vec_id", "embedding")

    val maxW = 50
    val cents = Clustering.kmeansFit(df, "vec_id", "embedding", k = 1)
    val assigned = Clustering.assign(df, "embedding", cents)
      .select(col("cluster"), col("vec_id"), col("embedding"))
    // the cap holds: <= k * maxWitnesses rows, never the hot cluster size
    val w = Clustering.witnessSide(assigned, "vec_id", maxW)
    assert(w.count() == maxW, s"witness side must cap at $maxW rows")

    val survivors = Clustering.semanticDedup(
      df, "vec_id", "embedding", k = 1, threshold = 0.5, maxWitnesses = maxW)
      .select("vec_id").as[Long].collect().toSet
    // every hot row except the most senior has witness 0 within threshold
    assert(survivors.intersect(hot.map(_._1).toSet) == Set(0L),
      "hot cluster must collapse to its most-senior row")
    // the junior duplicate pair is beyond the witness cap: BOTH survive —
    // the documented, loud degradation on overflow (coverage, not wrong drops)
    assert(survivors.contains(1000L) && survivors.contains(1001L),
      "junior-only duplicates survive when the witness cap truncates them")

    // parallelism contract: the pair stage is a broadcast join of the
    // bounded witness side, not a cluster-keyed shuffle self-join
    val plan = Clustering.semanticDedup(
      df, "vec_id", "embedding", k = 1, threshold = 0.5, maxWitnesses = maxW)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast witness join in plan:\n$plan")
  }

  test("N hot clusters: thresholds compute in one grouped pass (job count " +
    "independent of N) with per-cluster semantics unchanged") {
    val nClusters = 6; val perCluster = 30; val maxW = 10
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield (c, c * 1000L + i * 7L) // non-contiguous ids
    val assigned = rows.toDF("cluster", "vec_id")

    // reference: per cluster, the maxW smallest ids survive
    val want = rows.groupBy(_._1).toSeq.flatMap { case (c, g) =>
      g.map(_._2).sorted.take(maxW).map(i => (c, i))
    }.toSet

    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val got = Clustering.witnessSide(assigned, "vec_id", maxW)
        .select("cluster", "vec_id").as[(Int, Long)].collect().toSet
      // listener delivery is async: wait until the count stops moving
      var last = -1
      while (jobs != last) { last = jobs; Thread.sleep(300) }
      assert(got == want, "one-pass thresholds must equal per-cluster take")
      // sizes collect + threshold broadcast + final collect — a small
      // constant, NOT O(nClusters) (the old loop ran one job per cluster)
      assert(jobs < nClusters,
        s"$jobs jobs for $nClusters hot clusters — thresholds not batched")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("semanticDedup leaves no same-cluster survivor pair within threshold") {
    val k = 8; val t = 0.3
    val cents = Clustering.kmeansFit(emb, "vec_id", "embedding", k)
    val survivors = Clustering.semanticDedup(emb, "vec_id", "embedding", k, t)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors.nonEmpty && survivors.size < emb.count())
    val byCluster = Clustering.assign(emb, "embedding", cents)
      .select(col("vec_id"), col("cluster"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .filter(x => survivors(x._1))
      .groupBy(_._2)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    byCluster.values.foreach { rows =>
      for { a <- rows; b <- rows if a._1 < b._1 }
        assert(cos(a._3, b._3) < t,
          s"survivors ${a._1},${b._1} share cluster ${a._2} above threshold")
    }
  }
}
