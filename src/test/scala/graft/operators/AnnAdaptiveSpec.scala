package graft.operators

import graft.flow.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gate for the r17 measured-structure ANN parameter rules: the stats
  * (IVF cluster R², PCA explained-variance ratio) must separate
  * clustered from isotropic geometry, the auto rules must keep pruning
  * on clustered corpora while honestly widening on structureless ones,
  * and — the r16 verdict's done-criterion — auto-parameter recall@10
  * must reach ≥ 0.9 on the ISOTROPIC worst case, where the r16 fixed
  * params measured 0.77 (ivf_flat), 0.84 (ivf_pq) and 0.57 (pca16). */
class AnnAdaptiveSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val n = 400
  private val dim = 32
  private val k = 10

  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def unit(seed: Long): Array[Double] = {
    val v = Array.tabulate(dim)(j => mix(seed * 8191L + j).toDouble / Long.MaxValue)
    val nn = math.sqrt(v.map(x => x * x).sum).max(1e-12)
    v.map(_ / nn)
  }

  private lazy val isotropic: DataFrame =
    (0 until n).map(i => (i.toLong, unit(0x15031701L + i).map(_.toFloat)))
      .toDF("vec_id", "embedding").persist()

  private lazy val clustered: DataFrame = {
    val centers = Array.tabulate(8)(c => unit(0xc0ffee00L + c))
    (0 until n).map { i =>
      val c = centers(i % 8)
      val noise = unit(0xabcdef00L + i)
      (i.toLong, c.indices.map(j => (c(j) + 0.2 * noise(j)).toFloat).toArray)
    }.toDF("vec_id", "embedding").persist()
  }

  private def probes(corpus: DataFrame): Seq[(Long, Array[Float])] =
    corpus.orderBy("vec_id").limit(8)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  private def topIds(df: DataFrame, self: Long): Set[Long] =
    df.select(col(df.columns.head).cast("long")).collect()
      .map(_.getLong(0)).filter(_ != self).take(k).toSet

  private def recall(
      corpus: DataFrame, run: (Long, Array[Float]) => DataFrame): Double = {
    val ps = probes(corpus)
    val rs = ps.map { case (id, p) =>
      val exact = topIds(
        Similarity.bruteForceTopK(corpus, "vec_id", "embedding", p, k + 1), id)
      val got = topIds(run(id, p), id)
      (exact intersect got).size.toDouble / exact.size
    }
    rs.sum / rs.size
  }

  test("cluster R² separates geometries and drives autoNprobe: pruning " +
    "kept on clustered corpora, honest widening on isotropic ones") {
    val ivfIso = IvfIndex.build(isotropic, "vec_id", "embedding", nlist = 8)
    val ivfClu = IvfIndex.build(clustered, "vec_id", "embedding", nlist = 8)
    assert(ivfClu.clusterR2 > ivfIso.clusterR2 + 0.1,
      s"clustered R²=${ivfClu.clusterR2} vs isotropic R²=${ivfIso.clusterR2}")
    assert(ivfIso.autoNprobe >= 7, s"isotropic autoNprobe=${ivfIso.autoNprobe}")
    assert(ivfClu.autoNprobe < 8, s"clustered autoNprobe=${ivfClu.autoNprobe}")
    ivfIso.assigned.unpersist(); ivfClu.assigned.unpersist()
  }

  test("explained-variance ratio separates geometries and drives " +
    "pcaAutoPoolK above the base only where the tail carries signal") {
    val pcaIso = Pca.fit(isotropic, "embedding", k = 8)
    val pcaClu = Pca.fit(clustered, "embedding", k = 8)
    assert(pcaClu.explainedVarianceRatio > pcaIso.explainedVarianceRatio + 0.1)
    assert(Similarity.pcaAutoPoolK(pcaIso, k) > 100)
    // on strong structure the rule keeps the base pool
    assert(Similarity.pcaAutoPoolK(pcaClu, k, basePoolK = 100) <=
      Similarity.pcaAutoPoolK(pcaIso, k, basePoolK = 100))
  }

  test("auto params reach recall@10 >= 0.9 on the isotropic worst case " +
    "for ivf_flat, ivf_pq and pca — the r16 fixed-param failure modes") {
    val ivf = IvfIndex.build(isotropic, "vec_id", "embedding", nlist = 8)
    val rIvf = recall(isotropic, (_, p) => ivf.topK(p, k + 1))
    assert(rIvf >= 0.9, s"ivf_flat auto recall=$rIvf")

    val pqBase = graft.GraftQuery.tempDir("graft_adapt_pq")
    val pq = IvfPqIndex.buildAndSave(
      isotropic, pqBase + "/idx", "vec_id", "embedding",
      nlist = 8, m = 8, ksub = 32)
    val rPq = recall(isotropic, (_, p) => pq.topK(isotropic, p, k + 1))
    assert(rPq >= 0.9, s"ivf_pq auto recall=$rPq")

    val pca = Pca.fit(isotropic, "embedding", k = 8)
    val rPca = recall(isotropic, (_, p) =>
      Similarity.pcaTopK(isotropic, "vec_id", "embedding", p, k + 1, pca))
    assert(rPca >= 0.9, s"pca auto recall=$rPca")

    ivf.assigned.unpersist(); pq.codes.unpersist()
    graft.GraftQuery.deleteRecursively(new java.io.File(pqBase))
  }

  test("clusterR2 round-trips through save/load on both index families; " +
    "a pre-stat sidecar (no cluster_r2 column) degrades to the " +
    "conservative exact scan") {
    val base = graft.GraftQuery.tempDir("graft_adapt_rt")
    val ivf = IvfIndex.build(clustered, "vec_id", "embedding", nlist = 8)
    ivf.save(base + "/ivf")
    val loaded = IvfIndex.load(spark, base + "/ivf")
    assert(math.abs(loaded.clusterR2 - ivf.clusterR2) < 1e-12)
    assert(loaded.autoNprobe == ivf.autoNprobe)

    val pq = IvfPqIndex.buildAndSave(
      clustered, base + "/pq", "vec_id", "embedding", nlist = 8, m = 8, ksub = 32)
    assert(!pq.clusterR2.isNaN)
    val pqLoaded = IvfPqIndex.load(spark, base + "/pq")
    assert(math.abs(pqLoaded.clusterR2 - pq.clusterR2) < 1e-12)

    // simulate a pre-r17 sidecar: rewrite it without the cluster_r2 column
    val oldMeta = spark.read.parquet(base + "/ivf/centroids").drop("cluster_r2")
    oldMeta.coalesce(1).write.mode("overwrite").parquet(base + "/ivf2/centroids")
    spark.read.parquet(base + "/ivf/data").write
      .partitionBy("list_id").parquet(base + "/ivf2/data")
    val legacy = IvfIndex.load(spark, base + "/ivf2")
    assert(legacy.clusterR2.isNaN)
    assert(legacy.autoNprobe == legacy.centroids.length) // exact scan

    ivf.assigned.unpersist(); pq.codes.unpersist()
    graft.GraftQuery.deleteRecursively(new java.io.File(base))
  }
}
