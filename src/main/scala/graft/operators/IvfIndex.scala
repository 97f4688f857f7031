package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor index: coarse k-means
  * quantization assigns every vector to its nearest centroid; a query
  * probes only the `nprobe` nearest centroid lists and reranks exactly.
  *
  * The other scale path besides hyperplane LSH (Similarity.lshTopK):
  *  - build: KMeans fit on a driver-bounded SAMPLE (centroids are tiny —
  *    nlist × dim floats), then one narrow pass assigns list ids; persist
  *    or write the assigned table partitioned by list_id so probes prune.
  *  - query: read nprobe/nlist of the data (partition pruning when the
  *    index table is stored `partitionBy(list_id)`), exact cosine rerank.
  *
  * Recall/cost knobs: nlist (≈ sqrt(n) classically), nprobe.
  */
final class IvfIndex private (
    val assigned: DataFrame, // original columns + list_id
    val centroids: Array[(Int, Array[Double])],
    idCol: String,
    vecCol: String) extends Serializable {

  /** Top-k by exact cosine among the `nprobe` nearest centroid lists.
    * List selection ranks centroids by Euclidean distance to the
    * NORMALIZED probe — the same metric and space the k-means assignment
    * used — so "nearest lists" is exactly consistent with how vectors were
    * binned (a cosine ranking of non-unit centroids could disagree). */
  def topK(probe: Array[Float], k: Int, nprobe: Int = 4): DataFrame = {
    // Fail fast on dimensionality mismatch — a truncated-prefix distance
    // would silently rank the wrong centroid lists.
    require(centroids.isEmpty || probe.length == centroids.head._2.length,
      s"probe dimensionality ${probe.length} != index dimensionality " +
        s"${centroids.head._2.length}")
    val pn = {
      val n = math.sqrt(probe.map(x => x.toDouble * x).sum).max(1e-12)
      probe.map(_.toDouble / n)
    }
    def dist2(c: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < math.min(c.length, pn.length)) {
        val d = c(i) - pn(i); s += d * d; i += 1
      }
      s
    }
    val lists = centroids.sortBy { case (_, c) => dist2(c) }.take(nprobe).map(_._1)
    assigned
      .filter(col("list_id").isin(lists.toSeq: _*)) // partition-prunable
      .select(
        col(idCol),
        round(Similarity.cosine(col(vecCol), array(probe.map(lit(_)): _*)), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Persist the index: the assigned table lands hive-partitioned by
    * `list_id` (so a loaded index's probes PRUNE to nprobe/nlist of the
    * files on disk — the read-side payoff of IVF), centroids + column
    * names in a small sidecar table. Build once, query many. */
  def save(path: String): Unit = {
    val spark = assigned.sparkSession
    assigned.write.partitionBy("list_id").parquet(s"$path/data")
    import spark.implicits._
    centroids.toSeq.map { case (i, c) => (i, c, idCol, vecCol) }
      .toDF("list_id", "centroid", "id_col", "vec_col")
      .coalesce(1).write.parquet(s"$path/centroids")
  }
}

object IvfIndex {

  /** Build the index. `sampleFraction` bounds the KMeans fit input (the
    * fit itself is distributed, but at 100 TB you fit on a sample, not the
    * corpus). Assignment of ALL rows is one narrow pass. */
  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      sampleFraction: Double = 1.0,
      seed: Long = 42L): IvfIndex = {

    // Normalize before clustering so angular neighbors cluster together
    // (on unit vectors Euclidean distance is monotone in cosine:
    // |u-v|² = 2-2cosθ). topK then ranks centroid lists by Euclidean
    // distance to the normalized probe — the identical metric — so list
    // selection is exactly consistent with assignment. Rerank still uses
    // the original vectors. ml.Normalizer does the L2 scaling in one
    // vectorized pass (a Column-lambda formulation would re-fold the norm
    // aggregate per element after projection collapse — O(d²) per row).
    val withVec = new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("graft_rawvec")
      .setOutputCol("graft_mlvec")
      .setP(2.0)
      .transform(df.withColumn("graft_rawvec", array_to_vector(col(vecCol))))
      .drop("graft_rawvec")
    val fitInput =
      if (sampleFraction >= 1.0) withVec else withVec.sample(sampleFraction, seed)

    val model = new KMeans()
      .setK(nlist)
      .setSeed(seed)
      .setFeaturesCol("graft_mlvec")
      .setPredictionCol("list_id")
      .fit(fitInput)

    val assigned = model.transform(withVec).drop("graft_mlvec").persist()
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v: Vector, i) => (i, v.toArray) }
    new IvfIndex(assigned, centroids, idCol, vecCol)
  }

  /** Load an index written by [[IvfIndex.save]]. The assigned table is
    * read lazily from its `list_id=` partitions — topK's list filter
    * becomes a partition filter, touching nprobe/nlist of the store. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val meta = spark.read.parquet(s"$path/centroids").collect()
    require(meta.nonEmpty, s"no centroids at $path/centroids — not an IVF index?")
    val centroids = meta.map(r =>
      (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val (idCol, vecCol) = (meta.head.getString(2), meta.head.getString(3))
    new IvfIndex(spark.read.parquet(s"$path/data"), centroids, idCol, vecCol)
  }
}
