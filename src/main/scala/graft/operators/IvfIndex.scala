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

  /** Top-k by exact cosine among the `nprobe` nearest centroid lists. */
  def topK(probe: Array[Float], k: Int, nprobe: Int = 4): DataFrame = {
    val probeD = probe.map(_.toDouble)
    def cos(c: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(c.length, probeD.length)) {
        dot += c(i) * probeD(i); na += c(i) * c(i); nb += probeD(i) * probeD(i); i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0) 0 else dot / d
    }
    val lists = centroids.sortBy { case (_, c) => -cos(c) }.take(nprobe).map(_._1)
    assigned
      .filter(col("list_id").isin(lists.toSeq: _*)) // partition-prunable
      .select(
        col(idCol),
        round(Similarity.cosine(col(vecCol), array(probe.map(lit(_)): _*)), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
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

    // Normalize before clustering: k-means assigns by Euclidean distance,
    // and on unit vectors that is monotone in cosine (|u-v|² = 2-2cosθ) —
    // so list assignment agrees with topK's cosine ranking of centroid
    // lists. Unnormalized vectors would let a high-cosine/large-norm
    // vector land in a list topK never probes. Rerank still uses the
    // original vectors.
    val unitVec = {
      val v = col(vecCol)
      val norm = sqrt(aggregate(
        v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
      transform(v, x => (x.cast("double") / when(norm === 0, 1.0).otherwise(norm)).cast("float"))
    }
    val withVec = df.withColumn("graft_mlvec", array_to_vector(unitVec))
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
}
