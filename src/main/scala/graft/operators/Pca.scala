package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the third memory-reduction path next to
  * int8 quantization (4×, Similarity.quantizedTopK) and product
  * quantization (32×, IvfPqIndex): project d-dim embeddings onto the top-k
  * principal directions before indexing, clustering, or near-dup work.
  * Optional whitening (unit variance per component) is the standard
  * pre-conditioning for cosine-based semantic dedup.
  *
  * Scale shape, in three bounded pieces:
  *  - STATISTICS are distributed: the d×d covariance comes from Spark's
  *    own `RowMatrix.computeCovariance()` (tree-aggregated Gramian — one
  *    pass, map-side combined; never a d²-per-row explode). d×d doubles
  *    is bounded metadata (64-dim → 32 KiB), the same contract as the
  *    IVF centroid tables.
  *  - The EIGENDECOMPOSITION is driver-local over that d×d matrix
  *    (breeze `eigSym`, O(d³) on ~nothing) — the LocalKMeans/codebook
  *    pattern: tiny deterministic math stays on the driver.
  *  - The PROJECTION is a narrow, whole-stage-codegen'd expression over
  *    LITERAL component vectors: center, then k dot products per row. No
  *    join, no shuffle, no UDF; cost is one pass over the vectors.
  *
  * Determinism: covariance is an exact algebraic aggregate (order-robust
  * well past this fixture's scale), and the eigenvector SIGN — arbitrary
  * in any eigensolver — is pinned by convention (largest-|entry|
  * component positive, ties to the earlier index), so the same data
  * yields the same model across partitionings and reruns.
  */
object Pca {

  /** Fitted model: `mean` (d), `components` (k rows of d — descending
    * eigenvalue order), `variances` (the k eigenvalues), `totalVariance`
    * (trace of the full covariance = sum of ALL d eigenvalues). */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      variances: Array[Double],
      totalVariance: Double) {
    def d: Int = mean.length
    def k: Int = components.length

    /** Fraction of the corpus' variance the retained components explain
      * — the measurable structure stat [[Similarity.pcaAutoPoolK]]
      * adapts to. On a corpus whose variance concentrates in the
      * principal subspace (real embedding geometry) this is high and
      * the coarse PCA ranking is trustworthy; on an isotropic corpus it
      * approaches k/d and the pool must grow to compensate. */
    def explainedVarianceRatio: Double =
      if (totalVariance <= 0) 1.0
      else math.min(1.0, variances.sum / totalVariance)
  }

  /** Fit the top-`k` principal components of `vecCol`. */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val vecs = df.select(col(vecCol).cast("array<double>"))
      .rdd.map(r => org.apache.spark.mllib.linalg.Vectors.dense(
        r.getSeq[Double](0).toArray))
    val mat = new org.apache.spark.mllib.linalg.distributed.RowMatrix(vecs)
    val d = mat.numCols().toInt
    require(k >= 1 && k <= d, s"k=$k must be in [1, $d]")
    val cov = mat.computeCovariance() // exact, tree-aggregated, centered
    // mean from the same summary machinery (one more cheap pass)
    val mean = org.apache.spark.mllib.stat.Statistics
      .colStats(vecs).mean.toArray

    val bm = breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) => cov(i, j))
    val eig = breeze.linalg.eigSym(bm)
    // eigSym returns ascending eigenvalues; take the top k descending
    val order = (0 until d).sortBy(i => -eig.eigenvalues(i)).take(k)
    val comps = order.map { i =>
      val v = Array.tabulate(d)(r => eig.eigenvectors(r, i))
      // sign convention: the largest-|entry| component is positive
      val pivot = v.indices.maxBy(j => (math.abs(v(j)), -j))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    val trace = (0 until d).map(i => cov(i, i)).sum
    PcaModel(mean, comps, order.map(eig.eigenvalues(_)).toArray, trace)
  }

  /** The projection as a pure column: center on the literal mean, then
    * one dot product per retained component — `array<double>` of k.
    * `whiten` divides component j by sqrt(eigenvalue_j), giving unit
    * variance per output dimension. */
  def projectExpr(vec: Column, model: PcaModel, whiten: Boolean = false): Column = {
    val centered = zip_with(
      vec.cast("array<double>"), typedLit(model.mean.toSeq), (x, m) => x - m)
    array(model.components.zipWithIndex.map { case (comp, j) =>
      val dot = aggregate(
        zip_with(centered, typedLit(comp.toSeq), (x, w) => x * w),
        lit(0.0), _ + _)
      if (whiten) dot / math.sqrt(model.variances(j).max(1e-12)) else dot
    }.toIndexedSeq: _*)
  }

  /** Project `vecCol` onto the model, adding `outCol`. Narrow — the plan
    * gains no exchange. */
  def project(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      outCol: String = "pca",
      whiten: Boolean = false): DataFrame =
    df.withColumn(outCol, projectExpr(col(vecCol), model, whiten))
}
