package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier over HASHED bag-of-words
  * features — the fasttext-style linear filter of the CCNet/LLaMA
  * curation recipe ("train a classifier to tell wiki-like text from raw
  * crawl, keep what scores high"), distilled to what a 100 TB engine
  * actually needs:
  *
  *  - FEATURIZATION that never builds a vocabulary: token → md5-prefix
  *    bucket in [0, dim). No dictionary to broadcast, no OOV path, and
  *    the SAME function is expressible in plain SQL on any engine (the
  *    oracle replays it), unlike a JVM-only murmur seed.
  *  - SCORING as a narrow codegen projection: per-token weight lookup in
  *    a LITERAL weight array + ordered fold + sigmoid. No join, no
  *    shuffle, no UDF — the corpus-sized pass is embarrassingly parallel
  *    and whole-stage-codegen'd, exactly like the engine's other text
  *    kernels.
  *  - TRAINING driver-local on a bounded labeled sample (the LocalKMeans
  *    contract): quality labels are thousands of rows, not corpus-scale,
  *    and a deterministic full-batch gradient descent on a sorted sample
  *    gives the same weights whatever the upstream partitioning. The
  *    expensive direction (applying the model) is the distributed one.
  *
  * Logistic regression, count features, L2; full-batch gradients summed
  * in sorted-sample order so floating-point association is fixed.
  */
object QualityClassifier {

  /** A trained (or hand-specified) model: `weights(b)` is the weight of
    * hash bucket `b`; score = σ(bias + Σ_tokens weights(bucket(t))). */
  final case class Model(dim: Int, bias: Double, weights: Array[Double]) {
    require(weights.length == dim, s"weights length ${weights.length} != dim $dim")
  }

  /** Hash bucket of a token in [0, dim): first 4 hex digits of md5 mod
    * dim — stable across engines, runs, and partitionings. */
  def bucket(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 4), 16, 10).cast("int") % dim

  /** Tokens of `text` exactly as both the JVM trainer and the SQL oracle
    * see them: lowercase, trim, whitespace split. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Quality score in (0, 1) of `text` under `model` — a narrow
    * fully-codegen column expression (literal weight array, higher-order
    * transform + ordered aggregate fold, sigmoid). */
  def score(text: Column, model: Model): Column = {
    val wLit = array(model.weights.map(lit).toIndexedSeq: _*)
    val s = aggregate(
      transform(tokens(text), t => element_at(wLit, bucket(t, model.dim) + 1)),
      lit(model.bias),
      (acc, x) => acc + x)
    lit(1.0) / (lit(1.0) + exp(-s))
  }

  /** JVM mirror of [[bucket]]: first 2 md5 bytes mod dim. */
  private[operators] def bucketOf(token: String, dim: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % dim
  }

  private[operators] def tokensOf(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+")

  /** Train on a labeled frame (`textCol`: string, `labelCol`: 1 = keep /
    * 0 = drop). The sample is BOUNDED (first `maxSample` rows by sorted
    * text — labels are curated sets, not corpora; more than that belongs
    * in a real ML pipeline) and collected to the driver; training is
    * deterministic full-batch gradient descent, so the same labeled data
    * yields the same model whatever the partitioning.
    */
  def train(
      labeled: DataFrame,
      textCol: String,
      labelCol: String,
      dim: Int = 1024,
      iters: Int = 200,
      lr: Double = 0.5,
      l2: Double = 1e-4,
      maxSample: Int = 100000): Model = {
    require(dim > 0 && iters > 0 && lr > 0, "bad hyperparameters")
    val rows = labeled
      .select(col(textCol).cast("string"), col(labelCol).cast("double"))
      .orderBy(col(textCol), col(labelCol))
      .limit(maxSample)
      .collect()
    require(rows.nonEmpty, "no labeled rows to train on")

    // sparse count features per doc, built once
    val docs: Array[(Map[Int, Double], Double)] = rows.map { r =>
      val counts = scala.collection.mutable.Map[Int, Double]()
      tokensOf(r.getString(0)).foreach { t =>
        val b = bucketOf(t, dim)
        counts(b) = counts.getOrElse(b, 0.0) + 1.0
      }
      (counts.toMap, r.getDouble(1))
    }

    val w = new Array[Double](dim)
    var b = 0.0
    val n = docs.length.toDouble
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](dim)
      var gb = 0.0
      docs.foreach { case (x, y) =>
        var s = b
        x.foreach { case (i, c) => s += w(i) * c }
        val err = 1.0 / (1.0 + math.exp(-s)) - y
        x.foreach { case (i, c) => gw(i) += err * c }
        gb += err
      }
      var i = 0
      while (i < dim) {
        w(i) -= lr * (gw(i) / n + l2 * w(i))
        i += 1
      }
      b -= lr * gb / n
      it += 1
    }
    Model(dim, b, w)
  }
}
