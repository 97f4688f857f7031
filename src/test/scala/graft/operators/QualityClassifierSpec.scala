package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Hashed-feature logistic quality classifier: training separates a
  * synthetic good/bad vocabulary, is deterministic across partitionings,
  * and the distributed scoring column agrees with the driver-side math. */
class QualityClassifierSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val goodWords = Vector("informative", "article", "research",
    "thorough", "analysis", "evidence")
  private val badWords = Vector("spam", "click", "buy", "winner",
    "free", "casino")

  // deterministic synthetic corpus: doc i mixes mostly-good or mostly-bad
  // vocabulary with a little of the other side (not linearly trivial)
  private def corpus: Seq[(String, Double)] =
    (0 until 60).map { i =>
      val (main, other) = if (i % 2 == 0) (goodWords, badWords) else (badWords, goodWords)
      val words = (0 until 12).map(j => main((i + j) % main.size)) ++
        Seq(other(i % other.size))
      (words.mkString(" "), if (i % 2 == 0) 1.0 else 0.0)
    }

  test("training separates good from bad vocabulary (accuracy >= 0.95)") {
    val df = corpus.toDF("text", "label")
    val model = QualityClassifier.train(df, "text", "label", dim = 256, iters = 300)
    val scored = df.withColumn("score",
      QualityClassifier.score(org.apache.spark.sql.functions.col("text"), model))
    val acc = scored.filter(
      (org.apache.spark.sql.functions.col("score") > 0.5) ===
        (org.apache.spark.sql.functions.col("label") === 1.0)).count().toDouble /
      scored.count()
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("training is deterministic across input partitionings") {
    val df = corpus.toDF("text", "label")
    val m1 = QualityClassifier.train(df.repartition(7), "text", "label", dim = 128, iters = 50)
    val m2 = QualityClassifier.train(df.coalesce(1), "text", "label", dim = 128, iters = 50)
    assert(m1.bias == m2.bias)
    assert(m1.weights.sameElements(m2.weights))
  }

  test("the scoring column agrees with the driver-side model math") {
    val model = QualityClassifier.Model(
      dim = 64,
      bias = -0.5,
      weights = Array.tabulate(64)(b => ((b * 37) % 21 - 10) / 10.0))
    val texts = Seq("Research article with evidence", "BUY free spam now", " ")
    val got = texts.toDF("text")
      .select(QualityClassifier.score(
        org.apache.spark.sql.functions.col("text"), model))
      .as[Double].collect()
    val want = texts.map { t =>
      val s = QualityClassifier.tokensOf(t).foldLeft(model.bias) { (acc, tok) =>
        acc + model.weights(QualityClassifier.bucketOf(tok, model.dim))
      }
      1.0 / (1.0 + math.exp(-s))
    }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }
}
