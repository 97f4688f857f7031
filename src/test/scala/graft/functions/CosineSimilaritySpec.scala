package graft.functions

import graft.GraftExtensions
import graft.flow.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 2.0f, 3.0f), Array(-1.0f, -2.0f, -3.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("native expression matches known values and handles zero vectors") {
    val out = vecs.select($"id", VectorFunctions.cosineF($"a", $"b").as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(0L) - 1.0) < 1e-12)
    assert(out(1L) == 0.0)
    assert(math.abs(out(2L) + 1.0) < 1e-12)
    assert(out(3L) == 0.0) // zero-norm → 0.0, not NaN
  }

  test("bit-identical to the higher-order-function formulation on fixtures") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probe = e.filter($"vec_id" === 0).select($"embedding".as("p"))
    val both = e.crossJoin(broadcast(probe))
      .select(
        VectorFunctions.cosineF($"embedding", $"p").as("native"),
        Similarity.cosineHof($"embedding", $"p").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("ragged arrays (length mismatch) yield null, not a truncated score") {
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val out = df.select(VectorFunctions.cosineF($"a", $"b").as("c")).collect()
    assert(out.head.isNullAt(0))
  }

  test("null input yields null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val out = df.select(VectorFunctions.cosineF($"a", $"b").as("c")).collect()
    assert(out.head.isNullAt(0))
  }

  test("SQL registration via GraftExtensions.install") {
    GraftExtensions.install(spark)
    vecs.createOrReplaceTempView("graft_vecs_test")
    val r = spark.sql(
      "SELECT id, graft_cosine(a, b) AS c FROM graft_vecs_test WHERE id = 0")
      .as[(Long, Double)].head()
    assert(math.abs(r._2 - 1.0) < 1e-12)
  }

  test("expression survives whole-stage codegen (no fallback exception)") {
    // force codegen path: run on a larger frame and check the plan contains
    // WholeStageCodegen with our expression inside a Project
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probe = e.filter($"vec_id" === 0).select($"embedding".as("p"))
    val q = e.crossJoin(broadcast(probe))
      .select(VectorFunctions.cosineF($"embedding", $"p").as("c"))
    assert(q.agg(max($"c")).as[Double].head() <= 1.0 + 1e-9)
    q.collect() // materialize so AQE finalizes the physical plan
    val plan = q.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages; the Project holding
    // graft_cosine must carry one (no codegen fallback).
    assert(plan.linesIterator.exists(l => l.contains("graft_cosine") && l.contains("*(")), plan)
  }
}
