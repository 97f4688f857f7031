package graft.functions

import graft.GraftExtensions
import graft.flow.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CosineHofRewrite optimizer rule: hand-written
  * aggregate/zip_with cosine compositions get swapped for the fused
  * native kernel — declarative code, kernel speed. */
class CosineRewriteSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("optimizer rewrites the HOF cosine composition to the native kernel") {
    GraftExtensions.install(spark)
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probe = e.filter($"vec_id" === 0).select($"embedding".as("p"))
    val q = e.crossJoin(broadcast(probe))
      .select(Similarity.cosineHof($"embedding", $"p").as("c"))
    q.collect()
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_cosine"), optimized)
    assert(!optimized.contains("aggregate("), optimized) // lambdas gone
  }

  test("rewrite normalizes degenerate inputs to NULL (try_divide contract)") {
    GraftExtensions.install(spark)
    // through parquet: literal local relations are pre-evaluated by
    // ConvertToLocalRelation before extra optimizer rules run (and under
    // ANSI the un-rewritten zero-norm divide would throw there)
    val dir = java.nio.file.Files.createTempDirectory("graft_cos_rw").toString + "/v"
    Seq(
      (0L, Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),  // cos = 1
      (1L, Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 1.0f))),  // zero norm → NULL
      (2L, Some(Array(1.0f, 2.0f)), Some(Array(1.0f))),        // ragged → NULL
      (3L, None, Some(Array(1.0f, 0.0f)))                      // null vec → NULL
    ).toDF("id", "a", "b").write.parquet(dir)
    val df = spark.read.parquet(dir)
    val q = df.select($"id", Similarity.cosineHof($"a", $"b").as("c"))
    val rows = q.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
    assert(rows(0L).exists(v => math.abs(v - 1.0) < 1e-12))
    assert(rows(1L).isEmpty) // ANSI composition would THROW; engine contract: NULL
    assert(rows(2L).isEmpty)
    assert(rows(3L).isEmpty)
  }

  test("values agree with the un-rewritten composition on real embeddings") {
    GraftExtensions.install(spark)
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probe = e.filter($"vec_id" === 0).select($"embedding".as("p"))
    val both = e.crossJoin(broadcast(probe))
      .select(
        Similarity.cosineHof($"embedding", $"p").as("rewritten"),
        VectorFunctions.cosineF($"embedding", $"p").as("native"))
    // strict and non-strict agree wherever inputs are non-degenerate
    assert(both.filter($"rewritten" =!= $"native").count() == 0)
  }
}
