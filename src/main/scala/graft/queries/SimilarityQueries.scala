package graft.queries

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** North-star similarity search over the `embeddings` table
  * (`array<float>[64]`). Baseline: brute-force cosine top-k against a probe
  * vector, computed with codegen'd higher-order functions (zip_with +
  * aggregate) in Double — no UDF, stays inside whole-stage codegen.
  *
  * Scale notes: the probe side is a 1-row broadcast; the scan side is
  * embarrassingly parallel; orderBy+limit compiles to TakeOrderedAndProject
  * (per-partition top-k heaps, driver merges k rows per partition — never a
  * full sort). The LSH-bucketed scale path lives in
  * graft.operators.Similarity (non-oracle, property-tested).
  */
object SimilarityQueries {

  /** dot(a, b) in Double over two float-array columns, left-to-right fold —
    * matches DuckDB's summation order for reproducibility. */
  private def dotD(a: String, b: String): org.apache.spark.sql.Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x AS double) * cast(y AS double)), " +
      "cast(0 AS double), (acc, v) -> acc + v)")

  val all: Seq[GraftQuery] = Seq(

    // Brute-force cosine top-10 vs probe vec_id=0.
    GraftQuery(
      "q_sim_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val probe = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("probe_vec"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(
            col("vec_id"),
            round(
              graft.functions.VectorFunctions.cosineF(col("embedding"), col("probe_vec")),
              4).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
      },
      Some("""SELECT vec_id,
             |  ROUND(LIST_COSINE_SIMILARITY(CAST(embedding AS DOUBLE[]),
             |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)),
             |    4) AS sim
             |FROM embeddings WHERE vec_id <> 0
             |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin)),

    // Int8 embedding quantization — the standard ANN memory lever: 4×
    // smaller vectors (float32 → int8) with per-vector max-abs scaling,
    // so a 100 TB embedding store's candidate scan reads a quarter of
    // the bytes and the full-precision vector is only fetched for the
    // final re-rank. Pure per-row map (codegen'd higher-order functions,
    // no UDF, no shuffle); dequantize as qvec * scale / 127. All
    // arithmetic in Double with identical IEEE op order to the oracle,
    // so round() crosses the same boundaries in both engines.
    // The driver's comparator sorts every output column with pandas, which
    // cannot sort raw arrays — so the int8 vector is digested into sortable
    // scalars (first element, middle element, exact 64-element sum) that
    // pin every element through the same op order while emitting only
    // scalar columns.
    GraftQuery(
      "q_embed_quantize",
      (s, d) => {
        val dbl = transform(col("embedding"), _.cast("double"))
        val mx = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
        Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            round(mx, 6).as("scale"),
            when(mx === 0d, transform(dbl, _ => lit(0)))
              .otherwise(transform(dbl, x => round(x / mx * 127).cast("int")))
              .as("qvec"))
          .select(
            col("vec_id"),
            col("scale"),
            element_at(col("qvec"), 1).as("q_first"),
            element_at(col("qvec"), 33).as("q_mid"),
            expr("aggregate(qvec, 0L, (a, x) -> a + x)").as("q_sum"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |m AS (SELECT vec_id, v,
             |        list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
             |q AS (SELECT vec_id, ROUND(mx, 6) AS scale,
             |        CASE WHEN mx = 0 THEN list_transform(v, x -> 0)
             |             ELSE list_transform(v, x -> CAST(ROUND(x / mx * 127) AS INT))
             |        END AS qvec
             |      FROM m)
             |SELECT vec_id, scale, qvec[1] AS q_first, qvec[33] AS q_mid,
             |       CAST(list_sum(qvec) AS BIGINT) AS q_sum
             |FROM q ORDER BY vec_id""".stripMargin)),

    // Per-label centroid norms: aggregate over vector columns (element-wise
    // mean via explode-free posexplode aggregation would shuffle per
    // element; for 64-dim this stays a single zip_with fold per row).
    GraftQuery(
      "q_sim_norms",
      (s, d) =>
        Tables.embeddings(s, d)
          .withColumn("norm", sqrt(dotD("embedding", "embedding")))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), round(avg(col("norm")), 4).as("avg_norm"))
          .orderBy("label"),
      Some("""SELECT label, COUNT(*) AS n,
             |  ROUND(AVG(SQRT(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]),
             |                                  CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
             |FROM embeddings GROUP BY 1 ORDER BY label""".stripMargin)),
  )
}
