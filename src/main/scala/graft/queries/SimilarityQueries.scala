package graft.queries

import graft.GraftQuery
import graft.GraftQuery.nz
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
            // nz: cosine is signed; a tiny negative sim rounding to zero
            // must not hash as -0.0 (hazard class 4)
            nz(round(
              graft.functions.VectorFunctions.cosineF(col("embedding"), col("probe_vec")),
              4)).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
      },
      Some("""SELECT vec_id,
             |  ROUND(LIST_COSINE_SIMILARITY(CAST(embedding AS DOUBLE[]),
             |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)),
             |    4) + 0.0 AS sim
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

    // Nearest-centroid assignment — the clustering primitive behind
    // topic balancing and SemDeDup: centroids are the per-label
    // elementwise means (one map-side-combinable posexplode aggregate,
    // labels×dim rows collected as bounded metadata), the assignment is
    // a narrow codegen'd when-fold over literal centroids — no join, no
    // shuffle over the corpus. Output is the label×cluster confusion
    // matrix. The oracle replays centroid means (rounded 6), the SAME
    // left-to-right (v[j]-c[j])² fold (rounded 6), and the (d2, id)
    // argmin tie-break.
    GraftQuery(
      "q_cluster_assign",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cents = graft.operators.Clustering.labelCentroids(e, "label", "embedding")
        graft.operators.Clustering.assign(e, "embedding", cents)
          .groupBy(col("label"), col("cluster").as("cluster_id"))
          .agg(count(lit(1)).as("n"))
          .orderBy("label", "cluster_id")
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |px AS (SELECT label, v, unnest(generate_series(1, len(v))) AS i FROM e),
             |cent AS (SELECT label AS clabel, i, ROUND(AVG(v[i]), 6) AS m
             |         FROM px GROUP BY 1, 2),
             |cl AS (SELECT clabel, list(m ORDER BY i) AS cv FROM cent GROUP BY 1),
             |d AS (SELECT e.vec_id, e.label, c.clabel,
             |        ROUND(list_sum(list_transform(generate_series(1, len(e.v)),
             |          j -> (e.v[j] - c.cv[j]) * (e.v[j] - c.cv[j]))), 6) AS d2
             |      FROM e CROSS JOIN cl c),
             |a AS (SELECT vec_id, label, clabel,
             |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
             |      FROM d)
             |SELECT label, clabel AS cluster_id, COUNT(*) AS n
             |FROM a WHERE rn = 1 GROUP BY 1, 2 ORDER BY label, cluster_id""".stripMargin)),

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

    // k-NN JOIN: top-5 neighbors for EACH of 3 probe vectors in ONE
    // corpus scan — the batch-eval shape (N probes × corpus) that naive
    // per-probe orderBy.limit turns into N full scans. The probe matrix
    // inlines as a literal array of (qid, vec) structs, explode
    // replicates each corpus row per probe inside the same codegen
    // pass, and the per-query cut rides the bounded-heap TopK aggregate
    // (map-side reduction to k rows per query; the shuffle carries
    // pools, never the scored corpus).
    GraftQuery(
      "q_knn_join",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val probes = e.filter(col("vec_id") < 3)
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        val probesLit = array(probes.map { case (qid, v) =>
          struct(lit(qid).as("qid"), array(v.map(lit(_)): _*).as("p"))
        }: _*)
        val scored = e
          .select(col("vec_id"), col("embedding"), explode(probesLit).as("graft_q"))
          .filter(col("vec_id") =!= col("graft_q.qid"))
          .select(col("graft_q.qid").as("qid"), col("vec_id"),
            // nz: signed cosine, hazard class 4
            nz(round(graft.operators.Similarity.cosine(
              col("embedding"), col("graft_q.p")), 4)).as("sim"))
        graft.operators.TopK.perKey(
          scored.withColumn("graft_nid", -col("vec_id")),
          keys = Seq("qid"), ordering = Seq("sim", "graft_nid"), k = 5)
          .select(col("qid"), (-col("graft_nid")).as("vec_id"), col("sim"))
          .orderBy("qid", "vec_id")
      },
      Some("""WITH p AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS pv
             |           FROM embeddings WHERE vec_id < 3),
             |s AS (SELECT p.qid, e.vec_id,
             |        ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]),
             |                                     p.pv), 4) + 0.0 AS sim
             |      FROM embeddings e CROSS JOIN p WHERE e.vec_id <> p.qid),
             |r AS (SELECT qid, vec_id, sim,
             |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
             |      FROM s)
             |SELECT qid, vec_id, sim FROM r WHERE rk <= 5
             |ORDER BY qid, vec_id""".stripMargin)),

    // Hard-negative mining (Similarity.hardNegatives): per anchor, the 5
    // most-similar corpus vectors with a DIFFERENT label — the
    // contrastive-training near-misses. One corpus scan for all anchors
    // (q_knn_join's batch-eval shape) with the label-mismatch filter
    // inside the scan; the oracle replays scoring + rank in SQL.
    GraftQuery(
      "q_hard_negatives",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val anchors = e.filter(col("vec_id") < 3)
          .select(col("vec_id"), col("embedding"), col("label").cast("int"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
          .toSeq
        graft.operators.Similarity.hardNegatives(
            e, "vec_id", "embedding", "label", anchors, k = 5)
          .withColumn("sim", nz(col("sim"))) // hazard class 4
          .orderBy("anchor_id", "vec_id")
      },
      Some("""WITH a AS (SELECT vec_id AS aid, CAST(embedding AS DOUBLE[]) AS av,
             |                  CAST(label AS INT) AS albl
             |           FROM embeddings WHERE vec_id < 3),
             |s AS (SELECT a.aid AS anchor_id, e.vec_id,
             |        CAST(e.label AS INT) AS label,
             |        ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]),
             |                                     a.av), 4) + 0.0 AS sim
             |      FROM embeddings e CROSS JOIN a
             |      WHERE CAST(e.label AS INT) <> a.albl AND e.vec_id <> a.aid),
             |r AS (SELECT anchor_id, vec_id, label, sim,
             |        row_number() OVER (PARTITION BY anchor_id
             |          ORDER BY sim DESC, vec_id) AS rk
             |      FROM s)
             |SELECT anchor_id, vec_id, label, sim FROM r WHERE rk <= 5
             |ORDER BY anchor_id, vec_id""".stripMargin)),

    // Positive-pair mining — the other half of a contrastive batch: per
    // anchor, the 5 most-similar SAME-label vectors (self excluded).
    // Identical single-scan plan to q_hard_negatives.
    GraftQuery(
      "q_positive_pairs",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val anchors = e.filter(col("vec_id") < 3)
          .select(col("vec_id"), col("embedding"), col("label").cast("int"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
          .toSeq
        graft.operators.Similarity.positivePairs(
            e, "vec_id", "embedding", "label", anchors, k = 5)
          .withColumn("sim", nz(col("sim"))) // hazard class 4
          .orderBy("anchor_id", "vec_id")
      },
      Some("""WITH a AS (SELECT vec_id AS aid, CAST(embedding AS DOUBLE[]) AS av,
             |                  CAST(label AS INT) AS albl
             |           FROM embeddings WHERE vec_id < 3),
             |s AS (SELECT a.aid AS anchor_id, e.vec_id,
             |        CAST(e.label AS INT) AS label,
             |        ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]),
             |                                     a.av), 4) + 0.0 AS sim
             |      FROM embeddings e CROSS JOIN a
             |      WHERE CAST(e.label AS INT) = a.albl AND e.vec_id <> a.aid),
             |r AS (SELECT anchor_id, vec_id, label, sim,
             |        row_number() OVER (PARTITION BY anchor_id
             |          ORDER BY sim DESC, vec_id) AS rk
             |      FROM s)
             |SELECT anchor_id, vec_id, label, sim FROM r WHERE rk <= 5
             |ORDER BY anchor_id, vec_id""".stripMargin)),

    // Embedding-space separation report: per label, how tight is the
    // class (mean cosine to its OWN centroid) and how close is the
    // nearest confusion (mean of each row's BEST cosine to any OTHER
    // centroid)? margin = tightness − confusion; a collapsing embedding
    // shows margin → 0 before any downstream model notices. Centroids
    // are the quantized per-label element means (labelCentroids' round-6
    // contract — both engines fold from bit-identical centroid inputs),
    // inlined as literals so the scoring pass is one narrow projection.
    GraftQuery(
      "q_embed_margin",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cents = graft.operators.Clustering.labelCentroids(e, "label", "embedding")
        // cosineHof, not the native expression: the centroid literal is
        // array<double> (quantization lives in double) and the HOF form
        // upcasts mixed float/double element-wise — bit-identical math
        val sims = array(cents.map { case (l, c) =>
          struct(lit(l).as("l"),
            round(graft.operators.Similarity.cosineHof(
              col("embedding"), array(c.map(lit(_)): _*)), 4).as("s"))
        }: _*)
        e.select(col("label").cast("int").as("label"), sims.as("graft_sims"))
          .select(col("label"),
            expr("element_at(filter(graft_sims, x -> x.l = label), 1).s")
              .as("graft_own"),
            expr("array_max(transform(filter(graft_sims, x -> x.l != label), x -> x.s))")
              .as("graft_other"))
          .groupBy("label")
          .agg(
            sum(round(col("graft_own") * 10000).cast("long")).as("graft_so"),
            sum(round(col("graft_other") * 10000).cast("long")).as("graft_st"),
            count(lit(1)).as("n"))
          // Averages of ROUND-4 values land exactly on round-4 midpoints
          // (sums of 1e-4 multiples), so a plain avg+round flips with the
          // ENGINE'S OWN accumulation order (DuckDB's parallel aggregate
          // flipped margin run-to-run at sf0.01). Determinism by
          // construction (hazard class 1): scale to exact integer sums,
          // then one fixed double op sequence both engines share. nz for
          // the signed outputs (hazard class 4).
          .select(col("label"),
            nz(round(col("graft_so").cast("double") / col("n") / 10000, 4))
              .as("tightness"),
            nz(round(col("graft_st").cast("double") / col("n") / 10000, 4))
              .as("confusion"),
            nz(round((col("graft_so") - col("graft_st")).cast("double")
              / col("n") / 10000, 4)).as("margin"),
            col("n"))
          .orderBy("label")
      },
      Some("""WITH comp AS (
             |  SELECT CAST(label AS INT) AS l, i,
             |         ROUND(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
             |  FROM embeddings CROSS JOIN range(1, 65) t(i)
             |  GROUP BY 1, 2),
             |cent AS (SELECT l, list(m ORDER BY i) AS cv FROM comp GROUP BY l),
             |scored AS (
             |  SELECT e.vec_id, CAST(e.label AS INT) AS label, c.l,
             |         ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]),
             |                                      c.cv), 4) AS s
             |  FROM embeddings e CROSS JOIN cent c),
             |per_row AS (
             |  SELECT vec_id, label,
             |         MAX(CASE WHEN l = label THEN s END) AS own,
             |         MAX(CASE WHEN l <> label THEN s END) AS other
             |  FROM scored GROUP BY 1, 2),
             |sums AS (
             |  SELECT label,
             |         SUM(CAST(ROUND(own * 10000) AS BIGINT)) AS so,
             |         SUM(CAST(ROUND(other * 10000) AS BIGINT)) AS st,
             |         count(*) AS n
             |  FROM per_row GROUP BY 1)
             |SELECT label,
             |  ROUND(CAST(so AS DOUBLE) / n / 10000, 4) + 0.0 AS tightness,
             |  ROUND(CAST(st AS DOUBLE) / n / 10000, 4) + 0.0 AS confusion,
             |  ROUND(CAST(so - st AS DOUBLE) / n / 10000, 4) + 0.0 AS margin,
             |  n
             |FROM sums ORDER BY label""".stripMargin)),

    // MMR diversified rerank (Retrieval.mmrRerank): greedy top-5 from a
    // 20-deep relevance pool, λ=0.7 — pick i maximizes
    // λ·rel − (1−λ)·max-sim-to-selected. The greedy recurrence is
    // inherently sequential, so the ORACLE UNROLLS the five selections
    // as chained CTEs (the q_pagerank precedent for iterative
    // algorithms): s1 = pure max rel; each later sᵢ takes the argmax of
    // the rounded score over pool minus selections so far, ties on
    // vec_id. All sims round to 4 (the established cross-engine cosine
    // parity precision) before any comparison, and (1−λ) is spelled
    // CAST(1 AS DOUBLE) − 0.7 so both engines use the IDENTICAL
    // IEEE double (0.30000000000000004, not 0.3).
    GraftQuery(
      "q_mmr",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val probe = e.filter(col("vec_id") === 0)
          .select("embedding").collect().head.getSeq[Float](0).toArray
        graft.operators.Retrieval.mmrRerank(
          e.filter(col("vec_id") =!= 0), "vec_id", "embedding", probe,
          k = 5, lambda = 0.7, poolK = 20)
          .withColumn("rel", nz(col("rel"))) // hazard class 4
      },
      Some("""WITH pool AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             |         ROUND(LIST_COSINE_SIMILARITY(CAST(embedding AS DOUBLE[]),
             |           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
             |            WHERE vec_id = 0)), 4) AS rel
             |  FROM embeddings WHERE vec_id <> 0
             |  ORDER BY rel DESC, vec_id LIMIT 20),
             |s1 AS (SELECT vec_id, emb, rel FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
             |s2 AS (SELECT vec_id, emb, rel FROM (
             |    SELECT c.*, ROUND(CAST(0.7 AS DOUBLE)*c.rel -
             |        (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) *
             |        (SELECT MAX(ROUND(LIST_COSINE_SIMILARITY(c.emb, s.emb), 4))
             |         FROM s1 s), 4) AS score
             |    FROM pool c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)) t
             |  ORDER BY score DESC, vec_id LIMIT 1),
             |g2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
             |s3 AS (SELECT vec_id, emb, rel FROM (
             |    SELECT c.*, ROUND(CAST(0.7 AS DOUBLE)*c.rel -
             |        (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) *
             |        (SELECT MAX(ROUND(LIST_COSINE_SIMILARITY(c.emb, s.emb), 4))
             |         FROM g2 s), 4) AS score
             |    FROM pool c WHERE c.vec_id NOT IN (SELECT vec_id FROM g2)) t
             |  ORDER BY score DESC, vec_id LIMIT 1),
             |g3 AS (SELECT * FROM g2 UNION ALL SELECT * FROM s3),
             |s4 AS (SELECT vec_id, emb, rel FROM (
             |    SELECT c.*, ROUND(CAST(0.7 AS DOUBLE)*c.rel -
             |        (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) *
             |        (SELECT MAX(ROUND(LIST_COSINE_SIMILARITY(c.emb, s.emb), 4))
             |         FROM g3 s), 4) AS score
             |    FROM pool c WHERE c.vec_id NOT IN (SELECT vec_id FROM g3)) t
             |  ORDER BY score DESC, vec_id LIMIT 1),
             |g4 AS (SELECT * FROM g3 UNION ALL SELECT * FROM s4),
             |s5 AS (SELECT vec_id, emb, rel FROM (
             |    SELECT c.*, ROUND(CAST(0.7 AS DOUBLE)*c.rel -
             |        (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) *
             |        (SELECT MAX(ROUND(LIST_COSINE_SIMILARITY(c.emb, s.emb), 4))
             |         FROM g4 s), 4) AS score
             |    FROM pool c WHERE c.vec_id NOT IN (SELECT vec_id FROM g4)) t
             |  ORDER BY score DESC, vec_id LIMIT 1)
             |SELECT rank, vec_id, rel + 0.0 AS rel FROM (
             |  SELECT 1 AS rank, vec_id, rel FROM s1
             |  UNION ALL SELECT 2, vec_id, rel FROM s2
             |  UNION ALL SELECT 3, vec_id, rel FROM s3
             |  UNION ALL SELECT 4, vec_id, rel FROM s4
             |  UNION ALL SELECT 5, vec_id, rel FROM s5) u
             |ORDER BY rank""".stripMargin)),
  )
}
