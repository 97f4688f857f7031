package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a sparse (BM25) and a dense (embedding-cosine)
  * ranking with reciprocal-rank fusion (Cormack, Clarke & Buettcher,
  * SIGIR 2009): rrf(d) = Σ_lists 1 / (c + rank_list(d)), c = 60. RRF is
  * the standard first fusion a retrieval-based curation pipeline reaches
  * for because it needs NO score calibration — only ranks — so a BM25
  * log-scale score and a [-1, 1] cosine combine without tuning.
  *
  * Scale shape: each ranker already reduces the corpus to a poolK-row
  * list per query (BM25 through the broadcast-pruned postings plan,
  * cosine through TakeOrderedAndProject), so everything here runs on
  * query-count × poolK rows — the corpus is never touched again. Rank
  * windows partition by query_id over those bounded pools; the final
  * per-query cut rides the bounded-heap TopK aggregate.
  *
  * Determinism contract (what lets q_rrf hash-match a DuckDB replay):
  * ranks derive from the ROUNDED scores each ranker outputs (bm25 at 4,
  * cosine at 4) with doc_id as tie-break, and 1/(c+r) sums over ≤2 terms
  * — order-independent in IEEE double — before rounding to 6.
  */
object Retrieval {

  /** Fuse ranked lists, each with columns (query_id, doc_id, rank).
    * Returns top `k` per query as (query_id, doc_id, rrf), ordered
    * (query_id, doc_id). */
  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val contribs = lists.map(_.select(col("query_id"), col("doc_id"),
      (lit(1.0) / (col("rank").cast("double") + lit(c.toDouble))).as("graft_contrib")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(sum("graft_contrib").as("graft_rrf"))
    val ranked = TopK.perKey(
      fused
        .withColumn("graft_r", round(col("graft_rrf"), 6))
        .withColumn("graft_nid", -col("doc_id")),
      keys = Seq("query_id"),
      ordering = Seq("graft_r", "graft_nid"),
      k = k)
    ranked.select(
      col("query_id"),
      (-col("graft_nid")).as("doc_id"),
      col("graft_r").as("rrf"))
      .orderBy("query_id", "doc_id")
  }

  /** Hybrid BM25 + cosine top-k. `queries` supplies per-query text (for
    * the sparse ranker) and probe vector (for the dense ranker); doc ids
    * and vector ids share an id space. Each ranker contributes a
    * poolK-deep list; fusion is [[rrfFuse]]. */
  def hybridTopK(
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      embeddings: DataFrame,
      vecIdCol: String,
      vecCol: String,
      queries: Seq[(String, String, Array[Float])],
      k: Int,
      poolK: Int = 50,
      c: Int = 60): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(poolK >= k, s"poolK=$poolK must be >= k=$k")

    val sparseRank = Bm25.topK(docs, docIdCol, textCol,
      queries.map(q => (q._1, q._2)), poolK)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("bm25").desc, col("doc_id"))))
      .select("query_id", "doc_id", "rank")

    // Dense side: ONE corpus scan for ALL probes (the round-9 redesign —
    // the old per-query `orderBy.limit` branches each scanned the whole
    // corpus, so a 100-query eval paid 100 full scans). The probe matrix
    // is a literal array of (query_id, vector) structs — bounded driver
    // metadata, inlined into the plan like the clustering centroids — and
    // explode() replicates each corpus row once per probe INSIDE the same
    // whole-stage-codegen pass: scan → explode → cosine, all narrow. The
    // per-query poolK cut is the bounded-heap TopK aggregate, so the map
    // side already reduces every partition to poolK rows per query and
    // the shuffle carries ≤ |queries| × poolK × partitions rows, never
    // the scored corpus. Ordering (sim desc, doc_id asc via negated id)
    // is identical to the old TakeOrdered, so pools — and therefore the
    // fused hashes — are unchanged.
    val probesLit = array(queries.map { case (qid, _, probe) =>
      struct(lit(qid).as("qid"), array(probe.map(lit(_)): _*).as("p"))
    }: _*)
    val scored = embeddings
      .select(col(vecIdCol).as("doc_id"), col(vecCol).as("graft_v"))
      .select(col("doc_id"), col("graft_v"), explode(probesLit).as("graft_q"))
      .select(
        col("graft_q.qid").as("query_id"),
        col("doc_id"),
        round(Similarity.cosine(col("graft_v"), col("graft_q.p")), 4).as("graft_sim"))
    val densePools = TopK.perKey(
      scored.withColumn("graft_nid", -col("doc_id")),
      keys = Seq("query_id"),
      ordering = Seq("graft_sim", "graft_nid"),
      k = poolK)
    // ONE rank window after the pools: partitioned by the (real) query_id
    // column over poolK-bounded frames — parallel across queries, and
    // never a single-partition window.
    val denseRank = densePools
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("graft_sim").desc, (-col("graft_nid")).asc)))
      .select(col("query_id"), (-col("graft_nid")).as("doc_id"), col("rank"))

    rrfFuse(Seq(sparseRank, denseRank), k, c)
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998): greedily pick `k` results maximizing
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s) — relevance traded
    * against redundancy, the diversification step a retrieval-backed
    * data-selection pipeline runs so its top-k isn't k near-copies of
    * the same document.
    *
    * Scale shape: the corpus is touched ONCE — a narrow codegen'd
    * cosine scan cut to a `poolK` pool by TakeOrderedAndProject
    * (bounded per-partition heaps). The greedy loop is inherently
    * sequential (selection i depends on 1..i−1), so it runs
    * driver-side over the pool — bounded by `poolK` BY CONTRACT, the
    * same driver-memory envelope as a broadcast side, never
    * corpus-sized. The pool's pairwise cosines are computed
    * DISTRIBUTED (poolK² rows through the same fused cosine
    * expression) before the collect, so driver code does arithmetic
    * only and never re-implements the float kernel.
    *
    * Determinism contract (what lets q_mmr hash-match a DuckDB
    * replay): relevance and pairwise sims round to 4 before any
    * comparison (the established cross-engine cosine parity
    * precision), the greedy score λ·rel − (1−λ)·maxsim is computed on
    * those rounded inputs and rounded to 4, ties break on id
    * ascending, and the first pick is pure max relevance. */
  def mmrRerank(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probe: Array[Float],
      k: Int,
      lambda: Double = 0.7,
      poolK: Int = 20): DataFrame = {
    require(k >= 1 && poolK >= k, s"need 1 <= k=$k <= poolK=$poolK")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda=$lambda outside [0,1]")
    val spark = corpus.sparkSession
    val probeLit = array(probe.map(lit(_)): _*)
    val pool = corpus
      .select(
        col(idCol).as("graft_id"),
        col(vecCol).as("graft_v"),
        round(Similarity.cosine(col(vecCol), probeLit), 4).as("graft_rel"))
      .orderBy(col("graft_rel").desc, col("graft_id").asc)
      .limit(poolK)
      .persist()
    // Pairwise pool cosines, distributed, canonical (lo, hi) id order.
    val a = pool.select(col("graft_id").as("graft_ia"), col("graft_v").as("graft_va"))
    val b = pool.select(col("graft_id").as("graft_ib"), col("graft_v").as("graft_vb"))
    val simRows = a.crossJoin(b)
      .filter(col("graft_ia") < col("graft_ib"))
      .select(col("graft_ia").cast("long"), col("graft_ib").cast("long"),
        round(Similarity.cosine(col("graft_va"), col("graft_vb")), 4).as("graft_sim"))
      .collect()
    val sims = simRows.map { r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(2)
    }.toMap
    def simOf(x: Long, y: Long): Double =
      if (x < y) sims((x, y)) else sims((y, x))
    val cand = scala.collection.mutable.LinkedHashMap(
      pool.select(col("graft_id").cast("long"), col("graft_rel"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)): _*)
    // Round exactly as Spark's round(): decimal HALF_UP on the double.
    def r4(x: Double): Double =
      BigDecimal.valueOf(x)
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).doubleValue
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    (1 to math.min(k, cand.size)).foreach { _ =>
      val pick =
        if (selected.isEmpty)
          // max rel, tie id asc — explicit, not collect-order-dependent
          cand.reduceLeft { (x, y) =>
            if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x
          }
        else
          cand.map { case (id, rel) =>
            val maxSim = selected.map(s => simOf(id, s._1)).max
            (id, rel, r4(lambda * rel - (1 - lambda) * maxSim))
          }.reduceLeft { (x, y) =>
            if (y._3 > x._3 || (y._3 == x._3 && y._1 < x._1)) y else x
          } match { case (id, rel, _) => (id, rel) }
      selected += pick
      cand.remove(pick._1)
      ()
    }
    pool.unpersist()
    val out = selected.zipWithIndex.map { case ((id, rel), i) =>
      org.apache.spark.sql.Row(i + 1, id, rel)
    }
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(out.toSeq).asJava),
      new org.apache.spark.sql.types.StructType()
        .add("rank", org.apache.spark.sql.types.IntegerType)
        .add("vec_id", org.apache.spark.sql.types.LongType)
        .add("rel", org.apache.spark.sql.types.DoubleType))
  }
}
