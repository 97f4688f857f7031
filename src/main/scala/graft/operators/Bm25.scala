package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a document table — the ranking function
  * behind retrieval-based corpus curation (find the training docs most
  * relevant to an eval prompt, rank candidate contexts for a RAG eval,
  * audit what a benchmark query would surface from the corpus).
  *
  * score(q, d) = Σ_{t ∈ q} IDF(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * with the Lucene-style always-positive IDF(t) = ln(1 + (N − df + ½)/(df + ½)).
  *
  * Shape at 100 TB: ONE tokenize pass feeds both the doc-length
  * aggregate and the postings; the postings are cut down to the query's
  * terms by a BROADCAST join before anything shuffles (the query set is
  * tiny by construction — it rides to every executor), so the tf shuffle
  * carries only matching (query, doc, term) rows, never the corpus.
  * Document frequencies and (N, avgdl) are map-side-combinable
  * aggregates of at most |query terms| + 1 rows. The final per-query
  * top-k runs on the bounded-heap [[TopK]] aggregate — map-side partials
  * of k rows each, no window sort over every matching document.
  *
  * Scoring pins floating-point-sensitive choices so an external replay
  * (the DuckDB oracle) agrees bit-for-bit after rounding: duplicate
  * terms within a query are collapsed (a term contributes once), ranking
  * compares the score ROUNDED to 6 decimals with doc id as the
  * deterministic tie-break, and the reported score rounds to 4.
  */
object Bm25 {

  /** Top `k` docs per query by BM25.
    *
    * @param queries (query_id, query_text) pairs; tokenized on spaces
    *   like the documents, duplicates within a query collapsed
    * @return (query_id, doc_id, bm25) — k rows per query (fewer when
    *   fewer docs match), ordered (query_id, doc_id)
    */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(String, String)],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = broadcast(queries.flatMap { case (qid, qtext) =>
      qtext.split(" ").filter(_.nonEmpty).distinct.map(t => (qid, t))
    }.toDF("query_id", "term"))

    val toks = docs.select(
      col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = toks.join(qterms, Seq("term"))
      .groupBy("query_id", "doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = toks
      .join(qterms.select("term").distinct(), Seq("term"), "left_semi")
      .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))

    val scored = tf
      .join(broadcast(dfreq), Seq("term")) // ≤ |distinct query terms| rows
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats)) // 1 row — the designed plan
      .withColumn("graft_t",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id").agg(sum(col("graft_t")).as("score"))

    // bounded-heap top-k: ordering struct is (rounded score, -doc_id) all
    // descending = score desc, doc_id asc; doc_id is unique per query so
    // the trailing raw score never participates in comparison
    val ranked = TopK.perKey(
      scored
        .withColumn("graft_r", round(col("score"), 6))
        .withColumn("graft_nid", -col("doc_id")),
      keys = Seq("query_id"),
      ordering = Seq("graft_r", "graft_nid", "score"),
      k = k)
    ranked.select(
      col("query_id"),
      (-col("graft_nid")).as("doc_id"),
      round(col("score"), 4).as("bm25"))
      .orderBy("query_id", "doc_id")
  }
}
