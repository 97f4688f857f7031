package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index for BM25 — the build-once / query-many form
  * of [[Bm25]]. `Bm25.topK` re-tokenizes the corpus per call, which is
  * the right shape for one-off audits; a retrieval service (rank corpus
  * docs for every eval prompt in a sweep, RAG context selection) pays
  * that corpus pass once at build and then touches only the postings of
  * the QUERY'S terms per call.
  *
  * Layout:
  * {{{
  * idx/postings/tb=<murmur3(term) % buckets>/   (term, doc_id, tf)
  * idx/doclen/                                   (doc_id, dl)
  * idx/stats/                                    (n, avgdl) — 1 row
  * }}}
  *
  * The postings table is hive-partitioned by a hash bucket of the term,
  * so a query reads `|query terms|` buckets of `1/buckets` of the index
  * each — partition pruning does the term lookup, the classic inverted-
  * index seek re-expressed as parquet layout (asserted in Bm25IndexSpec
  * via PartitionFilters). Document frequency is NOT a sidecar: after
  * pruning, df(term) = row count of that term's postings — one aggregate
  * over already-fetched rows.
  *
  * Scoring reproduces [[Bm25.topK]] EXACTLY (same Lucene IDF, same
  * rounded-score ranking, same tie-break), so the gated q_bm25 oracle
  * also gates the index path — q_bm25_index shares its SQL verbatim.
  */
final class Bm25Index private (
    val path: String,
    postings: DataFrame, // term, doc_id, tf, tb
    doclen: DataFrame,   // doc_id, dl
    n: Long,
    avgdl: Double,
    buckets: Int) {

  /** Top `k` docs per query — same contract and output as
    * [[Bm25.topK]]. */
  def topK(
      queries: Seq[(String, String)],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val spark = postings.sparkSession
    import spark.implicits._
    val qpairs = queries.flatMap { case (qid, qtext) =>
      qtext.split(" ").filter(_.nonEmpty).distinct.map(t => (qid, t))
    }
    val qterms = broadcast(qpairs.toDF("query_id", "term"))
    // the term lookup IS partition pruning: only the query terms' hash
    // buckets are read
    val tbs = Bm25Index.termBuckets(spark, qpairs.map(_._2).distinct, buckets)
    val hit = postings
      .filter(col("tb").isin(tbs: _*))
      .join(qterms, Seq("term"))
    val dfreq = hit.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    val scored = hit
      .join(broadcast(dfreq), Seq("term"))
      .join(doclen, Seq("doc_id"))
      .withColumn("graft_t",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
      .groupBy("query_id", "doc_id").agg(sum(col("graft_t")).as("score"))
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

object Bm25Index {

  /** Murmur3 term buckets, computed THROUGH the engine (one local job
    * over the handful of query terms) so build and query agree with the
    * `hash()` the partition values were derived from. */
  private[operators] def termBuckets(
      spark: SparkSession, terms: Seq[String], buckets: Int): Seq[Int] = {
    import spark.implicits._
    terms.toDF("t").select(pmod(hash(col("t")), lit(buckets)).as("b"))
      .collect().map(_.getInt(0)).toSeq.distinct
  }

  /** Build and persist the index: ONE tokenize pass feeds postings and
    * doc lengths, exactly like [[Bm25.topK]]'s online form. */
  def buildAndSave(
      docs: DataFrame,
      path: String,
      idCol: String,
      textCol: String,
      buckets: Int = 64): Bm25Index = {
    require(buckets > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(
      col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(hash(col("term")), lit(buckets)))
      .write.partitionBy("tb").parquet(s"$path/postings")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    dl.write.parquet(s"$path/doclen")
    dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"),
      lit(buckets).as("buckets"))
      .coalesce(1).write.parquet(s"$path/stats")
    load(spark, path)
  }

  def load(spark: SparkSession, path: String): Bm25Index = {
    val stats = spark.read.parquet(s"$path/stats").head()
    new Bm25Index(
      path,
      spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/doclen"),
      stats.getLong(stats.fieldIndex("n")),
      stats.getDouble(stats.fieldIndex("avgdl")),
      stats.getInt(stats.fieldIndex("buckets")))
  }
}
