package graft.examples

import graft.flow._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Composite pipelines mirroring the reference's Demo project (SURVEY.md
  * §2.1 A25–A27) — the reference's README walks users through exactly
  * these three: a KEY=Value aggregator, a JSON→people→DB flow, and a
  * cyclic web crawler. They double as end-to-end examples of the Flow API.
  */
object Demos {

  /** A25 AggregatorFlow: parse "KEY=Value" lines → group-by-key sum.
    * The reference accumulates a Dictionary in a sink block; the Spark
    * form is a declarative group-by (distributed, spill-safe). */
  def aggregatorFlow(lines: DataFrame): DataFrame = {
    val parse = Flow.wrap[org.apache.spark.sql.Row, org.apache.spark.sql.Row]("parse") {
      _.select(
        split(col("value"), "=").getItem(0).as("key"),
        split(col("value"), "=").getItem(1).cast("long").as("v"))
    }
    val aggregate = Flow.wrap[org.apache.spark.sql.Row, org.apache.spark.sql.Row]("sum") {
      _.groupBy("key").agg(sum("v").as("total"))
    }
    (parse >> aggregate)(lines)
  }

  /** A26 people flow: JSON strings → typed records → sink, with the
    * malformed-record branch routed instead of crashing the flow (the
    * reference logs-and-drops; we route so the residue is observable). */
  def peopleFlow(spark: SparkSession, jsonLines: DataFrame, outDir: String): RoutedFlows = {
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("age", IntegerType)))
    val parsed = jsonLines.withColumn("p", from_json(col("value"), schema))
    val routed = Router(Seq(
      "ok" -> col("p.name").isNotNull,
      "malformed" -> col("p.name").isNull)).route(parsed)
    Sinks.parquet(routed("ok").select("p.name", "p.age"), s"$outDir/people")
    routed
  }

  /** North-star composite: the full training-data curation pipeline as a
    * monitored Pipeline (A1 container + A19 statistics + the corpus
    * operators) — documents in, curated corpus + per-language token
    * stats out, with observed row counts at each stage boundary. The
    * shape a 100 TB curation run takes: one pipeline, every stage a
    * declarative frame, counts recorded by the existing jobs. */
  def curationFlow(
      spark: SparkSession,
      documents: DataFrame,
      outDir: String,
      keepLangs: Set[String] = Set("en", "de", "fr", "es")): Pipeline = {
    val p = new Pipeline("curation", spark)
    val annotated = p.observed(
      graft.operators.CorpusCuration.annotate(documents, "text"), "annotated")
    val curated = p.observed(
      graft.operators.CorpusCuration.curate(
        documents, "doc_id", "text", keepLangs = keepLangs, minTokens = 3),
      "curated")
    p.sinkParquet("curated_corpus", curated, s"$outDir/curated")
    p.sinkParquet("lang_stats",
      annotated.groupBy("lang").agg(
        count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens")),
      s"$outDir/lang_stats")
    p
  }

  /** A27 crawler: fetch page → extract links → filter unseen → feed back.
    * The cyclic TPL graph becomes a driver-side fixpoint; `linksOf` stands
    * in for the HTTP fetch (no network in this environment — the loop
    * structure, dedup-on-visited and termination are the point). */
  def crawlerFlow(spark: SparkSession, seedUrl: String, linksOf: DataFrame => DataFrame,
      maxDepth: Int = 10): DataFrame = {
    import spark.implicits._
    val seed = Seq(seedUrl).toDF("url")
    Iterate.fixpoint(seed, maxIterations = maxDepth)(linksOf)
  }
}
