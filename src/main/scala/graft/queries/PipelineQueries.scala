package graft.queries

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators, round 3: document chunking, PII
  * redaction, URL/host extraction, repetition scoring, mergeable HLL
  * sketches. All are narrow per-row transforms or map-side-combinable
  * aggregations — the shapes that survive a 100 TB corpus.
  */
object PipelineQueries {

  val all: Seq[GraftQuery] = Seq(

    // Overlapping fixed-size chunks (120 chars, stride 90) — the context-
    // window packing step of an LLM ingest. explode(sequence(...)) is a
    // NARROW row multiplier: no shuffle, chunks are born in the partition
    // that read the document; at 100 TB the chunker pipelines straight
    // into the tokenizer with zero exchanges.
    GraftQuery(
      "q_chunk_docs",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            col("text"),
            explode(
              sequence(
                lit(0L),
                greatest(length(col("text")).cast("long") - 1L, lit(0L)),
                lit(90L))).as("off"))
          .select(
            col("doc_id"),
            col("off"),
            expr("substring(text, cast(off as int) + 1, 120)").as("chunk"))
          .orderBy("doc_id", "off"),
      Some("""SELECT doc_id, t.off AS off,
             |       substr(text, CAST(t.off AS INT) + 1, 120) AS chunk
             |FROM documents,
             |     unnest(generate_series(0, greatest(length(text) - 1, 0), 90)) AS t(off)
             |ORDER BY doc_id, off""".stripMargin)),

    // PII redaction: scrub emails and long digit runs (ids, account
    // numbers) before a corpus ships to training. The fixture carries no
    // real PII, so the email is synthesized INTO the sentence first and
    // the redactor has to find it again; the operator under test is the
    // regex rewrite, a codegen'd per-row expression.
    GraftQuery(
      "q_pii_redact",
      (s, d) =>
        Tables.customer(s, d)
          .select(
            col("c_custkey"),
            regexp_replace(
              regexp_replace(
                concat_ws(" ",
                  col("c_name"), lit("wrote from"),
                  concat(lower(col("c_mktsegment")), lit("_"), col("c_custkey"),
                    lit("@example.com")),
                  lit("re: account")),
                lit("[A-Za-z0-9._]+@[A-Za-z0-9.-]+"), lit("<EMAIL>")),
              lit("[0-9]{6,}"), lit("<ID>")).as("redacted"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  regexp_replace(
             |    regexp_replace(
             |      concat_ws(' ', c_name, 'wrote from',
             |                concat(lower(c_mktsegment), '_', c_custkey, '@example.com'),
             |                're: account'),
             |      '[A-Za-z0-9._]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
             |    '[0-9]{6,}', '<ID>', 'g') AS redacted
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Host extraction + per-host doc counts — the provenance histogram a
    // crawl-curation pipeline runs first (which domains dominate the
    // corpus?). URL synthesized from the doc's source tag; the operator is
    // regexp_extract + a map-side-combinable count.
    GraftQuery(
      "q_url_extract",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            concat(lit("https://"), col("source"), lit(".example.com/d/"),
              col("doc_id")).as("url"))
          .select(regexp_extract(col("url"), "https?://([^/]+)/", 1).as("host"))
          .groupBy("host")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("host"),
      Some("""SELECT regexp_extract(
             |         concat('https://', source, '.example.com/d/', doc_id),
             |         'https?://([^/]+)/', 1) AS host,
             |       COUNT(*) AS n_docs
             |FROM documents GROUP BY 1 ORDER BY host""".stripMargin)),

    // Repetition scoring (Gopher-style quality rule): share of the most
    // frequent token per document. Two-level aggregation — the first
    // groupBy gets a map-side partial combine on (doc_id, tok), so the
    // shuffle carries per-partition token counts, not raw tokens.
    GraftQuery(
      "q_repetition",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok")
          .agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n_tokens"), max("c").as("top_tok_n"))
          .select(
            col("doc_id"),
            col("n_tokens"),
            round(col("top_tok_n").cast("double") / col("n_tokens"), 4)
              .as("top_tok_share"))
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |c AS (
             |  SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2)
             |SELECT doc_id,
             |       CAST(SUM(c) AS BIGINT) AS n_tokens,
             |       ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 4) AS top_tok_share
             |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Mergeable Datasketches HLL: sketch per group, union the sketches,
    // estimate the merged cardinality — the two-level pattern that scales
    // distinct-counting to 100 TB (each executor sketches its partition;
    // only fixed-size register arrays move). Estimate differs from
    // DuckDB's HLL → rows-only; HllSketchSpec pins the merge algebra.
    GraftQuery(
      "q_hll_sketch",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy("lang")
          .agg(expr("hll_sketch_agg(text, 12)").as("sk"))
          .agg(
            expr("hll_sketch_estimate(hll_union_agg(sk, false))")
              .as("merged_distinct_texts"),
            count(lit(1)).as("n_groups"))),
  )
}
