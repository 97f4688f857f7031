package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that share any
  * word `n`-gram with an evaluation/benchmark set — the standard guard
  * against test-set leakage when curating a training corpus (13-gram
  * overlap is the convention for LLM pretraining sets).
  *
  * Scale design (100 TB corpus, eval-set-sized benchmark): the benchmark
  * side collapses to a DISTINCT set of 8-byte n-gram hashes and is
  * BROADCAST; the corpus side is a narrow explode of per-document n-gram
  * hashes filtered by the broadcast semi-join — no shuffle ever carries
  * exploded corpus data, only the (tiny) matched id set is aggregated.
  */
object Decontaminate {

  // Fused native expression: text → n-gram hashes in one codegen'd pass
  // (the composed transform(shingles(...), xxhash64) form runs its
  // lambdas interpreted and drags the corpus scan out of whole-stage
  // codegen — measured 2.96 s → see NOTES_r4). Both join sides use the
  // same expression, so hash-family choice is internal.
  private def ngramHashes(text: org.apache.spark.sql.Column, n: Int) =
    org.apache.spark.sql.graft.ShingleHashes.column(text, n, 42L)

  /** Distinct ids of corpus documents sharing ≥1 word n-gram with the
    * benchmark. Column: `idCol`. */
  def contaminatedIds(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 13): DataFrame = {
    val benchHashes = benchmark
      .select(explode(ngramHashes(col(benchTextCol), n)).as("graft_h"))
      .distinct()
    corpus
      .select(col(idCol), explode(ngramHashes(col(textCol), n)).as("graft_h"))
      .join(broadcast(benchHashes), Seq("graft_h"), "left_semi")
      .select(idCol)
      .distinct()
  }

  /** Per-document contamination fraction: |distinct n-grams ∩ benchmark|
    * / |distinct n-grams| — the GRADED form of [[contaminatedIds]]
    * (Llama-style decontamination drops documents above a fraction
    * threshold instead of on any single hit, sparing a long document
    * with one incidental overlap). Per-doc dedup of n-grams happens
    * NARROWLY (array_distinct on the fused hash array) before the
    * explode, so the only shuffle is the per-doc count aggregate —
    * map-side-combined to one row per document; the benchmark side
    * broadcasts exactly as in the boolean form.
    *
    * @return (`idCol`, n_grams, frac), frac rounded to 4. */
  def contaminationFraction(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 13): DataFrame = {
    val benchHashes = benchmark
      .select(explode(ngramHashes(col(benchTextCol), n)).as("graft_h"))
      .distinct()
      .withColumn("graft_hit", lit(1))
    corpus
      .select(col(idCol),
        explode(array_distinct(ngramHashes(col(textCol), n))).as("graft_h"))
      .join(broadcast(benchHashes), Seq("graft_h"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("graft_hit"), lit(0))).as("graft_nhit"))
      .select(col(idCol), col("n_grams"),
        round(col("graft_nhit").cast("double") / col("n_grams"), 4).as("frac"))
  }

  /** The corpus minus documents above `maxFraction` benchmark overlap. */
  def cleanByFraction(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      maxFraction: Double,
      n: Int = 13): DataFrame =
    corpus.join(
      contaminationFraction(corpus, idCol, textCol, benchmark, benchTextCol, n)
        .filter(col("frac") > maxFraction)
        .select(idCol),
      Seq(idCol), "left_anti")

  /** The corpus minus contaminated documents. */
  def clean(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 13): DataFrame =
    corpus.join(
      contaminatedIds(corpus, idCol, textCol, benchmark, benchTextCol, n),
      Seq(idCol), "left_anti")

  /** Frozen-benchmark handle for streaming decontamination (the
    * [[Dedup.FrozenReference]] pattern): the benchmark's distinct n-gram
    * hash set, computed ONCE and persisted — the only cross-batch state
    * the incremental gate holds, benchmark-sized (eval sets are tiny
    * next to a training stream) and fixed for the stream's lifetime. */
  final case class FrozenBenchmark private[operators] (
      hashes: DataFrame, n: Int, release: () => Unit)

  /** Hash the benchmark once for incremental decontamination. */
  def freezeBenchmark(
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 13): FrozenBenchmark = {
    val h = benchmark
      .select(explode(ngramHashes(col(benchTextCol), n)).as("graft_h"))
      .distinct()
      .persist()
    h.count()
    FrozenBenchmark(h, n, () => { h.unpersist(); () })
  }

  /** One batch of corpus docs gated against a [[FrozenBenchmark]]: the
    * same broadcast semi-join as [[clean]], reading the pre-hashed
    * benchmark cache instead of re-hashing the benchmark per trigger.
    * Per-doc decisions depend ONLY on (doc, benchmark), so batches
    * decompose exactly — the union of per-batch outputs equals [[clean]]
    * on the union (DecontaminateStreamSpec). */
  def cleanAgainstFrozen(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      frozen: FrozenBenchmark): DataFrame = {
    val contaminated = batch
      .select(col(idCol), explode(ngramHashes(col(textCol), frozen.n)).as("graft_h"))
      .join(broadcast(frozen.hashes), Seq("graft_h"), "left_semi")
      .select(idCol)
      .distinct()
    batch.join(contaminated, Seq(idCol), "left_anti")
  }
}
