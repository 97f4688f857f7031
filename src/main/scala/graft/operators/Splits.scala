package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-ranged assignment — the reproducibility primitive
  * under sampling and train/val/test splitting. An id maps to a uniform
  * in [0, 1) via its md5 prefix: stable across runs, engines, and
  * re-partitioning, and ingesting more rows never moves an untouched
  * row's assignment (a seeded RNG or TABLESAMPLE is layout-dependent —
  * the same corpus shuffled differently yields a different sample).
  * md5 (not xxhash64) so external systems — including the DuckDB
  * oracle — reproduce the assignment bit-for-bit. */
object Splits {

  /** Uniform [0, 1) from the first 8 hex digits of md5(id). */
  def uniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Copy count for FRACTIONAL-EPOCH resampling: training runs commonly
    * weight a corpus at a non-integer number of epochs (see 2.5 epochs of
    * high-quality text in published data-mixture tables); every doc gets
    * `floor(epochs)` copies and the remaining fraction admits one more by
    * the same md5-uniform — layout-independent, so the SAME docs get the
    * extra copy on every run and engine. The uniform is salted (`#ep`) so
    * epoch admission does not correlate with [[split]]'s assignment (an
    * unsalted draw would hand the extra copy preferentially to the train
    * split's low-u docs). Explode `sequence(0, copies-1)` to materialize. */
  def epochCopies(id: Column, epochs: Double): Column = {
    require(epochs > 0, s"epochs must be positive, got $epochs")
    val whole = math.floor(epochs).toLong
    val frac = epochs - whole
    lit(whole) +
      when(uniform(concat(id.cast("string"), lit("#ep"))) < frac, lit(1L))
        .otherwise(lit(0L))
  }

  /** Three-way split label: `train` / `val` / `test` by where
    * [[uniform]] lands in [0, trainFrac), [trainFrac, trainFrac+valFrac),
    * [trainFrac+valFrac, 1). */
  def split(
      id: Column,
      trainFrac: Double = 0.9,
      valFrac: Double = 0.05): Column = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"invalid split fractions train=$trainFrac val=$valFrac")
    val u = uniform(id)
    when(u < trainFrac, "train")
      .when(u < trainFrac + valFrac, "val")
      .otherwise("test")
  }

  /** Efraimidis–Spirakis weighted-sampling key (IPL 2006): the top-k
    * rows by `ln(u)/w` with u = the row's deterministic md5-uniform are
    * EXACTLY a weighted sample without replacement of size k (the
    * exponential-race formulation: −ln(u)/w ~ Exp(w); the k smallest
    * arrival times win, i.e. the k LARGEST ln(u)/w). One narrow
    * projection + TakeOrderedAndProject — a single pass, no shuffle of
    * the corpus, mergeable across any partitioning, which is why this
    * (not rejection sampling or a global cumulative sum) is the 100 TB
    * weighted-sampling algorithm.
    *
    * Deterministic by the same md5 contract as [[uniform]]: salted
    * (`#ws`) so sampling does not correlate with split assignment;
    * u is (h + 0.5)/2³² ∈ (0,1) strictly, so ln is always finite; the
    * key is ROUNDED to 8 decimals so engines whose pow/log differ in
    * the last ulp cannot flip an ordering the oracle replays (gaps at
    * fixture scale are ≫ 1e-8).
    *
    * `weight` must be > 0 (caller's contract — a nonpositive weight
    * yields NULL/ordering-garbage, matching SQL semantics). */
  def weightedSampleKey(id: Column, weight: Column): Column = {
    val u = (conv(substring(md5(concat(id.cast("string"), lit("#ws"))), 1, 8),
      16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)
    round(log(u) / weight.cast("double"), 8)
  }

  /** Weighted sample without replacement of `k` rows: all input columns
    * plus the `es_key` ranking key, cut by TakeOrdered on
    * (key desc, id asc). */
  def weightedSample(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    df.withColumn("es_key", weightedSampleKey(col(idCol), col(weightCol)))
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic GLOBAL TRAINING SHUFFLE key — the data-ordering stage
    * every LLM training pipeline runs between curation and delivery: the
    * corpus must reach the trainer in a reproducible pseudo-random order
    * (a re-run, a resumed job, or another engine must produce the SAME
    * permutation), re-randomized per epoch. The key is the full md5 hex
    * of the salted id: layout-independent, re-ingestion-stable (adding
    * docs never reorders existing neighbors' relative order), and
    * replayable bit-for-bit by external systems — the [[uniform]]
    * contract applied to ordering. */
  def shuffleKey(id: Column, epoch: Int = 1): Column =
    md5(concat(id.cast("string"), lit(s"#shuf$epoch")))

  /** Deterministic shard assignment under the same per-epoch key: first
    * 8 hex digits as an int64, mod `nShards`. Delivery at scale writes
    * one file/stream per shard; within a shard, order by
    * ([[shuffleKey]], id). The full pipeline is a narrow projection plus
    * ONE exchange on the shard column — no global sort of 100 TB. */
  def shuffleShard(id: Column, nShards: Int, epoch: Int = 1): Column = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    (conv(substring(shuffleKey(id, epoch), 1, 8), 16, 10).cast("long")
      % nShards).cast("int")
  }
}
