package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CorpusCurationSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and it runs far away for the night"),
    (1L, "the quick brown fox jumps over the lazy dog and it runs far away for the day"), // near dup of 0
    (2L, "der hund und die katze sind nicht ein gutes team mit der maus"),                // German
    (3L, "the quick brown fox jumps over the lazy dog and it runs far away for the night"), // exact dup of 0
    (4L, "tiny"),                                                                          // too short
    (5L, "spam spam spam spam spam spam spam spam spam spam spam spam"),                   // low uniq
    (6L, "a completely different and quite original piece of english text for the corpus")
  ).toDF("doc_id", "text")

  test("annotate attaches language, token counts and quality signals") {
    val a = CorpusCuration.annotate(corpus, "text")
    val byId = a.select("doc_id", "lang", "n_tokens").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byId(0L)._1 == "en")
    assert(byId(2L)._1 == "de")
    assert(byId(4L)._2 == 1L)
    val uniq = a.filter($"doc_id" === 5L).select("uniq_ratio").as[Double].head()
    assert(uniq < 0.2) // 12 copies of one token
  }

  test("curate filters language/length/quality then removes exact and near dups") {
    val out = CorpusCuration.curate(
      corpus, "doc_id", "text",
      keepLangs = Set("en"),
      minTokens = 5,
      minUniqRatio = 0.3,
      nearDupThreshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    // 2 (German), 4 (short), 5 (low uniq) filtered; 3 exact-dup of 0;
    // 1 near-dup of 0 → survivors: 0 and 6
    assert(out == Set(0L, 6L))
  }

  test("nearDup=false skips the candidate join but keeps exact dedup") {
    val out = CorpusCuration.curate(
      corpus, "doc_id", "text",
      keepLangs = Set("en"), minTokens = 5, minUniqRatio = 0.3, nearDup = false)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(0L, 1L, 6L)) // near-dup 1 survives, exact-dup 3 does not
  }

  test("benchmark decontamination and split stages compose onto the " +
    "pipeline: contaminated survivors drop, the rest get stable labels") {
    // benchmark shares a 4-gram with doc 6 only (doc 0's text does not
    // contain this span)
    val benchmark = Seq("quite original piece of english").toDF("q")
    val out = CorpusCuration.curate(
      corpus, "doc_id", "text",
      keepLangs = Set("en"), minTokens = 5, minUniqRatio = 0.3,
      nearDupThreshold = 0.6,
      benchmark = Some(benchmark), benchmarkTextCol = "q",
      decontaminateN = 4, splitCol = Some("split"))
    val rows = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(rows.keySet == Set(0L), s"survivors ${rows.keySet}") // 6 contaminated
    // the split label equals the standalone deterministic assignment
    val expected = Seq(0L).toDF("doc_id")
      .select(Splits.split(org.apache.spark.sql.functions.col("doc_id")))
      .as[String].head()
    assert(rows(0L) == expected)
  }

  test("contamination fraction grades what the boolean form flags: " +
    "frac > 0 exactly for contaminatedIds docs, and a threshold spares " +
    "light-overlap documents the boolean form would drop") {
    val benchmark = Seq("quite original piece of english").toDF("q")
    val frac = Decontaminate.contaminationFraction(
      corpus, "doc_id", "text", benchmark, "q", n = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val flagged = Decontaminate.contaminatedIds(
      corpus, "doc_id", "text", benchmark, "q", n = 4)
      .as[Long].collect().toSet
    assert(frac.filter(_._2 > 0).keySet == flagged)
    // doc 6 overlaps on a couple of 4-grams out of many: a 0.5 threshold
    // keeps it, while the boolean form drops it
    assert(frac(6L) > 0 && frac(6L) < 0.5)
    val kept = Decontaminate.cleanByFraction(
      corpus, "doc_id", "text", benchmark, "q", maxFraction = 0.5, n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(6L))
    val keptStrict = Decontaminate.clean(
      corpus, "doc_id", "text", benchmark, "q", n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(!keptStrict.contains(6L))
  }

  test("weightedSample skews toward heavy weights and stays deterministic") {
    import org.apache.spark.sql.functions._
    val rows = (1L to 1000L).map(id =>
      (id, if (id <= 500) 5.0 else 0.05)).toDF("id", "w")
    val got = Splits.weightedSample(rows, "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    assert(got.size == 100)
    val heavy = got.count(_ <= 500)
    // E[heavy] ≈ 99 under exponential races at 100:1 weight odds
    assert(heavy >= 85, s"only $heavy/100 sampled from the 100×-weighted half")
    // layout-independence: repartitioned input picks the identical set
    val again = Splits.weightedSample(rows.repartition(13), "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    assert(again == got)
    // plan: the cut is a bounded-heap TakeOrdered, never a global sort
    val plan = Splits.weightedSample(rows, "id", "w", k = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan missing TakeOrdered:\n$plan")
  }

  test("weightedSample matches a driver-side replay of the exponential race") {
    import org.apache.spark.sql.functions._
    val rows = (1L to 300L).map(id => (id, 0.5 + (id % 7))).toDF("id", "w")
    val got = Splits.weightedSample(rows, "id", "w", k = 20)
      .select("id").as[Long].collect().toSeq
    val keys = rows
      .withColumn("es_key", Splits.weightedSampleKey(col("id"), col("w")))
      .select("id", "es_key").as[(Long, Double)].collect()
    val want = keys.sortBy { case (id, k) => (-k, id) }.take(20).map(_._1).toSeq
    assert(got == want)
  }

  test("global shuffle: a real permutation, dense per-shard positions, " +
    "epoch re-randomizes, layout-independent") {
    import org.apache.spark.sql.functions._
    val ids = (1L to 500L).toDF("id")
    def order(epoch: Int, parts: Int): Seq[Long] = ids.repartition(parts)
      .select(col("id"), Splits.shuffleKey(col("id"), epoch).as("k"))
      .orderBy("k", "id").select("id").as[Long].collect().toSeq
    val e1 = order(1, 4)
    // deterministic + layout-independent
    assert(e1 == order(1, 13))
    // a real permutation of the input, and NOT the identity
    assert(e1.sorted == (1L to 500L) && e1 != (1L to 500L).toSeq)
    // epoch salt re-randomizes
    assert(e1 != order(2, 4))
    // shard assignment: every row lands in [0, nShards); positions are
    // dense 1..n within each shard (the delivery-file contract)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("k", "id")
    val sharded = ids
      .select(col("id"), Splits.shuffleShard(col("id"), 8).as("shard"),
        Splits.shuffleKey(col("id")).as("k"))
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(w))
      .collect().map(r => (r.getInt(1), r.getInt(3)))
    assert(sharded.forall { case (s, _) => s >= 0 && s < 8 })
    val byShard = sharded.groupBy(_._1)
    assert(byShard.size == 8, "500 ids must hit all 8 shards")
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.size).toSeq,
        s"shard $s positions not dense")
    }
  }
}
