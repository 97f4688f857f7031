package graft.operators

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MEASURED skew evidence for Skew.saltedJoin (the r11 verdict's gap:
  * the salted plan was plan-asserted but never measured under a real hot
  * key). The fixture is generated in-test — half the fact rows share ONE
  * key — and the assertions measure the shuffle's actual row placement
  * via spark_partition_id(), with AQE and auto-broadcast disabled so the
  * comparison exercises the static hash-shuffle path salting exists to
  * fix (AQE's skew split is the first line of defense; salting is for
  * the case a single key exceeds one task, which AQE cannot re-split).
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val HOT = 7L // arbitrary hot key, present in dim

  private def withStaticShuffle[A](body: => A): A = {
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // leveling is bounded by min(buckets, shuffle partitions): with the
    // test session's small partition count the 16 salt buckets would
    // fold back together and mask the spread being measured
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Rows per output partition of `df`, as observed by the executors. */
  private def partitionLoads(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.withColumn("graft_pid", spark_partition_id())
      .groupBy("graft_pid").count()
      .collect().map(_.getLong(1)).toSeq

  test("salted join levels a hot key's partition load by ~buckets " +
    "and computes the identical relation") {
    withStaticShuffle {
      val n = 100000
      // 50% of fact rows on ONE key — the pathological single-hot-key
      // distribution; the rest uniform over 1000 cold keys
      val fact = spark.range(n.toLong).select(
        col("id"),
        when(col("id") % 2 === 0, lit(HOT))
          .otherwise(pmod(col("id"), lit(1000L))).as("k"))
      val dim = spark.range(1000L).select(
        col("id").as("k"), (col("id") * 10).as("attr"))

      val plain = fact.join(dim, Seq("k"))
      val salted = Skew.saltedJoin(
        fact, dim, "k", buckets = 16, saltFrom = Some(col("id")))

      // identical relation (the q_join_salted oracle's claim, re-checked
      // here against the measured fixture)
      assert(plain.count() === salted.count())
      assert(plain.agg(sum(col("id") + col("attr"))).head.getLong(0) ===
        salted.agg(sum(col("id") + col("attr"))).head.getLong(0))

      val plainLoads = partitionLoads(plain)
      val saltedLoads = partitionLoads(salted)
      val plainMax = plainLoads.max
      val saltedMax = saltedLoads.max

      // unsalted: the hot key's ~n/2 matched rows land in ONE shuffle
      // partition — the stuck-task signature
      assert(plainMax >= n / 2,
        s"fixture no longer skewed: plain max partition $plainMax")
      // salted: the hot key spreads over 16 salt buckets; the heaviest
      // partition must carry ≤ 1/3 of the unsalted hot partition (16
      // buckets with generous slack for (key,salt)→partition collisions
      // and the cold-key background)
      assert(saltedMax.toDouble <= plainMax.toDouble / 3,
        s"salting leveled nothing: salted max $saltedMax vs plain $plainMax")
      // and the spread is real leveling, not one moved hot spot: the
      // top-4 salted partitions together stay under the single plain
      // hot partition
      val top4 = saltedLoads.sorted.reverse.take(4).sum
      assert(top4 < plainMax,
        s"top-4 salted partitions $top4 should undercut the one hot " +
          s"partition $plainMax")
    }
  }

  test("skew report names the hot key with the salt count that levels it") {
    val fact = spark.range(10000L).select(
      when(col("id") < 5000, lit(HOT))
        .otherwise(pmod(col("id"), lit(100L))).as("k"))
    val r = Skew.report(fact, Seq("k"), topN = 1).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("k")) === HOT)
    // hot key holds ~half the rows over ~100 keys → skew ratio ~50 →
    // suggested salt ≈ ceil(ratio); exact arithmetic, so pin the bound
    assert(row.getLong(row.fieldIndex("suggested_salt")) >= 40,
      s"suggested salt should reflect ~50x skew: $row")
  }
}
