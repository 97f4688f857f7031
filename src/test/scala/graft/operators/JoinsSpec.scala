package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("broadcastIfSmall broadcasts a measured-small side and falls back " +
    "to a shuffle join above the threshold") {
    val big = (1 to 2000).map(i => (i.toLong, s"x$i")).toDF("k", "a")
    val side = (1 to 100).map(i => (i.toLong, i * 2)).toDF("k", "b")
      .groupBy("k").sum("b") // aggregate: static size estimate is useless

    // pin the automatic thresholds off so the assertions exercise the
    // MEASURED switch, not Catalyst's/AQE's own size-based conversion
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try {
      val small = big.join(Joins.broadcastIfSmall(side, maxRows = 1000), "k")
      small.collect()
      assert(small.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))

      val large = big.join(Joins.broadcastIfSmall(side, maxRows = 10), "k")
      large.collect()
      assert(!large.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "side above the measured threshold must not be hint-broadcast")
      // both paths compute the same join
      assert(small.count() == 100 && large.count() == 100)

      // BYTE cap: a side that passes the row gate but whose sampled
      // bytes exceed maxBytes must shuffle — row count alone
      // under-constrains memory for wide rows
      val wide = (1 to 50).map(i => (i.toLong, "y" * 100000)).toDF("k", "w")
        .groupBy("k").agg(org.apache.spark.sql.functions.first("w").as("w"))
      val byteCapped = big.join(
        Joins.broadcastIfSmall(wide, maxRows = 1000, maxBytes = 1024L), "k")
      byteCapped.collect()
      assert(!byteCapped.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "side above the byte cap must not be hint-broadcast")
      assert(byteCapped.count() == 50)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("bloomReducedJoin is row-identical to the plain join") {
    val fact = (1L to 5000L).map(i => (i, i % 100)).toDF("fk", "v")
    val dim = (1L to 5000L).filter(_ % 50 == 0).map(i => (i, s"d$i"))
      .toDF("dk", "name")
    val plain = fact.join(dim, $"fk" === $"dk")
      .select("fk", "v", "name").collect().map(_.toString).sorted.toSeq
    val bloomed = Joins.bloomReducedJoin(fact, dim, "fk", "dk",
      expectedItems = 200L, numBits = 4000L)
      .select("fk", "v", "name").collect().map(_.toString).sorted.toSeq
    assert(bloomed == plain && plain.length == 100)
  }

  test("bloomReducedJoin prefilters the fact scan: few rows survive to the join") {
    // range-backed (not LocalRelation) so ConvertToLocalRelation can't
    // eagerly evaluate the filter out of the inspectable plan
    val fact = spark.range(1, 10001).select($"id".as("fk"), $"id".as("v"))
    val dim = spark.range(1, 10001).filter($"id" % 100 === 0)
      .select($"id".as("dk"), $"id".as("w"))
    // measure the surviving fact rows through the same filter the join uses
    val joined = Joins.bloomReducedJoin(fact, dim, "fk", "dk",
      expectedItems = 100L, numBits = 8000L)
    assert(joined.count() == 100)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("might_contain"),
      s"bloom prefilter missing from plan:\n$plan")
    // survivors = true matches + false positives; at ~10 bits/key the fp
    // rate is well under 1%, so the prefilter kills >98% of the fact
    val sketchSurvivors = {
      import org.apache.spark.sql.graft.BloomBridge
      val bytes = dim.select(BloomBridge.bloomAggregate(dim("dk"), 100L, 8000L))
        .collect().head.getAs[Array[Byte]](0)
      fact.filter(BloomBridge.mightContain(bytes, fact("fk"))).count()
    }
    assert(sketchSurvivors < 300, s"prefilter passed $sketchSurvivors of 10000")
  }

  test("bloomReducedJoin with an empty dim yields an empty result, no crash") {
    val fact = (1L to 100L).map(i => (i, i)).toDF("fk", "v")
    val dim = Seq.empty[(Long, Long)].toDF("dk", "w")
    assert(Joins.bloomReducedJoin(fact, dim, "fk", "dk").count() == 0)
  }

  test("bloomReducedJoin drops null fact keys exactly like the inner join") {
    val fact = Seq[(Option[Long], Long)](
      (Some(1L), 10), (None, 20), (Some(2L), 30)).toDF("fk", "v")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("dk", "name")
    val got = Joins.bloomReducedJoin(fact, dim, "fk", "dk")
      .select("fk").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("deterministic saltedJoin is row-identical to the plain join " +
    "under heavy key skew") {
    import org.apache.spark.sql.functions.col
    // 90% of fact rows share key 7 — the shape salting exists for
    val fact = (1L to 2000L)
      .map(i => (i, if (i % 10 == 0) i % 5 else 7L, i * 3))
      .toDF("rid", "fk", "v")
    val dim = (0L to 9L).map(i => (i, s"d$i")).toDF("fk", "name")
    val plain = fact.join(dim, Seq("fk"))
      .select("rid", "fk", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, "fk", buckets = 8,
        saltFrom = Some(col("rid")))
      .select("rid", "fk", "v", "name")
    val a = plain.collect().map(_.toSeq).sortBy(_.toString)
    val b = salted.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("deterministic salt really spreads the hot key over the buckets, " +
    "and buckets=1 degenerates to the plain join") {
    import org.apache.spark.sql.functions.{col, countDistinct, lit, pmod, xxhash64}
    val fact = (1L to 500L).map(i => (i, 7L)).toDF("rid", "fk")
    val dim = Seq((7L, "hot")).toDF("fk", "name")
    val nSalts = fact
      .select(pmod(xxhash64(col("rid")), lit(8L)).as("s"))
      .agg(countDistinct("s")).head.getLong(0)
    assert(nSalts == 8L, s"hash salt covered only $nSalts of 8 buckets")
    assert(Skew.saltedJoin(fact, dim, "fk", 8,
      saltFrom = Some(col("rid"))).count() == 500)
    assert(Skew.saltedJoin(fact, dim, "fk", 1,
      saltFrom = Some(col("rid"))).count() == 500)
  }
}
