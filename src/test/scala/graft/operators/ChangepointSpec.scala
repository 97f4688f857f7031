package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** CUSUM: the two-window closed form equals Page's sequential recursion
  * exactly, alarms fire where the recursion says, and a planted mean
  * shift is detected while an in-control stream stays quiet. */
class ChangepointSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("property: closed form equals the sequential recursion on random streams") {
    val gen = Gen.listOfN(200, for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-10.0, 30.0)
    } yield (k, v))
    for (seed <- 1L to 5L) {
      val rows = sample(gen, seed).zipWithIndex
        .map { case ((k, v), i) => (k, i.toLong, v) }
      val df = rows.toDF("k", "i", "v")
      val slack = 2.0
      val got = Changepoint.cusum(df, Seq("k"), Seq("i"), "v", slack, 15.0)
        .select("k", "i", "graft_cusum")
        .as[(String, Long, Double)].collect()
        .map { case (k, i, s) => (k, i) -> s }.toMap

      // Page's recursion, replayed literally with the SAME quantized
      // mean and the SAME dyadic deviation grid — the statistic is then
      // EXACT, so the comparison is equality, not tolerance
      val mus = rows.groupBy(_._1).map { case (k, g) =>
        k -> BigDecimal(g.map(_._3).sum / g.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      rows.groupBy(_._1).foreach { case (k, g) =>
        var s = 0.0
        g.sortBy(_._2).foreach { case (_, i, v) =>
          val dq = math.floor((v - mus(k) - slack) * 64d) / 64d
          s = math.max(0.0, s + dq)
          assert(got((k, i)) == s,
            s"seed=$seed key=$k i=$i closed=${got((k, i))} recursion=$s")
        }
      }
    }
  }

  test("streaming CUSUM folds state across micro-batches and emits the " +
    "same alarms as the batch recursion against the same reference mean") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mu = 10.0; val slack = 2.0; val threshold = 30.0
    // one drifting key, one calm key, interleaved
    val events = (0 until 60).flatMap { i =>
      Seq(("drift", i.toLong, if (i < 20) 10.0 else 25.0, mu),
        ("calm", i.toLong, 10.0 + (i % 2), mu))
    }

    val in = MemoryStream[(String, Long, Double, Double)]
    val out = graft.streaming.StreamOps.cusumStream(
      in.toDS(), slack, threshold,
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
    val q = out.toDF("k", "ts", "s").writeStream.format("memory")
      .queryName("graft_cusum_stream").outputMode("append").start()
    try {
      // three micro-batches: state must carry across them
      in.addData(events.take(40)); q.processAllAvailable()
      in.addData(events.slice(40, 80)); q.processAllAvailable()
      in.addData(events.drop(80)); q.processAllAvailable()
      val got = spark.table("graft_cusum_stream")
        .as[(String, Long, Double)].collect()
        .map { case (k, ts, s) => (k, ts) -> s }.toMap

      // batch reference: the literal recursion over the full stream
      val want = events.groupBy(_._1).toSeq.flatMap { case (k, g) =>
        var s = 0.0
        g.sortBy(_._2).flatMap { case (_, ts, x, m) =>
          s = math.max(0.0, s + (x - m - slack))
          if (s > threshold) Some((k, ts) -> s) else None
        }
      }.toMap
      assert(got.keySet == want.keySet,
        s"alarm sets differ: extra=${got.keySet -- want.keySet} " +
          s"missing=${want.keySet -- got.keySet}")
      want.foreach { case (key, s) =>
        assert(math.abs(got(key) - s) < 1e-9, s"$key: ${got(key)} vs $s")
      }
      assert(!got.keySet.exists(_._1 == "calm"), "calm key must not alarm")
    } finally q.stop()
  }

  test("a planted mean shift alarms once and stays alarmed; the " +
    "in-control key never alarms") {
    val calm = (0 until 100).map(i => ("calm", i.toLong, 10.0 + (i % 3)))
    val shifted = (0 until 100).map { i =>
      ("shift", i.toLong, if (i < 50) 10.0 else 40.0) // +30 shift at i=50
    }
    val df = (calm ++ shifted).toDF("k", "i", "v")
    val out = Changepoint.cusumSummary(df, Seq("k"), Seq("i"), "v",
      slack = 2.0, threshold = 50.0)
      .select("k", "n_alarms", "first_alarm")
      .as[(String, Long, Option[Long])].collect()
      .map { case (k, a, f) => k -> ((a, f)) }.toMap
    assert(out("calm") == ((0L, None)), s"in-control stream alarmed: $out")
    val (nAlarms, firstAlarm) = out("shift")
    assert(nAlarms > 0 && firstAlarm.exists(i => i >= 50 && i < 70),
      s"shift at 50 must alarm shortly after: $out")
  }
}
