package graft.streaming

import graft.flow.SparkTestSession
import graft.operators.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class Event(id: Long, v: Double, lang: String)

/** Streaming drift monitor: micro-batches scored against baselines
  * captured ONCE before the stream starts. Pins baseline/two-table
  * parity (the captured path must not drift from the gated operator)
  * and an e2e run where an in-distribution batch stays quiet and a
  * shifted batch flags. */
class StreamDriftSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def baseRows = (1 to 1000).map(i =>
    Event(i.toLong, (i % 50 + 1).toDouble, Seq("en", "de", "fr", "ja")(i % 4)))

  test("captured-baseline scoring is identical to the two-table operator") {
    val base = baseRows.toDF()
    val cur = base.filter($"v" <= 25)
    val direct = Drift.psi(base, cur, "v", 10, 1.0, 51.0).collect().toSeq
    val against = Drift.psiAgainst(
      Drift.psiBaseline(base, "v", 10, 1.0, 51.0), cur).collect().toSeq
    assert(against == direct)
    val directCat = Drift.psiCat(base, cur, "lang", maxCategories = 3)
      .collect().toSeq
    val againstCat = Drift.psiCatAgainst(
      Drift.catBaseline(base, "lang", maxCategories = 3), cur).collect().toSeq
    assert(againstCat == directCat)
  }

  test("e2e: an in-distribution batch stays quiet, a shifted batch " +
    "flags on the numeric column and a new language flags the " +
    "categorical one") {
    implicit val sc = spark.sqlContext
    val base = baseRows.toDF()
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft_driftstream").toString + "/ckpt"
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String, String, Double, Double)]()

    val in = MemoryStream[Event]
    // batch 0: a mix-preserving sample of the baseline distribution
    in.addData(baseRows.filter(_.id % 8 < 4): _*)
    val q = StreamOps.driftStream(
      in.toDF(), checkpoint,
      numeric = Seq(Drift.psiBaseline(base, "v", 10, 1.0, 51.0)),
      categorical = Seq(Drift.catBaseline(base, "lang", maxCategories = 3))) {
      (df, id) =>
        seen ++= df.select("column", "kind", "psi", "chi2")
          .collect().map(r => (id, r.getString(0), r.getString(1),
            r.getDouble(2), r.getDouble(3)))
    }
    q.processAllAvailable()
    // batch 1: numeric distribution truncated AND a new language surges
    in.addData((1 to 500).map(i =>
      Event(10000L + i, (i % 20 + 1).toDouble, "zh")): _*)
    q.processAllAvailable()
    q.stop()

    val byBatch = seen.groupBy(_._1)
    val b0 = byBatch(0L).map(r => r._2 -> r._4).toMap
    assert(b0("v") < 0.1, s"stable batch flagged: $b0")
    assert(b0("lang") < 0.1, s"stable batch flagged: $b0")
    val b1 = byBatch(1L).map(r => r._2 -> r._4).toMap
    assert(b1("v") > 0.25, s"shifted numeric not flagged: $b1")
    assert(b1("lang") > 0.25, s"new language not flagged: $b1")
    // chi2 rides the categorical rows, NaN on numeric ones
    val kinds = seen.map(r => r._3 -> r._5.isNaN).toSet
    assert(kinds.contains("numeric" -> true))
    assert(kinds.exists { case (k, nan) => k == "categorical" && !nan })
  }
}
