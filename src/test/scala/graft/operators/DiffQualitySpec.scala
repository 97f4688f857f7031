package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DiffQualitySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("snapshot diff classifies inserts, updates, deletes; unchanged emit nothing") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val neu = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("k", "v")
    val out = SnapshotDiff.diff(old, neu, Seq("k"))
      .as[(Long, String, String)].collect().toSet
    assert(out == Set(
      (2L, "B2", "update"), // new value carried
      (3L, "c", "delete"),  // old value carried
      (4L, "d", "insert")))
  }

  test("snapshot diff is null-safe on attributes AND keys") {
    val old = Seq((Option(1L), Option.empty[String]), (Option.empty[Long], Option("x")))
      .toDF("k", "v")
    val neu = Seq((Option(1L), Option("now-set")), (Option.empty[Long], Option("x")))
      .toDF("k", "v")
    val out = SnapshotDiff.diff(old, neu, Seq("k"))
      .as[(Option[Long], Option[String], String)].collect().toSet
    // NULL→value is an update; the NULL-keyed unchanged row emits nothing
    assert(out == Set((Option(1L), Option("now-set"), "update")))
  }

  test("quality report counts violations per check, in check-list order") {
    val df = Seq(
      (1L, Option("x"), 10.0),
      (2L, Option.empty[String], -5.0),
      (2L, Option("y"), 3.0)) // duplicate key 2
      .toDF("id", "name", "amount")
    val dim = Seq(1L, 2L).toDF("id")
    val out = Quality.report(df, Seq(
      Quality.NotNull("name"),
      Quality.Satisfies("positive_amount", "amount > 0"),
      Quality.Unique(Seq("id")),
      Quality.RefIntegrity("id", dim, "id")))
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(
      ("not_null_name", 1L),
      ("positive_amount", 1L),
      ("unique_id", 1L),   // one extra copy of key 2
      ("ref_id", 0L)))
  }

  test("quality report rejects duplicate check names up front") {
    val df = Seq((1L, 10.0)).toDF("id", "amount")
    val e = intercept[IllegalArgumentException] {
      Quality.report(df, Seq(
        Quality.Satisfies("amount_ok", "amount > 0"),
        Quality.Satisfies("amount_ok", "amount < 100")))
    }
    assert(e.getMessage.contains("amount_ok"))
    // two NotNull on the same column collide via derived names too
    intercept[IllegalArgumentException] {
      Quality.report(df, Seq(Quality.NotNull("id"), Quality.NotNull("id")))
    }
  }

  test("enforce throws listing only the failing checks") {
    val df = Seq((1L, -1.0)).toDF("id", "amount")
    val e = intercept[IllegalStateException] {
      Quality.enforce(df, Seq(
        Quality.NotNull("id"),
        Quality.Satisfies("positive_amount", "amount > 0")))
    }
    assert(e.getMessage.contains("positive_amount=1"))
    assert(!e.getMessage.contains("not_null_id"))
  }
}
