package graft.flow

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class FlowSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("map/flatMap/filter stages compose with linkTo") {
    val double = Flow.map[Int, Int]("double")(_ * 2)
    val expand = Flow.flatMap[Int, Int]("expand")(x => Seq(x, x + 1))
    val pipeline = double >> expand
    assert(pipeline.name == "double->expand")
    val out = pipeline(spark.range(1, 4).map(_.toInt)).collect().sorted
    assert(out.toSeq == Seq(2, 3, 4, 5, 6, 7))
  }

  test("wrap is the FromBlock escape hatch") {
    val stage = Flow.wrap[java.lang.Long, java.lang.Long]("evens")(_.filter(col("id") % 2 === 0))
    assert(stage(spark.range(10)).count() == 5)
  }

  test("batch groups rows within partitions and flushes partials") {
    val batches = Flow.batch[Int]("b", 4)(
      implicitly, implicitly[org.apache.spark.sql.Encoder[Seq[Int]]])(
      spark.range(0, 10).map(_.toInt).repartition(2))
      .collect()
    assert(batches.map(_.size).sum == 10)
    assert(batches.forall(_.size <= 4))
  }

  test("router tags one pass, branches partition the input, residue catches the rest") {
    val df = spark.range(0, 100).toDF("v")
    val routed = Router(Seq(
      "low" -> (col("v") < 30),
      "mid" -> (col("v") < 60))).route(df)
    assert(routed("low").count() == 30)
    assert(routed("mid").count() == 30) // first-match-wins, like LinkTo order
    assert(routed.residue.count() == 40)
    val total = routed.branches.values.map(_.count()).sum + routed.residue.count()
    assert(total == 100) // guaranteed delivery: no row lost or duplicated
    routed.unpersist()
  }

  test("residueMustBeEmpty faults when rows escape routing") {
    val df = spark.range(0, 10).toDF("v")
    val routed = Router(Seq("some" -> (col("v") < 5))).route(df, cache = false)
    val e = intercept[IllegalArgumentException](routed.residueMustBeEmpty())
    assert(e.getMessage.contains("5 rows"))
  }

  test("dispatcher runs a child pipeline per key in one shuffled pass") {
    val out = Dispatcher
      .dispatch(spark.range(0, 100), (x: java.lang.Long) => x % 3) {
        (k: Long, it: Iterator[java.lang.Long]) => Iterator((k, it.size))
      }
      .collect()
      .toMap
    assert(out == Map(0L -> 34, 1L -> 33, 2L -> 33))
  }

  test("broadcaster fan-out delivers every row to every consumer") {
    val src = Broadcaster.fanOut(spark.range(0, 50), consumers = 2)
    val a = src.filter(col("id") % 2 === 0).count()
    val b = src.agg(sum("id")).as[Long].head()
    assert(a == 25 && b == 1225)
    src.unpersist()
  }
}
