package graft.flow

import java.nio.file.Files

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IterateSinksSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fixpoint iteration computes transitive closure (crawler parity A20/A27)") {
    // chain 0→1→2→3→4 plus an unreachable island 10→11
    val edges = Seq((0, 1), (1, 2), (2, 3), (3, 4), (10, 11)).toDF("src", "dst")
    val seed = Seq(0).toDF("node")
    val reached = Iterate.fixpoint(seed, maxIterations = 10) { frontier =>
      frontier.join(edges, frontier("node") === edges("src")).select(col("dst").as("node"))
    }
    assert(reached.as[Int].collect().sorted.toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("fixpoint terminates on cycles (the ring-completion case)") {
    val edges = Seq((0, 1), (1, 2), (2, 0)).toDF("src", "dst") // pure cycle
    val seed = Seq(0).toDF("node")
    val reached = Iterate.fixpoint(seed, maxIterations = 20) { frontier =>
      frontier.join(edges, frontier("node") === edges("src")).select(col("dst").as("node"))
    }
    assert(reached.as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
  }

  test("partitioned sink shards by key like MultiDbBulkInserter (A17)") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "shard")
    Sinks.partitionedParquet(df, s"$dir/out", "shard")
    assert(new java.io.File(s"$dir/out/shard=a").exists())
    assert(new java.io.File(s"$dir/out/shard=b").exists())
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 3)
  }

  test("fixpoint terminates when discovered rows contain NULLs") {
    val edges = Seq((Some(0), Some(1)), (Some(1), None)).toDF("src", "dst")
    val seed = Seq(Option(0)).toDF("node")
    val reached = Iterate.fixpoint(seed, maxIterations = 10) { frontier =>
      frontier.join(edges, frontier("node") === edges("src")).select(col("dst").as("node"))
    }
    // null row visited once, loop terminates well before maxIterations
    assert(reached.collect().length == 3)
  }

  test("asof join carries a legitimately NULL right value from the latest row") {
    val left = Seq((1L, "u", 30L)).toDF("event_id", "user", "t")
    val right = Seq(("u", 10L, Some(5.0)), ("u", 20L, Option.empty[Double]))
      .toDF("user", "rt", "v")
    val out = AsOfJoin.asof(left, right, Seq("user"), "t", "rt", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    // latest right row (t=20) has v=NULL; a naive last(v, ignoreNulls)
    // would wrongly resurrect 5.0 from t=10
    assert(out(1L).isEmpty)
  }

  test("asof join attaches latest prior value, with >= tie semantics") {
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L), (4L, "v", 10L))
      .toDF("event_id", "user", "t")
    val right = Seq(("u", 10L, 1.0), ("u", 15L, 2.0), ("w", 1L, 9.0))
      .toDF("user", "rt", "v")
    val out = AsOfJoin.asof(left, right, Seq("user"), "t", "rt", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.0))  // tie at t=10 → right row visible
    assert(out(2L).contains(2.0))  // latest of {10,15}
    assert(out(3L).isEmpty)        // nothing at or before t=5
    assert(out(4L).isEmpty)        // no right rows for key v
  }

  test("asof forward attaches the earliest subsequent value, " +
    "with <= tie semantics") {
    val left = Seq((1L, "u", 10L), (2L, "u", 16L), (3L, "u", 20L), (4L, "v", 1L))
      .toDF("event_id", "user", "t")
    val right = Seq(("u", 10L, 1.0), ("u", 15L, 2.0), ("u", 18L, 3.0))
      .toDF("user", "rt", "v")
    val out = AsOfJoin.asof(left, right, Seq("user"), "t", "rt", Seq("v"),
        direction = "forward")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.0))  // tie at t=10 → simultaneous row matches
    assert(out(2L).contains(3.0))  // earliest of the future rows {18}
    assert(out(3L).isEmpty)        // nothing at or after t=20
    assert(out(4L).isEmpty)        // no right rows for key v
  }

  test("asof tolerance nulls matches farther than the bound, per direction") {
    val left = Seq((1L, "u", 12L), (2L, "u", 30L), (3L, "u", 14L))
      .toDF("event_id", "user", "t")
    val right = Seq(("u", 10L, 1.0), ("u", 15L, 2.0)).toDF("user", "rt", "v")
    def run(dir: String, tol: Double) =
      AsOfJoin.asof(left, right, Seq("user"), "t", "rt", Seq("v"),
          direction = dir, tolerance = Some(tol))
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    // backward: t=12→b@10 (d=2, in), t=30→b@15 (d=15, out), t=14→b@10 (d=4, out)
    assert(run("backward", 3.0) ==
      Map(1L -> Some(1.0), 2L -> None, 3L -> None))
    // nearest with tight tolerance: the NEAREST either qualifies or NULL —
    // t=14 nearest is f@15 (d=1, in); t=12 nearest is b@10 (d=2, out at 1.0)
    assert(run("nearest", 1.0) ==
      Map(1L -> None, 2L -> None, 3L -> Some(2.0)))
  }

  test("asof nearest picks the closer side; exact-distance ties go backward") {
    val left = Seq(
      (1L, "u", 12L),  // b@10 (d=2) vs f@15 (d=3) → backward 1.0
      (2L, "u", 14L),  // b@10 (d=4) vs f@15 (d=1) → forward 2.0
      (3L, "u", 5L),   // nothing before → forward 1.0
      (4L, "u", 99L),  // nothing after → backward 2.0
      (5L, "w", 13L))  // b@11 (d=2) vs f@15 (d=2): TIE → backward 7.0
      .toDF("event_id", "user", "t")
    val right = Seq(("u", 10L, 1.0), ("u", 15L, 2.0),
        ("w", 11L, 7.0), ("w", 15L, 8.0))
      .toDF("user", "rt", "v")
    val out = AsOfJoin.asof(left, right, Seq("user"), "t", "rt", Seq("v"),
        direction = "nearest")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(1.0),
      4L -> Some(2.0), 5L -> Some(7.0)))
  }
}
