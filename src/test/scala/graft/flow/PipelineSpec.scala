package graft.flow

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Success

class PipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("pipeline runs registered children and aggregates completion") {
    val dir = Files.createTempDirectory("graft_pipe").toString
    val p = new Pipeline("demo", spark)
    val df = spark.range(0, 10).toDF("v")
    p.sinkParquet("sink_a", df, s"$dir/a")
      .register("count_b")(assert(df.count() == 10))
    val results = p.run()
    assert(results.values.forall(_.isInstanceOf[Success[_]]))
    assert(spark.read.parquet(s"$dir/a").count() == 10)
  }

  test("one faulting child faults the pipeline and reports all failures") {
    val p = new Pipeline("faulty", spark)
    p.register("ok")(())
      .register("boom")(throw new RuntimeException("child exploded"))
      .register("boom2")(throw new RuntimeException("second"))
    val e = intercept[PipelineFaultedException](p.run())
    assert(e.child == "boom")
    assert(e.getMessage.contains("2/3 children failed"))
    assert(e.getCause.getMessage == "child exploded")
  }

  test("children run concurrently: two children must overlap to pass a barrier") {
    // each child blocks at a 2-party barrier — only concurrent execution
    // can release both; sequential execution would time out and fail
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def cross(): Unit = barrier.await(15, java.util.concurrent.TimeUnit.SECONDS)
    val p = new Pipeline("conc", spark)
    p.register("a")(cross())
      .register("b")(cross())
    val results = p.run()
    assert(results.values.forall(_.isInstanceOf[Success[_]]))
  }

  test("faults still aggregate deterministically under concurrency") {
    val p = new Pipeline("conc_faulty", spark)
    p.register("slow_boom") { Thread.sleep(300); throw new RuntimeException("slow") }
      .register("fast_boom")(throw new RuntimeException("fast"))
    val e = intercept[PipelineFaultedException](p.run())
    // registration order, not completion order, picks the reported child
    assert(e.child == "slow_boom")
    assert(e.getMessage.contains("2/2 children failed"))
  }

  test("statistics recorder counts rows past observation points (A19)") {
    val p = new Pipeline("stats", spark)
    val df = p.observed(spark.range(0, 42).toDF("v"), "ingested")
      .filter(col("v") < 10)
    val observed = p.observed(df, "kept")
    p.register("drain")(observed.write.mode("overwrite")
      .parquet(Files.createTempDirectory("graft_stats").toString + "/out"))
    p.run()
    assert(p.statistics("ingested") == 42)
    assert(p.statistics("kept") == 10)
    assert(p.statistics("never") == 0)
  }
}
