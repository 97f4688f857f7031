package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostics main: measures the per-batch cost of the streaming
  * near-dup store over a long synthetic history, with and without
  * maintenance folds — the number behind the claim that sidecar folds
  * keep trigger cost O(deltas + compacted) instead of O(history).
  *
  * Usage: runMain graft.MaintBench [batches] [rowsPerBatch]
  * Prints one line per mode: early/late per-batch wall times. Flat late
  * numbers in `folds` mode (vs growing in `nofold`) are the pass.
  */
object MaintBench {

  private def mkBatch(spark: SparkSession, b: Int, n: Int) = {
    val words = Array(
      "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
      "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango")
    val rows = (0 until n).map { i =>
      val id = b.toLong * 100000 + i
      val rnd = new scala.util.Random(id)
      val text = (0 until 60).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" ") + s" unique token $id"
      (id, text)
    }
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(50)
    val rows = args.lift(1).map(_.toInt).getOrElse(200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(maintainEvery: Int, label: String): Unit = {
      val store = java.nio.file.Files
        .createTempDirectory(s"graft_mb_$label").toString + "/sigs"
      val times = (0 until batches).map { b =>
        val df = mkBatch(spark, b, rows)
        // time the APPLY only: the claim under test is that folded history
        // keeps trigger cost flat; the fold itself is amortized background
        // work a real deployment schedules off the ingest path
        val t0 = System.nanoTime()
        graft.streaming.StreamOps.applyNearDupBatch(df, store, b.toLong).count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (maintainEvery > 0 && b % maintainEvery == maintainEvery - 1)
          graft.streaming.StreamOps.maintainNearDupStore(spark, store)
        dt
      }
      val pick = Seq(1, batches / 5, 2 * batches / 5, 3 * batches / 5,
        4 * batches / 5, batches - 1).distinct
      val fmt = java.util.Locale.ROOT
      println(s"RESULT $label: " +
        pick.map(i => String.format(fmt, "b%d=%.2f", Int.box(i),
          Double.box(times(i)))).mkString(" ") +
        String.format(fmt, " meanLastFifth=%.2f",
          Double.box(times.takeRight(batches / 5).sum / (batches / 5))))
    }
    run(8, "folds")
    run(0, "nofold")
    spark.stop()
  }
}
