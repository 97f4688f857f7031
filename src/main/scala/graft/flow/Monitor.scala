package graft.flow

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** A22 flow-monitor parity: the reference logs per-block buffer counts on
  * an interval (`DataflowOptions.MonitorInterval`). Spark's equivalent
  * signal is per-stage task metrics — rows and shuffle bytes flowing
  * between pipeline stages — harvested here through a SparkListener.
  *
  * Use around a pipeline run:
  * {{{
  *   val mon = Monitor.attach(spark)
  *   pipeline.run()
  *   mon.report().foreach(println)   // stage → records/bytes/spill
  *   mon.detach()
  * }}}
  */
final class Monitor private (spark: SparkSession) {

  final case class StageStats(
      stageId: Int,
      name: String,
      tasks: Int,
      inputRecords: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      spillBytes: Long)

  private val stats = new ConcurrentLinkedQueue[StageStats]()

  private val listener = new SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      stats.add(StageStats(
        sc.stageInfo.stageId,
        sc.stageInfo.name.takeWhile(_ != '\n'),
        sc.stageInfo.numTasks,
        m.inputMetrics.recordsRead,
        m.shuffleReadMetrics.totalBytesRead,
        m.shuffleWriteMetrics.bytesWritten,
        m.memoryBytesSpilled + m.diskBytesSpilled))
    }
  }
  spark.sparkContext.addSparkListener(listener)

  /** Completed-stage metrics so far (oldest first). */
  def report(): Seq[StageStats] = {
    import scala.jdk.CollectionConverters._
    stats.asScala.toSeq
  }

  /** Total bytes that crossed a shuffle — the number to watch at 100 TB:
    * a pipeline whose shuffle volume approaches its input volume needs a
    * broadcast, bucketing, or pre-aggregation fix. */
  def totalShuffleBytes: Long = report().map(_.shuffleWriteBytes).sum

  def detach(): Unit = spark.sparkContext.removeSparkListener(listener)
}

object Monitor {
  def attach(spark: SparkSession): Monitor = new Monitor(spark)
}
