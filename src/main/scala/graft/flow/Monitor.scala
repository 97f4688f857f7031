package graft.flow

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** A22 flow-monitor parity: the reference logs per-block buffer counts on
  * an interval (`DataflowOptions.MonitorInterval`). Spark's equivalent
  * signal is per-stage task metrics — rows and shuffle bytes flowing
  * between pipeline stages — harvested here through a SparkListener.
  *
  * Scoping: a monitor can watch the whole session (default) or only the
  * work run inside [[monitored]], which tags jobs with a unique job group
  * so two pipelines on one session don't read each other's stages.
  * Failed stage attempts are skipped (a retried stage would otherwise
  * double-count its shuffle volume).
  *
  * Use around a pipeline run:
  * {{{
  *   val mon = Monitor.attach(spark)
  *   mon.monitored { pipeline.run() }
  *   mon.await()                     // listener bus is async
  *   mon.report().foreach(println)   // stage → records/bytes/spill
  *   mon.detach()
  * }}}
  */
final class Monitor private (spark: SparkSession, scopedOnly: Boolean) {

  final case class StageStats(
      stageId: Int,
      name: String,
      tasks: Int,
      inputRecords: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      spillBytes: Long)

  private val group = s"graft_monitor_${java.util.UUID.randomUUID().toString.take(8)}"
  private val stats = new ConcurrentLinkedQueue[StageStats]()
  private val groupStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  @volatile private var scoped = scopedOnly

  private val listener = new SparkListener {
    override def onJobStart(job: SparkListenerJobStart): Unit = {
      val g = Option(job.properties).map(_.getProperty("spark.jobGroup.id")).orNull
      if (g == group) job.stageIds.foreach(groupStages.add(_))
    }

    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val info = sc.stageInfo
      val inScope = !scoped || groupStages.contains(info.stageId)
      // taskMetrics is null for stages cancelled before any attempt ran;
      // failed attempts are skipped so retries don't double-count
      if (inScope && info.failureReason.isEmpty) {
        Option(info.taskMetrics).foreach { m =>
          stats.add(StageStats(
            info.stageId,
            info.name.takeWhile(_ != '\n'),
            info.numTasks,
            m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.memoryBytesSpilled + m.diskBytesSpilled))
        }
      }
    }
  }
  spark.sparkContext.addSparkListener(listener)

  /** Run `body` with this monitor's job group set: only stages of jobs
    * launched inside are recorded (and the monitor switches to scoped
    * mode permanently). */
  def monitored[T](body: => T): T = {
    scoped = true
    spark.sparkContext.setJobGroup(group, s"graft monitor $group")
    try body finally spark.sparkContext.clearJobGroup()
  }

  /** Wait for the async listener bus to deliver pending stage events:
    * returns once the recorded set is stable (unchanged across two 25 ms
    * polls, bounded). Call after the action, before report(). */
  def await(maxMs: Long = 5000): Unit = {
    val deadline = System.currentTimeMillis() + maxMs
    var prev = -1
    var stable = 0
    while (stable < 2 && System.currentTimeMillis() < deadline) {
      val now = stats.size()
      if (now == prev) stable += 1 else { stable = 0; prev = now }
      if (stable < 2) Thread.sleep(25)
    }
  }

  /** Completed-stage metrics so far (oldest first). Stage-completion
    * events arrive asynchronously — call [[await]] after the action
    * first. */
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
  /** `scopedOnly = true` records nothing until work runs inside
    * [[Monitor.monitored]] — use it when several monitors share a session
    * (otherwise each also records the others' work run before its first
    * monitored block). */
  def attach(spark: SparkSession, scopedOnly: Boolean = false): Monitor =
    new Monitor(spark, scopedOnly)
}
