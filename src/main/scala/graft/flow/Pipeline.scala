package graft.flow

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** A1 Dataflow parity: a named graph container that registers child
  * stages/sinks, runs them, aggregates completion, and propagates faults.
  *
  * In the reference, `Dataflow` wraps TPL blocks and its CompletionTask
  * resolves when all registered children complete; one faulting block
  * faults the whole graph [ref: Gridsum.DataflowEx/Dataflow.cs — public
  * repo]. In Spark the plan is lazy, so "completion" is the set of actions
  * the pipeline owns: `run()` executes every registered action, returns
  * per-child outcomes, and (like the reference) fails the whole pipeline on
  * the first child fault while reporting every child's status.
  */
final class Pipeline(val name: String, spark: SparkSession) {

  private val children = mutable.ListBuffer.empty[(String, () => Unit)]
  private val recorder = new StatisticsRecorder(spark)

  /** A1 RegisterChild: add a named action (sink write, foreach, count…). */
  def register(childName: String)(action: => Unit): this.type = {
    children += (childName -> (() => action))
    this
  }

  /** Register a sink child writing a DataFrame as parquet. */
  def sinkParquet(childName: String, df: DataFrame, path: String): this.type =
    register(childName)(df.write.mode("overwrite").parquet(path))

  def statistics: StatisticsRecorder = recorder

  /** A19: wrap a frame so its row count is recorded when an action runs. */
  def observed(df: DataFrame, label: String): DataFrame = recorder.observed(df, label)

  /** Release session-level resources (the statistics listener). */
  def close(): Unit = recorder.close()

  /** Run all registered children CONCURRENTLY on a bounded pool,
    * aggregating completion and faults (A21). The reference's Dataflow
    * runs child blocks concurrently and its CompletionTask resolves when
    * all complete; here each child is a Spark action, so concurrency also
    * keeps the cluster busy while one child's driver-side phase idles
    * (Spark's scheduler interleaves jobs from multiple threads). Every
    * child runs to completion — aggregated, never short-circuited — then
    * the first fault IN REGISTRATION ORDER (deterministic under
    * concurrency) is rethrown wrapping every failure.
    *
    * @param maxConcurrency pool bound; defaults to 4 — enough overlap to
    *   hide per-child planning gaps without flooding the scheduler.
    */
  def run(maxConcurrency: Int = 4): Map[String, Try[Unit]] = {
    val snapshot = children.toList
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(maxConcurrency, snapshot.size)))
    val results =
      try {
        val futures = snapshot.map { case (n, action) =>
          n -> pool.submit(new java.util.concurrent.Callable[Try[Unit]] {
            override def call(): Try[Unit] = Try(action())
          })
        }
        futures.map { case (n, f) => n -> f.get() }
      } finally pool.shutdown()
    val failures = results.collect { case (n, Failure(e)) => (n, e) }
    if (failures.nonEmpty) {
      val (firstName, firstErr) = failures.head
      val summary = failures.map { case (n, e) => s"$n: ${e.getMessage}" }.mkString("; ")
      throw new PipelineFaultedException(
        s"pipeline '$name' faulted — ${failures.size}/${results.size} children failed [$summary]",
        firstName, firstErr)
    }
    results.toMap
  }
}

final class PipelineFaultedException(msg: String, val child: String, cause: Throwable)
  extends RuntimeException(msg, cause)

/** A19 StatisticsRecorder parity: record counts flowing past observation
  * points. The reference counts items by CLR type / event label as they
  * pass through; Spark-natively `Dataset.observe` accumulates metrics
  * inside the existing job — zero extra passes, zero extra shuffles — and a
  * QueryExecutionListener harvests them after each action.
  *
  * Each recorder owns a unique metric-name prefix, so two pipelines on
  * the same session never read each other's labels. Call `close()` (or
  * `Pipeline.close()`) when done — the listener otherwise stays
  * registered on the shared session for its lifetime.
  */
final class StatisticsRecorder(spark: SparkSession) {

  private val prefix =
    s"graft_stat_${java.util.UUID.randomUUID().toString.take(8)}_"
  private val counts = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (obsName, row) =>
        if (obsName.startsWith(prefix)) {
          val label = obsName.stripPrefix(prefix)
          counts.merge(label, row.getAs[Long]("n"), (a, b) => a + b)
        }
      }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
  }
  spark.listenerManager.register(listener)

  /** Attach an observation point (free — piggybacks on the next action). */
  def observed(df: DataFrame, label: String): DataFrame =
    df.observe(s"$prefix$label", count(lit(1)).as("n"))

  /** Unregister from the session's listener bus. */
  def close(): Unit = spark.listenerManager.unregister(listener)

  /** observe() metrics arrive via an async listener bus; wait until the
    * recorded state is quiescent (unchanged across two 25 ms polls,
    * bounded) so reads after an action see the counts — same contract as
    * the reference's post-completion queries. Cost ≈ 50 ms per read when
    * already quiescent. */
  private def awaitQuiescence(maxMs: Long = 5000): Unit = {
    val deadline = System.currentTimeMillis() + maxMs
    var prev = counts.hashCode()
    var stable = 0
    while (stable < 2 && System.currentTimeMillis() < deadline) {
      Thread.sleep(25)
      val now = counts.hashCode()
      if (now == prev) stable += 1 else { stable = 0; prev = now }
    }
  }

  /** Indexer parity: recorded count for a label (0 if never observed). */
  def apply(label: String): Long = {
    awaitQuiescence()
    counts.getOrDefault(label, 0L)
  }

  def snapshot: Map[String, Long] = {
    awaitQuiescence()
    import scala.jdk.CollectionConverters._
    counts.asScala.toMap
  }
}
