package graft.flow

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Flow algebra — DataflowEx parity layer (SURVEY.md §2.1 A1–A14).
  *
  * The reference composes typed, reusable pipeline components
  * (`Dataflow<TIn,TOut>` wrapping TPL blocks) with `LinkTo`,
  * predicate routing, guaranteed broadcast, per-key dispatch and batching
  * [ref: Gridsum.DataflowEx/Dataflow.cs, DataflowUtils.cs — public repo].
  *
  * Spark-natively a pipeline stage is just a function
  * `Dataset[I] => Dataset[O]` composed lazily: "linking" builds a logical
  * plan, and Catalyst — not the component graph — decides physical
  * execution. That preserves the reference's component-reuse ergonomics
  * while gaining an optimizer it never had: filters written in a late stage
  * still push down into the scan, because composition is plan construction,
  * not message passing.
  *
  * Unlike TPL Dataflow, Spark preserves no global row order across
  * partitions; stages that need sequence semantics must say so explicitly
  * (`Flow.sorted`) — see SURVEY.md §7.5.
  */
trait Flow[I, O] extends Serializable { self =>

  def name: String

  /** Apply this stage to an input Dataset (plan construction — lazy). */
  def apply(in: Dataset[I]): Dataset[O]

  /** A8 LinkTo: compose two stages. Completion propagation is free —
    * downstream actions consume the composed plan. */
  def linkTo[O2](next: Flow[O, O2]): Flow[I, O2] = new Flow[I, O2] {
    val name = s"${self.name}->${next.name}"
    def apply(in: Dataset[I]): Dataset[O2] = next(self(in))
  }

  /** Alias mirroring the reference's fluent style. */
  def >>[O2](next: Flow[O, O2]): Flow[I, O2] = linkTo(next)
}

object Flow {

  /** A5 FromDelegate(TIn => TOut): typed map stage. */
  def map[I, O: Encoder](stageName: String)(f: I => O): Flow[I, O] =
    new Flow[I, O] {
      val name = stageName
      def apply(in: Dataset[I]): Dataset[O] = in.map(f)
    }

  /** A6 FromDelegate(TIn => IEnumerable[TOut]): typed flatMap stage. */
  def flatMap[I, O: Encoder](stageName: String)(f: I => IterableOnce[O]): Flow[I, O] =
    new Flow[I, O] {
      val name = stageName
      def apply(in: Dataset[I]): Dataset[O] = in.flatMap(f)
    }

  /** A9 predicate filter stage (declarative — pushes down). */
  def filter[I](stageName: String)(p: Column): Flow[I, I] =
    new Flow[I, I] {
      val name = stageName
      def apply(in: Dataset[I]): Dataset[I] = in.filter(p)
    }

  /** Columnar transform stage over DataFrames (the untyped fast path —
    * stays inside whole-stage codegen; prefer this over `map` for
    * relational work). */
  def select(stageName: String)(cols: Column*): Flow[org.apache.spark.sql.Row, org.apache.spark.sql.Row] =
    new Flow[org.apache.spark.sql.Row, org.apache.spark.sql.Row] {
      val name = stageName
      def apply(in: DataFrame): DataFrame = in.select(cols: _*)
    }

  /** A7 FromBlock escape hatch: wrap an arbitrary Dataset function. */
  def wrap[I, O](stageName: String)(f: Dataset[I] => Dataset[O]): Flow[I, O] =
    new Flow[I, O] {
      val name = stageName
      def apply(in: Dataset[I]): Dataset[O] = f(in)
    }

  /** Explicit ordering stage (the only place order is guaranteed —
    * SURVEY.md §7.5). */
  def sorted[I](stageName: String)(cols: Column*): Flow[I, I] =
    new Flow[I, I] {
      val name = stageName
      def apply(in: Dataset[I]): Dataset[I] = in.orderBy(cols: _*)
    }

  /** A14 batching: group rows into fixed-size batches within each
    * partition (the reference's BatchBlock before a bulk sink). Partial
    * batches flush at partition end — the batch boundary never crosses a
    * partition, so this is shuffle-free. */
  def batch[I: Encoder](stageName: String, size: Int)(implicit
      seqEnc: Encoder[Seq[I]]): Flow[I, Seq[I]] =
    new Flow[I, Seq[I]] {
      val name = stageName
      def apply(in: Dataset[I]): Dataset[Seq[I]] =
        in.mapPartitions(_.grouped(size).map(_.toSeq))
    }
}

/** A9–A11 routing: one pass tags every row with its branch; each branch is
  * a filter over the (optionally cached) tagged frame. `residue` models
  * `LinkLeftTo` — rows matching no predicate. `residueMustBeEmpty` models
  * `LinkLeftToError`.
  *
  * Scale note: N branches read ONE tagged pass (cache it for multi-action
  * consumption), instead of N scans of the source.
  */
final case class Router(branches: Seq[(String, Column)], tagCol: String = "graft_branch") {

  require(branches.nonEmpty, "Router needs at least one branch")

  private val residueTag = "__residue__"

  private def tagged(in: DataFrame): DataFrame = {
    val tag = branches.tail.foldLeft(when(branches.head._2, branches.head._1)) {
      case (acc, (n, p)) => acc.when(p, n)
    }.otherwise(residueTag)
    in.withColumn(tagCol, tag)
  }

  /** Route a DataFrame: returns branch-name → branch frame, plus residue.
    * Caches the tagged pass when more than one consumer will act on it. */
  def route(in: DataFrame, cache: Boolean = true): RoutedFlows = {
    val t = tagged(in)
    val shared = if (cache) t.persist() else t
    val bs = branches.map { case (n, _) =>
      n -> shared.filter(col(tagCol) === n).drop(tagCol)
    }.toMap
    RoutedFlows(bs, shared.filter(col(tagCol) === residueTag).drop(tagCol), shared)
  }
}

final case class RoutedFlows(
    branches: Map[String, DataFrame],
    residue: DataFrame,
    private val shared: DataFrame) {

  def apply(branch: String): DataFrame = branches(branch)

  /** A10 LinkLeftToError parity: fail fast if any row escaped routing. */
  def residueMustBeEmpty(): Unit = {
    val n = residue.count()
    require(n == 0, s"$n rows matched no routing predicate")
  }

  /** Release the cached tagged pass once all branches are consumed. */
  def unpersist(): Unit = shared.unpersist()
}

/** A12 DataBroadcaster: guaranteed fan-out. TPL's BroadcastBlock drops
  * messages for slow consumers; the reference fixed that with a copying
  * broadcaster. Spark-natively a cached plan IS a guaranteed broadcast —
  * every consumer re-reads the materialized partitions, nothing is dropped.
  */
object Broadcaster {
  def fanOut[T](in: Dataset[T], consumers: Int): Dataset[T] = {
    require(consumers >= 1)
    if (consumers > 1) in.persist() else in
  }
}

/** A13 DataDispatcher: dynamic partition-by-key sub-pipelines. The
  * reference lazily creates one child flow per distinct key (e.g. one
  * writer per log type). Spark-natively the per-key "child pipeline" is a
  * function applied inside one shuffle-partitioned pass — groupByKey +
  * flatMapGroups (typed) — or, for sinks, `write.partitionBy(key)` which
  * fans files out by key with no driver-side key enumeration.
  */
object Dispatcher {

  /** Per-key transform: one logical child pipeline per key, executed as a
    * single shuffled pass (no driver loop over keys — keys can number in
    * the millions at 100 TB). */
  def dispatch[T, K: Encoder, O: Encoder](in: Dataset[T], key: T => K)(
      child: (K, Iterator[T]) => IterableOnce[O]): Dataset[O] =
    in.groupByKey(key).flatMapGroups((k: K, it: Iterator[T]) => child(k, it))

  /** Sink form: fan out to one directory per key value. */
  def dispatchToSink(in: DataFrame, keyCol: String, path: String, format: String = "parquet"): Unit =
    in.write.partitionBy(keyCol).format(format).mode("overwrite").save(path)
}
