package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations evaluated in ONE pass — the
  * contract-check stage a training-data pipeline runs before it trusts a
  * batch (the deequ/Great-Expectations role, Spark-first).
  *
  * Every check compiles to an aggregate expression over the SAME
  * `df.agg(...)`: one scan, map-side partial aggregation, one single-row
  * result regardless of input size — the only exchange carries a handful
  * of doubles. Uniqueness checks add count-distincts, which Catalyst
  * plans as an Expand over the same scan (grouping-sets style), still
  * never a second read of the data. The per-check report rows are then
  * unpacked from that single row with an explode of literal structs —
  * narrow, no join, no driver round-trip.
  *
  * Determinism across engines (the q_expectations oracle replays every
  * metric in DuckDB): all ratio metrics are exact-integer counts divided
  * once — IEEE-identical in any engine — and threshold predicates are
  * evaluated on the UNROUNDED metric on both sides, with rounding applied
  * only to the reported value.
  *
  * Empty-input semantics: ratio checks pass vacuously (metric 1.0);
  * `MeanBetween` has no mean to test and FAILS (null metric) — silently
  * passing an empty batch is how a dead upstream goes unnoticed.
  */
object Expectations {

  sealed trait Expectation { def column: String }

  /** Non-null fraction of `column` must be >= `minRatio`. */
  final case class Complete(column: String, minRatio: Double) extends Expectation

  /** Every non-null value distinct (metric = distinct / non-null). */
  final case class Unique(column: String) extends Expectation

  /** Every non-null value inside [lo, hi] (metric = in-range fraction). */
  final case class Between(column: String, lo: Double, hi: Double)
    extends Expectation

  /** Column mean inside [lo, hi]. */
  final case class MeanBetween(column: String, lo: Double, hi: Double)
    extends Expectation

  /** Fraction of non-null values matching `regex` >= `minRatio`. */
  final case class MatchesRegex(column: String, regex: String, minRatio: Double)
    extends Expectation

  /** Fraction of non-null values in `allowed` >= `minRatio`. */
  final case class MemberOf(
      column: String, allowed: Seq[String], minRatio: Double)
    extends Expectation

  /** Fraction of rows (treating null as 0/1-valued predicate input) for
    * which `pred` holds among non-null evaluations. */
  private def fraction(pred: Column, nonNull: Column): Column =
    coalesce(
      avg(when(nonNull.isNull, lit(null))
        .otherwise(when(pred, 1.0d).otherwise(0.0d))),
      lit(1.0d))

  /** Evaluate all `checks` over `df` in one pass. Output: one row per
    * check — (check_name, column_name, metric DOUBLE rounded 6, passed
    * BOOLEAN), ordered by check_name. */
  def evaluate(df: DataFrame, checks: Seq[Expectation]): DataFrame =
    evaluateBy(df, Nil, checks)

  /** Per-SEGMENT evaluation: the same one-pass compilation, grouped —
    * one report row per (group, check), the shape that catches a
    * quality collapse in ONE language or ONE source that the global
    * averages smooth over. Group count bounds the output (report rows =
    * groups × checks); the scan/shuffle shape is an ordinary grouped
    * aggregate. Empty `groupCols` degenerates to the global
    * [[evaluate]]. */
  def evaluateBy(
      df: DataFrame,
      groupCols: Seq[String],
      checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "no expectations given")
    val compiled: Seq[(String, String, Column, Column => Column)] =
      checks.map {
        case Complete(c, r) =>
          // try_divide: an empty input has count 0 and must fall to the
          // vacuous-pass coalesce, not an ANSI divide-by-zero
          (s"complete($c)", c,
            coalesce(try_divide(count(col(c)).cast("double"), count(lit(1))),
              lit(1.0d)),
            (m: Column) => m >= lit(r))
        case Unique(c) =>
          (s"unique($c)", c,
            coalesce(
              try_divide(countDistinct(col(c)).cast("double"), count(col(c))),
              lit(1.0d)),
            (m: Column) => m === lit(1.0d))
        case Between(c, lo, hi) =>
          (s"between($c)", c,
            fraction(col(c) >= lit(lo) && col(c) <= lit(hi), col(c)),
            (m: Column) => m === lit(1.0d))
        case MeanBetween(c, lo, hi) =>
          (s"mean_between($c)", c, avg(col(c)).cast("double"),
            (m: Column) => m >= lit(lo) && m <= lit(hi))
        case MatchesRegex(c, re, r) =>
          (s"matches_regex($c)", c,
            fraction(col(c).rlike(re), col(c)),
            (m: Column) => m >= lit(r))
        case MemberOf(c, allowed, r) =>
          (s"member_of($c)", c,
            fraction(col(c).isin(allowed.map(x => x: Any): _*), col(c)),
            (m: Column) => m >= lit(r))
      }
    require(compiled.map(_._1).distinct.size == compiled.size,
      "duplicate checks: " + compiled.map(_._1).mkString(", "))
    val metrics = compiled.zipWithIndex.map { case ((_, _, m, _), i) =>
      m.as(s"graft_m$i")
    }
    val agg =
      if (groupCols.isEmpty) df.agg(metrics.head, metrics.tail: _*)
      else df.groupBy(groupCols.map(col): _*)
        .agg(metrics.head, metrics.tail: _*)
    val reportRows = compiled.zipWithIndex.map { case ((name, c, _, pass), i) =>
      val m = col(s"graft_m$i")
      struct(
        lit(name).as("check_name"),
        lit(c).as("column_name"),
        round(m, 6).as("metric"),
        coalesce(pass(m), lit(false)).as("passed"))
    }
    agg.select(groupCols.map(col) :+ explode(array(reportRows: _*)).as("r"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("r.check_name"), col("r.column_name"),
        col("r.metric"), col("r.passed")): _*)
      .orderBy(groupCols.map(col) :+ col("check_name"): _*)
  }
}
