package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks ("expectations"): run a list of
  * assertions against a table and get back one report row per check with
  * its violation count — the pre-flight gate a pipeline runs before
  * publishing a 100 TB table.
  *
  * Scale notes: every check is a whole-table aggregate; all
  * NotNull/condition checks fold into ONE pass (a single agg over
  * conditional counts). Unique pays one groupBy on its key; referential
  * integrity one anti-join against the (broadcast) dimension.
  */
object Quality {

  sealed trait Check { def name: String }
  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Check {
    val name = s"not_null_$col"
  }
  /** Row-level predicate (SQL boolean expression) that must hold. */
  final case class Satisfies(name: String, predicate: String) extends Check
  /** `cols` must uniquely identify a row. Violations = extra copies. */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique_${cols.mkString("_")}"
  }
  /** Every non-NULL `col` must exist in `dimCol` of `dim`. */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
    extends Check {
    val name = s"ref_${col}"
  }

  /** @return one row per check: (check, violations), check-list order
    *         preserved via an explicit sort column. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    // check names key the report (and the map literal the row checks fold
    // into) — a duplicate would surface as a runtime DUPLICATED_MAP_KEY
    // deep inside the plan instead of here
    val dupNames = checks.groupBy(_.name).collect { case (n, cs) if cs.size > 1 => n }
    require(dupNames.isEmpty,
      s"duplicate check names: ${dupNames.mkString(", ")} — every check needs a distinct name")
    // fold all single-pass row checks into one aggregate
    val rowChecks = checks.collect {
      case c: NotNull => c.name -> col(c.col).isNull
      case c: Satisfies => c.name -> !expr(c.predicate)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val parts: Seq[DataFrame] =
      (if (rowChecks.nonEmpty) {
        val aggs = rowChecks.map { case (n, viol) =>
          sum(when(viol, 1L).otherwise(0L)).as(n)
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        Seq(row.select(explode(map(
          rowChecks.flatMap { case (n, _) => Seq(lit(n), col(n)) }: _*))
          .as(Seq("check", "violations"))))
      } else Nil) ++
      checks.collect {
        case c: Unique =>
          df.groupBy(c.cols.map(col): _*).agg(count(lit(1)).as("graft_n"))
            .agg(coalesce(sum(col("graft_n") - 1), lit(0L)).as("violations"))
            .select(lit(c.name).as("check"), col("violations"))
        case c: RefIntegrity =>
          df.filter(col(c.col).isNotNull)
            .join(broadcast(c.dim.select(col(c.dimCol).as(c.col)).distinct()),
              Seq(c.col), "left_anti")
            .agg(count(lit(1)).as("violations"))
            .select(lit(c.name).as("check"), col("violations"))
      }
    val order = checks.map(_.name).zipWithIndex.toMap
    val orderUdf = order // small, serialized as literal map via when-chain
    val ordCol = orderUdf.foldLeft(lit(Int.MaxValue)) { case (acc, (n, i)) =>
      when(col("check") === n, lit(i)).otherwise(acc)
    }
    parts.reduce(_ unionByName _)
      .withColumn("graft_ord", ordCol)
      .orderBy("graft_ord")
      .drop("graft_ord")
  }

  /** Throw unless every check passes (the publish gate). */
  def enforce(df: DataFrame, checks: Seq[Check]): Unit = {
    val bad = report(df, checks).filter(col("violations") > 0)
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
    if (bad.nonEmpty) {
      throw new IllegalStateException(
        s"data-quality checks failed: ${bad.mkString(", ")}")
    }
  }
}
