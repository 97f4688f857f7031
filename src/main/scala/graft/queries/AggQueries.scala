package graft.queries

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Aggregation family. Reference lineage: `StatisticsRecorder` counts by
  * type/label (SURVEY.md §2.1 A19) and the demo AggregatorFlow's
  * group-by-key sum (A25). Spark-natively these are hash aggregates with
  * map-side partial aggregation — the shuffle moves one row per (partition,
  * group), not per input row, so group-by on low-cardinality keys is
  * scan-bound at 100 TB.
  *
  * Determinism discipline: double aggregates are ROUNDed on both sides and
  * every query ends in a total ORDER BY (SURVEY.md §7.4).
  */
object AggQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_agg_global",
      (s, d) =>
        Tables.lineitem(s, d).agg(
          count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty")),
      Some("""SELECT COUNT(*) AS n,
             |       ROUND(SUM(l_extendedprice), 2) AS sum_price,
             |       ROUND(AVG(l_quantity), 4) AS avg_qty
             |FROM lineitem""".stripMargin)),

    // Flagship (TPC-H Q1 shape): partial agg map-side, 6 aggregates in one
    // pass over the scan, 4-group output.
    GraftQuery(
      "q_agg_group",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |       ROUND(SUM(l_quantity), 2) AS sum_qty,
             |       ROUND(SUM(l_extendedprice), 2) AS sum_price,
             |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |       ROUND(AVG(l_quantity), 4) AS avg_qty,
             |       COUNT(*) AS n
             |FROM lineitem GROUP BY 1, 2
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    GraftQuery(
      "q_agg_distinct",
      (s, d) =>
        Tables.lineitem(s, d).agg(countDistinct(col("l_partkey")).as("n_parts")),
      Some("SELECT COUNT(DISTINCT l_partkey) AS n_parts FROM lineitem")),

    // Multiple distincts + plain aggregates in one grouping — Spark expands
    // to a multi-phase aggregate automatically.
    GraftQuery(
      "q_agg_multidistinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("np"),
            countDistinct(col("l_suppkey")).as("ns"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       COUNT(DISTINCT l_partkey) AS np,
             |       COUNT(DISTINCT l_suppkey) AS ns,
             |       COUNT(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // Note: the DataFrame rollup().agg().orderBy(groupCol) path trips
    // Spark's ambiguous-self-join detector on the grouping attributes, so
    // rollup/cube go through SQL (identical plan after analysis).
    GraftQuery(
      "q_agg_rollup",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_customer")
        Tables.nation(s, d).createOrReplaceTempView("graft_nation")
        s.sql("""SELECT /*+ BROADCAST(graft_nation) */
                |       n_name, c_mktsegment, COUNT(*) AS n
                |FROM graft_customer JOIN graft_nation ON c_nationkey = n_nationkey
                |GROUP BY ROLLUP (n_name, c_mktsegment)
                |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT n_name, c_mktsegment, COUNT(*) AS n
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP (n_name, c_mktsegment)
             |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin)),

    GraftQuery(
      "q_agg_cube",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_customer")
        Tables.nation(s, d).createOrReplaceTempView("graft_nation")
        s.sql("""SELECT /*+ BROADCAST(graft_nation) */
                |       n_name, c_mktsegment, COUNT(*) AS n
                |FROM graft_customer JOIN graft_nation ON c_nationkey = n_nationkey
                |GROUP BY CUBE (n_name, c_mktsegment)
                |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT n_name, c_mktsegment, COUNT(*) AS n
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY CUBE (n_name, c_mktsegment)
             |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin)),

    GraftQuery(
      "q_agg_gsets",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.createOrReplaceTempView("graft_gsets_lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
                |FROM graft_gsets_lineitem
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),
  )
}
