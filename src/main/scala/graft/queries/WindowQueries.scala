package graft.queries

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function family. The reference has no window operators; its
  * per-key sequential processing (`DataDispatcher`, SURVEY.md §2.1 A13) and
  * running `StatisticsRecorder` counts (A19) are the lineage. Spark windows
  * shuffle once on the partition key, then sort within partitions — at
  * 100 TB the partition key (o_custkey) is high-cardinality so partitions
  * stay small and parallel; no global sort, no driver involvement.
  */
object WindowQueries {

  private val byCust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_win_rank",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            row_number().over(byCust).as("rn"),
            rank().over(byCust).as("rk"),
            dense_rank().over(byCust).as("drk"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
             |  CAST(RANK() OVER w AS INTEGER) AS rk,
             |  CAST(DENSE_RANK() OVER w AS INTEGER) AS drk
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // Running (prefix) sum — deterministic within-partition order makes the
    // double sum reproducible across engines.
    GraftQuery(
      "q_win_running",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            round(
              sum(col("o_totalprice"))
                .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
              2).as("run"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  ROUND(SUM(o_totalprice) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS UNBOUNDED PRECEDING), 2) AS run
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    GraftQuery(
      "q_win_leadlag",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            lag(col("o_totalprice"), 1).over(byCust).as("prev_price"),
            lead(col("o_totalprice"), 1).over(byCust).as("next_price"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  LAG(o_totalprice) OVER w AS prev_price,
             |  LEAD(o_totalprice) OVER w AS next_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // RANGE frame over a numeric ordering (peers included by value).
    GraftQuery(
      "q_win_range",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
          .rangeBetween(-1000, Window.currentRow)
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            round(sum(col("o_totalprice")).over(w), 2).as("near_sum"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  ROUND(SUM(o_totalprice) OVER (
             |    PARTITION BY o_custkey ORDER BY o_totalprice
             |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW), 2) AS near_sum
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // A13 per-key selection parity: top-3 orders per customer. row_number +
    // filter — Spark pushes the rank limit into the sort per partition.
    GraftQuery(
      "q_win_topk_pergroup",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (
             |  SELECT o_custkey, o_orderkey,
             |         ROW_NUMBER() OVER (PARTITION BY o_custkey
             |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),
  )
}
