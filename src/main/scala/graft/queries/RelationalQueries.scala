package graft.queries

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scan / projection / filter / routing / sort-limit / set ops / scalar
  * functions — the map/filter/route surface of the reference
  * (DataflowEx `DataflowUtils.FromDelegate` map & flatMap, `LinkTo(target,
  * predicate)` routing, `LinkLeftTo` residue routing; see SURVEY.md §2.1
  * A5–A11) re-expressed as declarative Spark plans so Catalyst pushes
  * filters/projections into the parquet scan.
  *
  * Scale notes: all of these are narrow (no shuffle) except the
  * groupBy-counting route model and the set ops; those shuffle on their keys
  * which is unavoidable and correct. Nothing collects to the driver.
  */
object RelationalQueries {

  val all: Seq[GraftQuery] = Seq(

    // A24 source parity: a full scan folded to a count (parquet count uses
    // row-group metadata — no data read at all).
    GraftQuery(
      "q_scan_count",
      (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM lineitem")),

    // A5 map: arithmetic projection. Narrow; codegen'd; column-pruned scan.
    // Rounding note: prices×discounts land exactly on .xx5 halves, where
    // Spark's ROUND (decimal-string HALF_UP) and DuckDB's (IEEE on the
    // binary double) disagree — so both sides use floor(x*100 + 0.5)/100,
    // which is bit-identical across engines.
    GraftQuery(
      "q_project",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5) / 100)
              .as("net"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |       FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // A9 predicate link: filter. Both predicates reach the parquet scan as
    // PushedFilters.
    GraftQuery(
      "q_filter",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_quantity") < 10 && col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_quantity < 10 AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // A9–A11 multi-branch routing with residue (`LinkLeftTo`): modeled as a
    // single pass that tags each row with its branch (one scan, no
    // N-scans-for-N-branches — the Spark-native answer to guaranteed
    // fan-out routing), then counts per branch.
    GraftQuery(
      "q_route",
      (s, d) =>
        Tables.events(s, d)
          .withColumn(
            "branch",
            when(col("value") < 50, "low")
              .when(col("value") < 150, "mid")
              .otherwise("high"))
          .groupBy("branch")
          .agg(count(lit(1)).as("n"))
          .orderBy("branch"),
      Some("""SELECT CASE WHEN value < 50 THEN 'low'
             |            WHEN value < 150 THEN 'mid'
             |            ELSE 'high' END AS branch,
             |       COUNT(*) AS n
             |FROM events GROUP BY 1 ORDER BY branch""".stripMargin)),

    // Sort + limit: global top-k. Spark implements orderBy+limit as
    // TakeOrderedAndProject — per-partition heaps then a driver merge of k
    // rows per partition; no full sort at scale.
    GraftQuery(
      "q_topk",
      (s, d) =>
        Tables.orders(s, d)
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // A12 fan-in dual: bag-semantics union.
    GraftQuery(
      "q_union_all",
      (s, d) =>
        Tables.customer(s, d).select(col("c_custkey").as("k"))
          .unionAll(Tables.supplier(s, d).select(col("s_suppkey").as("k")))
          .orderBy("k"),
      Some("""SELECT k FROM (
             |  SELECT c_custkey AS k FROM customer
             |  UNION ALL
             |  SELECT s_suppkey AS k FROM supplier
             |) ORDER BY k""".stripMargin)),

    GraftQuery(
      "q_intersect",
      (s, d) =>
        Tables.customer(s, d).select(col("c_nationkey").as("nk"))
          .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
          .orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin)),

    // A27 visited-set subtraction (crawler loop) in relational form.
    GraftQuery(
      "q_except",
      (s, d) =>
        Tables.nation(s, d).select(col("n_nationkey").as("nk"))
          .except(Tables.customer(s, d).select(col("c_nationkey").as("nk")))
          .orderBy("nk"),
      Some("""SELECT n_nationkey AS nk FROM nation
             |EXCEPT
             |SELECT c_nationkey AS nk FROM customer ORDER BY nk""".stripMargin)),

    // A9 routing expression as a value (CASE).
    GraftQuery(
      "q_case_when",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            when(col("o_orderstatus") === "F", "done")
              .when(col("o_orderstatus") === "O", "open")
              .otherwise("part").as("status"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |       CASE o_orderstatus WHEN 'F' THEN 'done'
             |                          WHEN 'O' THEN 'open'
             |                          ELSE 'part' END AS status
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // A5 lambda parity: string functions (codegen'd built-ins, not UDFs).
    // LENGTH cast to BIGINT on the Spark side to match DuckDB's type.
    GraftQuery(
      "q_str_funcs",
      (s, d) =>
        Tables.part(s, d)
          .filter(col("p_name").like("%a%"))
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_name"), 1, 5).as("name5"),
            length(col("p_type")).cast("long").as("type_len"),
            regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u,
             |       SUBSTRING(p_name, 1, 5) AS name5,
             |       CAST(LENGTH(p_type) AS BIGINT) AS type_len,
             |       COALESCE(regexp_extract(p_name, '^(\w+)', 1), '') AS first_word
             |FROM part WHERE p_name LIKE '%a%'
             |ORDER BY p_partkey""".stripMargin)),

    // A5 lambda parity: date functions. DuckDB DATE_TRUNC returns DATE for
    // 'month' — cast back to TIMESTAMP to match Spark's timestamp_ntz.
    GraftQuery(
      "q_date_funcs",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_trunc("month", col("o_orderdate")).as("mstart"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
             |       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo,
             |       CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
             |       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mstart
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // A5 lambda parity: math functions. Spark FLOOR/CEIL return LONG; DuckDB
    // return DOUBLE — cast on the oracle side.
    GraftQuery(
      "q_math_funcs",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            round(sqrt(col("l_extendedprice")), 4).as("sq"),
            floor(col("l_quantity")).as("fl"),
            ceil(col("l_discount") * 100).as("ce"),
            abs(col("l_discount") - lit(0.05)).as("ab"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |       ROUND(SQRT(l_extendedprice), 4) AS sq,
             |       CAST(FLOOR(l_quantity) AS BIGINT) AS fl,
             |       CAST(CEIL(l_discount * 100) AS BIGINT) AS ce,
             |       ABS(l_discount - 0.05) AS ab
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // A16 nested/array access parity (element_at is 1-based in both).
    GraftQuery(
      "q_array_funcs",
      (s, d) =>
        Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            // nz: embedding elements are signed — a tiny negative one
            // rounds to -0.0 in DuckDB only (hazard class 4; the sf0.1
            // bitwise sweep caught exactly one such cell per column)
            graft.GraftQuery.nz(
              round(element_at(col("embedding"), 1).cast("double"), 4)).as("e1"),
            graft.GraftQuery.nz(
              round(element_at(col("embedding"), 64).cast("double"), 4)).as("e64"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |       CAST(LEN(embedding) AS INTEGER) AS dim,
             |       ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS e1,
             |       ROUND(CAST(embedding[64] AS DOUBLE), 4) + 0.0 AS e64
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // A26 JSON→object parity: extract a typed field from a JSON string
    // column (the reference demo parses JSON lines into POCOs).
    GraftQuery(
      "q_json_extract",
      (s, d) =>
        Tables.events(s, d)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // A14 batching over time: tumbling-window aggregation, batch-equivalent
    // form (the streaming variant shares this grouping; see graft.streaming).
    GraftQuery(
      "q_tumble",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(
            date_trunc("hour", col("ts")).as("ws"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
          .orderBy("ws", "event_type"),
      Some("""SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS ws, event_type,
             |       COUNT(*) AS n, ROUND(SUM(value), 2) AS sv
             |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin)),
  )
}
