package graft.queries

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-wave relational operators: pivot, ordered-set aggregates,
  * string aggregation, array explode, exact similarity pairs, extra
  * window ranks, null-handling scalars. All oracle-checked.
  */
object ExtendedQueries {

  val all: Seq[GraftQuery] = Seq(

    // Pivot: one column per o_orderstatus value. The DuckDB oracle uses
    // conditional aggregation — identical semantics and column names.
    GraftQuery(
      "q_pivot",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
             |  COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
             |  COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
             |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    // Ordered-set aggregates: exact interpolated percentiles + median.
    GraftQuery(
      "q_percentile",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
            round(expr("percentile(l_quantity, 0.25)"), 4).as("q25"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50,
             |  ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90,
             |  ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 4) AS q25
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // Approximate percentile sketch (GK-style) — the form users reach
    // for at 100 TB where exact percentile's full sort is off the table.
    // ORACLE-GATED (promoted r14, the adaptive-knob pattern): accuracy
    // is derived from COUNT(*) as 2N+1, which makes the GK summaries
    // RANK-EXACT — targetError = N/(2N+1) < 0.5, so no two samples can
    // merge and the returned value is precisely the element at rank
    // ceil(q·n) — and the oracle replays that rank convention with an
    // explicit ROW_NUMBER window (both engines compute ceil(q·n) with
    // the same IEEE double multiply). ONE sketch serves all three
    // quantiles, projected to SCALAR columns (the driver's pandas
    // compare cannot sort array cells — the r02 failure). Fixed-accuracy
    // production configs stay approximate by design;
    // ApproxPercentileSpec pins the ε-bound for accuracy=1000 AND that
    // the adaptive config equals exact rank selection. The accuracy
    // parameter is an Int — beyond ~10⁹ rows the adaptive config
    // saturates and the contract reverts to approximate, which is why
    // the oracle gate is declared for fixture scales (≤ sf10).
    GraftQuery(
      "q_approx_percentile",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val acc = math.min(2L * li.count() + 1L, Int.MaxValue.toLong)
        li.groupBy("l_returnflag")
          .agg(expr(
            s"approx_percentile(CAST(l_extendedprice AS DOUBLE), array(0.1, 0.5, 0.9), $acc)")
            .as("qs"))
          .select(
            col("l_returnflag"),
            expr("element_at(qs, 1)").as("p10_approx"),
            expr("element_at(qs, 2)").as("p50_approx"),
            expr("element_at(qs, 3)").as("p90_approx"))
          .orderBy("l_returnflag")
      },
      Some("""WITH v AS (SELECT l_returnflag,
             |            CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
             |r AS (SELECT l_returnflag, x,
             |        ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY x) AS rn,
             |        COUNT(*) OVER (PARTITION BY l_returnflag) AS n
             |      FROM v)
             |SELECT l_returnflag,
             |  MAX(CASE WHEN rn = CEIL(0.1*n) THEN x END) AS p10_approx,
             |  MAX(CASE WHEN rn = CEIL(0.5*n) THEN x END) AS p50_approx,
             |  MAX(CASE WHEN rn = CEIL(0.9*n) THEN x END) AS p90_approx
             |FROM r GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // String aggregation with deterministic order (sorted before join).
    GraftQuery(
      "q_string_agg",
      (s, d) =>
        Tables.nation(s, d)
          .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
          .orderBy("r_name"),
      Some("""SELECT r_name,
             |  string_agg(n_name, ',' ORDER BY n_name) AS nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1 ORDER BY r_name""".stripMargin)),

    // Array explode with ordinality (posexplode ↔ unnest WITH ORDINALITY).
    GraftQuery(
      "q_explode_pos",
      (s, d) =>
        Tables.embeddings(s, d)
          .filter(col("vec_id") < 10)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(
            col("vec_id"),
            (col("pos") + 1).as("pos"),
            round(col("v").cast("double"), 4).as("v"))
          .orderBy("vec_id", "pos"),
      // DuckDB 1.0 has no WITH ORDINALITY — lateral generate_series + index
      Some("""SELECT vec_id, CAST(pos AS INTEGER) AS pos,
             |       ROUND(CAST(embedding[pos] AS DOUBLE), 4) AS v
             |FROM embeddings,
             |     UNNEST(generate_series(1, len(embedding))) AS t(pos)
             |WHERE vec_id < 10
             |ORDER BY vec_id, pos""".stripMargin)),

    // Exact similarity pairs above a threshold — the brute-force ground
    // truth the LSH near-dup path approximates. Size-guarded: the operator
    // refuses to run its O(n²) join past maxRows, so the declared surface
    // carries no unbounded quadratic plan (corpus scale uses the
    // LSH-bucketed embeddingNearDup instead).
    GraftQuery(
      "q_sim_pairs",
      (s, d) =>
        graft.operators.Similarity.exactPairs(
            Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
            "vec_id", "embedding", threshold = 0.4)
          .orderBy("id_a", "id_b"),
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
             |                               CAST(b.embedding AS DOUBLE[])), 4) AS sim
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
             |                                   CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
             |ORDER BY id_a, id_b""".stripMargin)),

    // Distribution ranks: ntile / percent_rank / cume_dist.
    GraftQuery(
      "q_win_ntile",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
             |  ROUND(PERCENT_RANK() OVER w, 6) AS pr,
             |  ROUND(CUME_DIST() OVER w, 6) AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // Statistical aggregates: sample stddev/variance, correlation,
    // min/max. ROUND absorbs partial-aggregation order differences.
    GraftQuery(
      "q_agg_stats",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_linestatus")
          .agg(
            round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
            round(min(col("l_extendedprice")), 2).as("min_price"),
            round(max(col("l_extendedprice")), 2).as("max_price"))
          .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
             |  ROUND(var_samp(l_quantity), 4) AS var_qty,
             |  ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
             |  ROUND(MIN(l_extendedprice), 2) AS min_price,
             |  ROUND(MAX(l_extendedprice), 2) AS max_price
             |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin)),

    // Date/time arithmetic: differences, offsets, weekday extraction.
    GraftQuery(
      "q_date_arith",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            datediff(col("l_shipdate"), col("o_orderdate")).as("ship_days"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
            dayofweek(col("o_orderdate")).as("dow"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(date_diff('day', o_orderdate, l_shipdate) AS INTEGER) AS ship_days,
             |  o_orderdate + INTERVAL 30 DAY AS due_date,
             |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Scalar subquery: compare each row against a global aggregate.
    // Catalyst plans the subquery once and broadcasts the scalar.
    GraftQuery(
      "q_scalar_subquery",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_orders_sq")
        s.sql("""SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
                |FROM graft_orders_sq
                |WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM graft_orders_sq)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
             |FROM orders
             |WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // IN-subquery (semi-join decorrelation path).
    GraftQuery(
      "q_in_subquery",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_cust_in")
        Tables.nation(s, d).createOrReplaceTempView("graft_nation_in")
        Tables.region(s, d).createOrReplaceTempView("graft_region_in")
        s.sql("""SELECT c_custkey FROM graft_cust_in
                |WHERE c_nationkey IN (
                |  SELECT n_nationkey FROM graft_nation_in
                |  WHERE n_regionkey IN (
                |    SELECT r_regionkey FROM graft_region_in WHERE r_name = 'ASIA'))
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE c_nationkey IN (
             |  SELECT n_nationkey FROM nation
             |  WHERE n_regionkey IN (
             |    SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
             |ORDER BY c_custkey""".stripMargin)),

    // Pagination: LIMIT + OFFSET over a total order.
    GraftQuery(
      "q_limit_offset",
      (s, d) =>
        Tables.orders(s, d)
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .offset(100)
          .limit(20),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 20 OFFSET 100""".stripMargin)),

    // Post-aggregation filter (HAVING).
    GraftQuery(
      "q_having",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
          .filter(col("n") >= 40)
          .orderBy("l_partkey"),
      Some("""SELECT l_partkey, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
             |FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 40
             |ORDER BY l_partkey""".stripMargin)),

    // Deduplicating union (vs q_union_all's bag union).
    GraftQuery(
      "q_union_distinct",
      (s, d) =>
        Tables.customer(s, d).select(col("c_nationkey").as("nk"))
          .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
          .distinct()
          .orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer
             |UNION
             |SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin)),

    // Case-insensitive pattern match.
    GraftQuery(
      "q_ilike",
      (s, d) =>
        Tables.part(s, d)
          .filter(col("p_name").ilike("%RED%"))
          .select("p_partkey", "p_name")
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_name ILIKE '%RED%' ORDER BY p_partkey""".stripMargin)),

    // Sessionization with an exact oracle: gaps-and-islands (lag + running
    // sum of session starts) is plain window SQL both engines evaluate
    // identically — unlike session_window, which stays rows-only. Events
    // have unique (user_id, ts), so the island assignment is deterministic.
    GraftQuery(
      "q_sessionize",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_events_sess")
        s.sql("""SELECT user_id, session_id, COUNT(*) AS n, MIN(ts) AS session_start
                |FROM (
                |  SELECT user_id, ts,
                |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                |           ROWS UNBOUNDED PRECEDING) AS session_id
                |  FROM (
                |    SELECT user_id, ts,
                |           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                |                     > INTERVAL '30' MINUTE
                |                THEN 1 ELSE 0 END AS new_session
                |    FROM graft_events_sess))
                |GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)
      },
      Some("""SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |       COUNT(*) AS n, MIN(ts) AS session_start
             |FROM (
             |  SELECT user_id, ts,
             |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             |           ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM (
             |    SELECT user_id, ts,
             |           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                     > INTERVAL 30 MINUTE
             |                THEN 1 ELSE 0 END AS new_session
             |    FROM events))
             |GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)),

    // Cartesian product (small×small — the one place a cross join is fine).
    GraftQuery(
      "q_cross_join",
      (s, d) =>
        Tables.region(s, d).select(col("r_name").as("a"))
          .crossJoin(Tables.region(s, d).select(col("r_name").as("b")))
          .orderBy("a", "b"),
      Some("""SELECT r1.r_name AS a, r2.r_name AS b
             |FROM region r1 CROSS JOIN region r2
             |ORDER BY a, b""".stripMargin)),

    // String functions, second batch: trim/pad/case/replace/reverse/split.
    GraftQuery(
      "q_str_funcs2",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            translate(col("p_name"), "aeiou", "AEIOU").as("name_tr"),
            trim(col("p_type"), "E").as("type_trim"),
            lpad(col("p_brand"), 12, "*").as("brand_pad"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"),
            reverse(col("p_brand")).as("brand_rev"),
            split(col("p_name"), " ").getItem(0).as("first_tok"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  translate(p_name, 'aeiou', 'AEIOU') AS name_tr,
             |  trim(p_type, 'E') AS type_trim,
             |  lpad(p_brand, 12, '*') AS brand_pad,
             |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel,
             |  reverse(p_brand) AS brand_rev,
             |  string_split(p_name, ' ')[1] AS first_tok
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Unpivot (wide → long): stack() in Spark, UNION ALL in the oracle —
    // same rows either way.
    GraftQuery(
      "q_unpivot",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            expr("""stack(2,
                   |  'size', cast(p_size as double),
                   |  'retail', p_retailprice) as (metric, value)""".stripMargin))
          .orderBy("p_partkey", "metric"),
      Some("""SELECT p_partkey, metric, value FROM (
             |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
             |  UNION ALL
             |  SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part)
             |ORDER BY p_partkey, metric""".stripMargin)),

    // Boolean / conditional aggregates.
    GraftQuery(
      "q_bool_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            bool_and(col("l_quantity") > 0).as("all_positive"),
            bool_or(col("l_discount") > 0.09).as("any_big_discount"),
            count_if(col("l_tax") === 0).as("n_taxfree"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  bool_and(l_quantity > 0) AS all_positive,
             |  bool_or(l_discount > 0.09) AS any_big_discount,
             |  CAST(count_if(l_tax = 0) AS BIGINT) AS n_taxfree
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // Argmin/argmax aggregates: earliest/latest event id per user —
    // deterministic because (user_id, ts) is unique in the fixture.
    GraftQuery(
      "q_minmax_by",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            min_by(col("event_id"), col("ts")).as("first_event"),
            max_by(col("event_id"), col("ts")).as("last_event"))
          .orderBy("user_id"),
      Some("""SELECT user_id,
             |  min_by(event_id, ts) AS first_event,
             |  max_by(event_id, ts) AS last_event
             |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // Exact decimal aggregation: money math in DECIMAL is bit-exact across
    // engines (no partial-sum float tails, no ROUND discipline needed).
    GraftQuery(
      "q_decimal_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(
            col("l_returnflag"),
            col("l_extendedprice").cast("decimal(12,2)").as("price_dec"))
          .groupBy("l_returnflag")
          .agg(
            sum(col("price_dec")).cast("decimal(18,2)").as("sum_dec"),
            avg(col("price_dec")).cast("decimal(18,6)").as("avg_dec"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_dec,
             |  CAST(AVG(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,6)) AS avg_dec
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // Null-handling scalars over the as-of join's nullable output shape.
    GraftQuery(
      "q_null_funcs",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, col("o_custkey") === col("c_custkey"), "left")
          .groupBy("c_custkey")
          .agg(max(col("o_totalprice")).as("max_price"))
          .select(
            col("c_custkey"),
            coalesce(round(col("max_price"), 2), lit(-1.0)).as("max_or_default"),
            col("max_price").isNull.as("never_ordered"),
            nullif(round(col("max_price"), 0), lit(0.0)).isNull.as("zero_or_null"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  COALESCE(ROUND(max_price, 2), -1.0) AS max_or_default,
             |  max_price IS NULL AS never_ordered,
             |  NULLIF(ROUND(max_price, 0), 0.0) IS NULL AS zero_or_null
             |FROM (SELECT c_custkey, MAX(o_totalprice) AS max_price
             |      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |      GROUP BY 1)
             |ORDER BY c_custkey""".stripMargin)),
  )
}
