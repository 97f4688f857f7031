package graft.queries

import graft.GraftQuery
import graft.GraftQuery.nz
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Fourth-wave relational coverage: full outer join, EXISTS/NOT EXISTS
  * decorrelation, linear-regression aggregates, ignore-nulls window
  * values, GROUPING() markers, bitwise aggregates, DISTINCT ON. All
  * oracle-checked.
  */
object CoverageQueries {

  val all: Seq[GraftQuery] = Seq(

    // Full outer join with per-side counts over partially-overlapping key
    // ranges (unmatched rows on BOTH sides survive).
    GraftQuery(
      "q_join_full",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_custkey") <= 50)
          .select("c_custkey", "c_nationkey")
        val sp = Tables.supplier(s, d)
          .filter(col("s_suppkey").between(30, 80))
          .select("s_suppkey", "s_nationkey")
        c.join(sp, col("c_custkey") === col("s_suppkey"), "full_outer")
          .groupBy(coalesce(col("c_nationkey"), col("s_nationkey")).as("nk"))
          .agg(count("c_custkey").as("nc"), count("s_suppkey").as("ns"))
          .orderBy("nk")
      },
      Some("""SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nk,
             |  COUNT(c.c_custkey) AS nc, COUNT(s.s_suppkey) AS ns
             |FROM (SELECT * FROM customer WHERE c_custkey <= 50) c
             |FULL OUTER JOIN (SELECT * FROM supplier WHERE s_suppkey BETWEEN 30 AND 80) s
             |  ON c.c_custkey = s.s_suppkey
             |GROUP BY 1 ORDER BY nk""".stripMargin)),

    // Correlated EXISTS (decorrelates to a left-semi join).
    GraftQuery(
      "q_exists",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_cust_ex")
        Tables.orders(s, d).createOrReplaceTempView("graft_ord_ex")
        s.sql("""SELECT c_custkey FROM graft_cust_ex c
                |WHERE EXISTS (SELECT 1 FROM graft_ord_ex o
                |              WHERE o.o_custkey = c.c_custkey
                |                AND o.o_totalprice > 400000)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    // Correlated NOT EXISTS (left-anti join path).
    GraftQuery(
      "q_not_exists",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_cust_nex")
        Tables.orders(s, d).createOrReplaceTempView("graft_ord_nex")
        s.sql("""SELECT c_custkey FROM graft_cust_nex c
                |WHERE NOT EXISTS (SELECT 1 FROM graft_ord_nex o
                |                  WHERE o.o_custkey = c.c_custkey)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // Linear-regression aggregates (slope/intercept/r²) + sample
    // covariance — same ROUND discipline as q_agg_stats' corr.
    GraftQuery(
      "q_regr",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_linestatus")
          .agg(
            // nz on all four: slope/intercept/covariance are signed, and
            // r2's fp error can dip below zero (hazard class 4)
            nz(round(expr("regr_slope(l_extendedprice, l_quantity)"), 4)).as("slope"),
            nz(round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4)).as("icept"),
            nz(round(expr("regr_r2(l_extendedprice, l_quantity)"), 6)).as("r2"),
            nz(round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)).as("cv"))
          .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  ROUND(regr_slope(l_extendedprice, l_quantity), 4) + 0.0 AS slope,
             |  ROUND(regr_intercept(l_extendedprice, l_quantity), 4) + 0.0 AS icept,
             |  ROUND(regr_r2(l_extendedprice, l_quantity), 6) + 0.0 AS r2,
             |  ROUND(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS cv
             |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin)),

    // first_value IGNORE NULLS / nth_value / full-frame last_value.
    GraftQuery(
      "q_win_firstlast",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_ord_fl")
        s.sql("""SELECT o_orderkey,
                |  FIRST_VALUE(NULLIF(o_orderstatus, 'P')) IGNORE NULLS OVER w AS fv,
                |  NTH_VALUE(o_orderstatus, 2) OVER w AS nv,
                |  LAST_VALUE(o_orderstatus) OVER
                |    (PARTITION BY o_orderpriority ORDER BY o_orderkey
                |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
                |FROM graft_ord_fl
                |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |  FIRST_VALUE(NULLIF(o_orderstatus, 'P') IGNORE NULLS) OVER w AS fv,
             |  NTH_VALUE(o_orderstatus, 2) OVER w AS nv,
             |  LAST_VALUE(o_orderstatus) OVER
             |    (PARTITION BY o_orderpriority ORDER BY o_orderkey
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // GROUPING() markers distinguish "NULL because subtotal" from data
    // NULLs in a rollup.
    GraftQuery(
      "q_grouping",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("graft_li_grp")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  CAST(GROUPING(l_returnflag) AS INT) AS g1,
                |  CAST(GROUPING(l_linestatus) AS INT) AS g2,
                |  COUNT(*) AS n
                |FROM graft_li_grp
                |GROUP BY ROLLUP (l_returnflag, l_linestatus)
                |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
          .stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g1,
             |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g2,
             |  COUNT(*) AS n
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Bitwise aggregates.
    GraftQuery(
      "q_bit_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            expr("bit_and(l_linenumber)").as("ba"),
            expr("bit_or(l_linenumber)").as("bo"),
            expr("bit_xor(l_linenumber)").as("bx"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  bit_and(l_linenumber) AS ba,
             |  bit_or(l_linenumber) AS bo,
             |  bit_xor(l_linenumber) AS bx
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // Recursive CTE (Spark 4): generate the nation-key spine recursively
    // and LEFT-join customer counts onto it.
    GraftQuery(
      "q_recursive_cte",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_cust_rec")
        s.sql("""WITH RECURSIVE spine(nk) AS (
                |  SELECT 0
                |  UNION ALL SELECT nk + 1 FROM spine WHERE nk < 24)
                |SELECT s.nk, COUNT(c_custkey) AS n_cust
                |FROM spine s LEFT JOIN graft_cust_rec ON c_nationkey = s.nk
                |GROUP BY s.nk ORDER BY s.nk""".stripMargin)
      },
      Some("""WITH RECURSIVE spine(nk) AS (
             |  SELECT 0
             |  UNION ALL SELECT nk + 1 FROM spine WHERE nk < 24)
             |SELECT s.nk, COUNT(c_custkey) AS n_cust
             |FROM spine s LEFT JOIN customer ON c_nationkey = s.nk
             |GROUP BY s.nk ORDER BY s.nk""".stripMargin)),

    // VARIANT (Spark 4 semi-structured type): parse_json → typed
    // variant_get extraction, verified against plain JSON extraction.
    GraftQuery(
      "q_variant",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_ev_var")
        s.sql("""SELECT event_id,
                |       variant_get(parse_json(props), '$.k', 'int') AS k
                |FROM graft_ev_var ORDER BY event_id""".stripMargin)
      },
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // explode_outer: null row for an empty array (collect → explode round
    // trip ≡ LEFT JOIN, which is exactly how the oracle states it).
    GraftQuery(
      "q_explode_outer",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_custkey") <= 20)
        val o = Tables.orders(s, d)
        c.join(o, col("o_custkey") === col("c_custkey"), "left")
          .groupBy("c_custkey")
          .agg(array_sort(collect_list(col("o_orderkey"))).as("keys"))
          .select(col("c_custkey"), explode_outer(col("keys")).as("o_orderkey"))
          .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
      },
      Some("""SELECT c_custkey, o_orderkey
             |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |WHERE c_custkey <= 20
             |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin)),

    // FILTER-clause aggregates (per-aggregate predicates, one pass).
    GraftQuery(
      "q_agg_filter",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("graft_li_filt")
        s.sql("""SELECT l_returnflag,
                |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
                |  ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
                |    AS disc_rev
                |FROM graft_li_filt GROUP BY 1 ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
             |  ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
             |    AS disc_rev
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // Event-time RANGE frame with an INTERVAL bound: sliding time-window
    // aggregates per row WITHOUT exploding rows into overlapping windows.
    GraftQuery(
      "q_win_time_range",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_ev_range")
        s.sql("""SELECT event_id,
                |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                |    AS n_hour
                |FROM graft_ev_range ORDER BY event_id""".stripMargin)
      },
      Some("""SELECT event_id,
             |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
             |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             |    AS n_hour
             |FROM events ORDER BY event_id""".stripMargin)),

    // Timestamp formatting: Spark Java patterns ↔ DuckDB strftime.
    GraftQuery(
      "q_date_format",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(
            date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
            date_format(col("o_orderdate"), "dd/MM/yyyy").as("dmy"))
          .agg(count(lit(1)).as("n"))
          .orderBy("ym", "dmy"),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             |       strftime(o_orderdate, '%d/%m/%Y') AS dmy,
             |       COUNT(*) AS n
             |FROM orders GROUP BY 1, 2 ORDER BY ym, dmy""".stripMargin)),

    // Deterministic hash sampling: a stable ~1/8 sample keyed on md5 of
    // the id — reproducible across runs and engines (unlike TABLESAMPLE),
    // the pattern for carving eval sets out of a 100 TB corpus.
    GraftQuery(
      "q_sample_hash",
      (s, d) =>
        Tables.orders(s, d)
          .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1)
            .isin("0", "1"))
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
             |ORDER BY o_orderkey""".stripMargin)),

    // Regex group extraction + match counting.
    GraftQuery(
      "q_regexp",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
            expr("regexp_count(p_name, 'e')").cast("int").as("n_e"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
             |  CAST(len(regexp_extract_all(p_name, 'e')) AS INTEGER) AS n_e
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Null-tolerant arithmetic: try_divide (NULL on zero divisor instead
    // of an ANSI error) ↔ NULLIF-guarded division. FLOOR-based rounding
    // on BOTH sides — engine ROUNDs disagree on exact .xx5 halves of
    // binary doubles (NOTES_r1 hazard 1).
    GraftQuery(
      "q_try_arith",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (floor(expr("try_divide(l_extendedprice, l_quantity - 25)") * 1000 + 0.5) / 1000)
              .as("unit_adj"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  FLOOR(l_extendedprice / NULLIF(l_quantity - 25, 0) * 1000 + 0.5) / 1000
             |    AS unit_adj
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Per-key top-k via the bounded-heap aggregate (TopKAgg): only k rows
    // per key per map partition cross the shuffle — no window sort. The
    // oracle states the equivalent row_number formulation.
    GraftQuery(
      "q_topk_agg",
      (s, d) =>
        graft.operators.TopK.perKey(
            Tables.orders(s, d),
            keys = Seq("o_orderpriority"),
            ordering = Seq("o_totalprice", "o_orderkey"),
            k = 3)
          .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
            col("o_orderkey").desc),
      Some("""SELECT o_orderpriority, o_totalprice, o_orderkey FROM (
             |  SELECT o_orderpriority, o_totalprice, o_orderkey,
             |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
             |  FROM orders) t WHERE rn <= 3
             |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey DESC""".stripMargin)),

    // Time-series gap fill: a generated day spine LEFT-joined against
    // sparse per-day aggregates, zero-filled — the standard shape for
    // dashboard-ready series (generated dimension, no source scan for the
    // spine).
    GraftQuery(
      "q_gap_fill",
      (s, d) => {
        val perDay = Tables.orders(s, d)
          .filter(col("o_totalprice") > 450000)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n_raw"))
        val spine = s.range(1).select(explode(expr(
          "sequence(to_date('1995-03-01'), to_date('1995-03-31'), interval 1 day)"))
          .as("day"))
        spine.join(perDay, Seq("day"), "left")
          .select(col("day"), coalesce(col("n_raw"), lit(0L)).as("n"))
          .orderBy("day")
      },
      Some("""WITH days AS (
             |  SELECT UNNEST(generate_series(DATE '1995-03-01', DATE '1995-03-31',
             |                                INTERVAL 1 DAY))::DATE AS day),
             |per_day AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_raw
             |  FROM orders WHERE o_totalprice > 450000 GROUP BY 1)
             |SELECT d.day, COALESCE(p.n_raw, 0) AS n
             |FROM days d LEFT JOIN per_day p USING (day)
             |ORDER BY d.day""".stripMargin)),

    // Edit distance (fuzzy matching for entity resolution pipelines).
    GraftQuery(
      "q_levenshtein",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            levenshtein(col("p_name"), col("p_type")).as("lev"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, CAST(levenshtein(p_name, p_type) AS INTEGER) AS lev
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Histogram bucketing: width_bucket in Spark, emulated with clamp +
    // floor math in the oracle (DuckDB 1.0 lacks width_bucket).
    GraftQuery(
      "q_histogram",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(expr("width_bucket(o_totalprice, 0, 600000, 6)").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("bucket"),
      Some("""SELECT CASE WHEN o_totalprice < 0 THEN 0
             |            WHEN o_totalprice >= 600000 THEN 7
             |            ELSE 1 + CAST(FLOOR(o_totalprice / 100000) AS BIGINT) END AS bucket,
             |       COUNT(*) AS n
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // DISTINCT ON-style pick: the single highest-value order per customer
    // (row_number = 1 compiles to a per-partition top-1, no full sort).
    GraftQuery(
      "q_distinct_on",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_ord_don")
        s.sql("""SELECT o_custkey, o_orderkey FROM (
                |  SELECT o_custkey, o_orderkey,
                |         ROW_NUMBER() OVER (PARTITION BY o_custkey
                |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
                |  FROM graft_ord_don) WHERE rn = 1
                |ORDER BY o_custkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey FROM (
             |  SELECT o_custkey, o_orderkey,
             |         ROW_NUMBER() OVER (PARTITION BY o_custkey
             |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t WHERE rn = 1
             |ORDER BY o_custkey""".stripMargin)),

    // Skew diagnosis report (Skew.report): the topN heaviest keys with
    // row share, ratio over the mean key size, and the integer-exact
    // salt bucket count that would level each — the numbers that decide
    // between broadcast, AQE and Skew.saltedJoin BEFORE a job ships.
    // Key-cardinality-sized after the first scan (count agg +
    // bounded-heap top-N + a 1-row totals broadcast).
    GraftQuery(
      "q_skew_report",
      (s, d) =>
        graft.operators.Skew.report(
            Tables.orders(s, d), Seq("o_orderstatus"), topN = 3)
          .orderBy("o_orderstatus"),
      Some("""WITH c AS (SELECT o_orderstatus, count(*) AS n
             |           FROM orders GROUP BY 1),
             |t AS (SELECT sum(n) AS total, count(*) AS keys FROM c),
             |r AS (SELECT o_orderstatus, n,
             |        row_number() OVER (ORDER BY n DESC, o_orderstatus DESC) AS rk
             |      FROM c)
             |SELECT o_orderstatus, n,
             |       ROUND(n / total, 6) AS share,
             |       ROUND(n * keys / total, 2) AS skew_ratio,
             |       CAST((n * keys + total - 1) // total AS BIGINT) AS suggested_salt
             |FROM r CROSS JOIN t WHERE rk <= 3
             |ORDER BY o_orderstatus""".stripMargin)),

    // Avro source proof, oracle-gated: lineitem → avro container files
    // (mapreduce output path, one file per partition) → block-splittable
    // avro read → aggregate. The oracle aggregates the ORIGINAL parquet,
    // so a hash match proves the write+read round-trip is lossless for
    // longs, ints, doubles, strings and local timestamps — the real
    // source machinery (graft.sources.Avro), not a re-read of parquet.
    GraftQuery(
      "q_avro_roundtrip",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_returnflag", "l_shipdate")
        val dir = graft.GraftQuery.tempDir("graft_avro_q") + "/t"
        graft.sources.Avro.write(li, dir)
        graft.sources.Avro.read(s, dir)
          .groupBy("l_returnflag")
          .agg(sum("l_quantity").as("sum_qty"),
            count(lit(1)).as("n"),
            max("l_shipdate").as("last_ship"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, sum(l_quantity) AS sum_qty,
             |       count(*) AS n, max(l_shipdate) AS last_ship
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Avro decimal logicalType, oracle-gated (VERDICT r14 item 4): money
    // math survives parquet → DECIMAL(12,2) cast → avro bytes-decimal
    // container files → avro read → exact decimal SUM. The oracle
    // aggregates the ORIGINAL parquet in DuckDB decimal arithmetic, so a
    // hash match proves the two's-complement unscaled round-trip is
    // bit-exact — the one §2.4b cut that was implementable offline.
    GraftQuery(
      "q_avro_decimal",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(
            col("l_returnflag"),
            col("l_extendedprice").cast("decimal(12,2)").as("price_dec"))
        val dir = graft.GraftQuery.tempDir("graft_avro_dec_q") + "/t"
        graft.sources.Avro.write(li, dir)
        graft.sources.Avro.read(s, dir)
          .groupBy("l_returnflag")
          .agg(
            sum(col("price_dec")).cast("decimal(18,2)").as("sum_dec"),
            min(col("price_dec")).cast("decimal(12,2)").as("min_dec"),
            max(col("price_dec")).cast("decimal(12,2)").as("max_dec"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_dec,
             |  CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS min_dec,
             |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS max_dec,
             |  count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
