package graft.queries

import graft.GraftQuery
import graft.GraftQuery.nz
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators over the `events` table: ordered funnel
  * conversion, cohort retention, Markov transitions, stratified sampling —
  * plus higher-moment statistics and PII redaction. All oracle-gated.
  *
  * Scale notes (100 TB): every query shuffles on `user_id` (or the group
  * key) exactly as many times as it has aggregation levels; the funnel's
  * three stage-joins are all co-partitioned on user_id so AQE plans them
  * as one exchange reuse. Nothing collects; nothing is quadratic.
  */
object AnalyticsQueries {

  val all: Seq[GraftQuery] = Seq(

    // Ordered funnel: first view → first click within 24h → first
    // purchase within 72h of the click. The classic "did the user
    // convert, in order, within windows" analytics operator. Stage
    // frames are per-user minima (one groupBy each), joined
    // co-partitioned on user_id.
    GraftQuery(
      "q_funnel",
      (s, d) => {
        val e = Tables.events(s, d)
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val c = e.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") > col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts") > col("t2") &&
            col("ts") <= col("t2") + expr("INTERVAL 72 HOURS"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
             |           WHERE event_type='view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
             |      WHERE event_type='click' AND e.ts > v.t1
             |        AND e.ts <= v.t1 + INTERVAL 24 HOUR GROUP BY 1),
             |p AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
             |      WHERE event_type='purchase' AND e.ts > c.t2
             |        AND e.ts <= c.t2 + INTERVAL 72 HOUR GROUP BY 1)
             |SELECT (SELECT count(*) FROM v) AS n_view,
             |       (SELECT count(*) FROM c) AS n_click,
             |       (SELECT count(*) FROM p) AS n_purchase""".stripMargin)),

    // Cohort retention: users grouped by first-seen week, distinct-user
    // counts per (cohort week, weeks since). Two shuffles: the first-seen
    // aggregate and the final distinct count.
    GraftQuery(
      "q_cohort",
      (s, d) => {
        val e = Tables.events(s, d)
        val fw = e.groupBy("user_id").agg(date_trunc("week", min("ts")).as("cw"))
        e.join(fw, "user_id")
          .select(
            col("cw").cast("date").as("cohort_week"),
            (datediff(date_trunc("week", col("ts")).cast("date"),
              col("cw").cast("date")) / 7).cast("int").as("week_offset"),
            col("user_id"))
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH fw AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
             |            FROM events GROUP BY 1)
             |SELECT CAST(cw AS DATE) AS cohort_week,
             |       CAST(datediff('day', cw, date_trunc('week', e.ts))/7 AS INT) AS week_offset,
             |       count(DISTINCT e.user_id) AS n_users
             |FROM events e JOIN fw USING (user_id)
             |GROUP BY 1,2 ORDER BY cohort_week, week_offset""".stripMargin)),

    // Markov transition counts: (previous event type → current) per user
    // session order. One window shuffle on user_id + one small aggregate.
    GraftQuery(
      "q_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("event_type"), lag("event_type", 1).over(w).as("prev"))
          .filter(col("prev").isNotNull)
          .groupBy("prev", "event_type")
          .agg(count(lit(1)).as("n"))
          .select(col("prev"), col("event_type").as("curr"), col("n"))
          .orderBy("prev", "curr")
      },
      Some("""SELECT prev, event_type AS curr, count(*) AS n FROM (
             |  SELECT event_type,
             |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events) t
             |WHERE prev IS NOT NULL GROUP BY 1,2 ORDER BY prev, curr""".stripMargin)),

    // PageRank over the event-type transition graph (operators/Graph
    // .scala): 3 fixed iterations of the standard two-shuffle-per-
    // iteration plan, ranks rounded at every iteration boundary so the
    // oracle's unrolled replay crosses each rounding boundary
    // identically. The oracle unrolls the iterations as chained CTEs
    // (recursive CTEs cannot aggregate in the recursive term).
    // (1 − d) is spelled CAST(1 AS DOUBLE) − 0.85 in SQL so both engines
    // compute the identical IEEE value (DuckDB's bare 0.15 is DECIMAL).
    GraftQuery(
      "q_pagerank",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val edges = Tables.events(s, d)
          .select(col("event_type"), lag("event_type", 1).over(w).as("prev"))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev").as("src"), col("event_type").as("dst"))
          .agg(count(lit(1)).cast("double").as("w"))
        graft.operators.Graph.pageRank(edges, "src", "dst", "w", iterations = 3)
          .select(col("node"), round(col("rank"), 6).as("rank"))
          .orderBy("node")
      },
      Some("""WITH t AS (SELECT event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS prev FROM events),
             |edges AS (SELECT prev AS src, event_type AS dst,
             |            CAST(count(*) AS DOUBLE) AS w
             |          FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
             |nodes AS (SELECT src AS node FROM edges
             |          UNION SELECT dst FROM edges),
             |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
             |norm AS (SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p
             |         FROM edges),
             |r0 AS (SELECT node, ROUND(1.0 / n, 9) AS rank
             |       FROM nodes CROSS JOIN nn),
             |r1 AS (SELECT nodes.node,
             |         ROUND((CAST(1 AS DOUBLE) - 0.85) / nn.n
             |           + 0.85 * COALESCE(c.cin, 0), 9) AS rank
             |       FROM nodes CROSS JOIN nn
             |       LEFT JOIN (SELECT norm.dst AS node, sum(r.rank * norm.p) AS cin
             |                  FROM norm JOIN r0 r ON norm.src = r.node
             |                  GROUP BY 1) c ON c.node = nodes.node),
             |r2 AS (SELECT nodes.node,
             |         ROUND((CAST(1 AS DOUBLE) - 0.85) / nn.n
             |           + 0.85 * COALESCE(c.cin, 0), 9) AS rank
             |       FROM nodes CROSS JOIN nn
             |       LEFT JOIN (SELECT norm.dst AS node, sum(r.rank * norm.p) AS cin
             |                  FROM norm JOIN r1 r ON norm.src = r.node
             |                  GROUP BY 1) c ON c.node = nodes.node),
             |r3 AS (SELECT nodes.node,
             |         ROUND((CAST(1 AS DOUBLE) - 0.85) / nn.n
             |           + 0.85 * COALESCE(c.cin, 0), 9) AS rank
             |       FROM nodes CROSS JOIN nn
             |       LEFT JOIN (SELECT norm.dst AS node, sum(r.rank * norm.p) AS cin
             |                  FROM norm JOIN r2 r ON norm.src = r.node
             |                  GROUP BY 1) c ON c.node = nodes.node)
             |SELECT node, ROUND(rank, 6) AS rank FROM r3 ORDER BY node""".stripMargin)),

    // Stratified deterministic sampling: a different hash-sample rate per
    // stratum (event_type), reproducible across engines — how a 100 TB
    // corpus gets a class-balanced eval carve-out without TABLESAMPLE's
    // nondeterminism. Hex-prefix of md5(id) < per-stratum bound ⇒ rates
    // 1/2, 1/4, 1 (all), 1/8, 1/16.
    GraftQuery(
      "q_stratified_sample",
      (s, d) => {
        val bound = when(col("event_type") === "view", lit("8"))
          .when(col("event_type") === "click", lit("4"))
          .when(col("event_type") === "purchase", lit("g"))
          .when(col("event_type") === "signup", lit("2"))
          .otherwise(lit("1"))
        Tables.events(s, d)
          .filter(substring(md5(col("event_id").cast("string")), 1, 1) < bound)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_sampled"), round(avg("value"), 4).as("avg_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n_sampled,
             |       ROUND(avg(value), 4) AS avg_value
             |FROM events
             |WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) <
             |      CASE event_type WHEN 'view' THEN '8' WHEN 'click' THEN '4'
             |        WHEN 'purchase' THEN 'g' WHEN 'signup' THEN '2' ELSE '1' END
             |GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // Deterministic per-group reservoir sample: bottom-k by md5 of the
    // unique id ≡ uniform k-sample, reproducible across engines, and run
    // on the bounded-heap TopKAgg (map-side partial — the shuffle carries
    // k rows per group, no window sort; the oracle's row_number spells
    // out the same cut).
    GraftQuery(
      "q_reservoir_sample",
      (s, d) =>
        graft.operators.TopK.sampleKPerKey(
          Tables.orders(s, d), Seq("o_orderpriority"), Seq("o_orderkey"), k = 5)
          .orderBy("o_orderpriority", "o_orderkey"),
      Some("""SELECT o_orderpriority, o_orderkey FROM (
             |  SELECT o_orderpriority, o_orderkey,
             |         row_number() OVER (PARTITION BY o_orderpriority
             |           ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rk
             |  FROM orders) t
             |WHERE rk <= 5 ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // Higher central moments: population skewness and excess kurtosis per
    // group (Spark's skewness/kurtosis definitions). The oracle computes
    // the same moments two-pass-centered (join group mean, then average
    // centered powers) — numerically stable where raw-power expansion
    // catastrophically cancels at price⁴ magnitudes.
    GraftQuery(
      "q_stats_moments",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_linestatus")
          .agg(
            // nz: skew/excess-kurtosis are signed (hazard class 4)
            nz(round(skewness(col("l_extendedprice")), 4)).as("skew"),
            nz(round(kurtosis(col("l_extendedprice")), 4)).as("kurt"))
          .orderBy("l_linestatus"),
      Some("""WITH mu AS (SELECT l_linestatus AS g, avg(l_extendedprice) AS m
             |            FROM lineitem GROUP BY 1)
             |SELECT l_linestatus,
             |  ROUND(avg(pow(l_extendedprice - m, 3))
             |        / pow(avg(pow(l_extendedprice - m, 2)), 1.5), 4) + 0.0 AS skew,
             |  ROUND(avg(pow(l_extendedprice - m, 4))
             |        / pow(avg(pow(l_extendedprice - m, 2)), 2) - 3, 4) + 0.0 AS kurt
             |FROM lineitem JOIN mu ON l_linestatus = mu.g
             |GROUP BY 1 ORDER BY l_linestatus""".stripMargin)),

    // PII redaction: scrub synthetic emails/phones from documents (every
    // third doc gets PII planted so the null case is exercised too), and
    // count what was found. Narrow codegen'd regex pass — the shape of a
    // 100 TB scrubbing job. Patterns stay in the RE2 ∩ Java-regex
    // dialect intersection.
    GraftQuery(
      "q_pii_redact",
      (s, d) => {
        val synth = when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example now or call 555-"),
            lpad(col("doc_id").cast("string"), 4, "0")))
          .otherwise(col("text"))
        val emailPat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
        val phonePat = "555-[0-9]{4}"
        Tables.documents(s, d)
          .select(col("doc_id"), synth.as("synth"))
          .select(
            col("doc_id"),
            regexp_replace(regexp_replace(col("synth"), emailPat, "[EMAIL]"),
              phonePat, "[PHONE]").as("redacted"),
            size(regexp_extract_all(col("synth"), lit(emailPat), lit(0)))
              .as("n_emails"),
            size(regexp_extract_all(col("synth"), lit(phonePat), lit(0)))
              .as("n_phones"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  regexp_replace(regexp_replace(synth, '[a-z0-9]+@[a-z]+\.[a-z]+', '[EMAIL]', 'g'),
             |                 '555-[0-9]{4}', '[PHONE]', 'g') AS redacted,
             |  CAST(len(regexp_extract_all(synth, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS INT) AS n_emails,
             |  CAST(len(regexp_extract_all(synth, '555-[0-9]{4}')) AS INT) AS n_phones
             |FROM (SELECT doc_id,
             |        CASE WHEN doc_id % 3 = 0
             |          THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
             |               || '@mail.example now or call 555-'
             |               || lpad(CAST(doc_id AS VARCHAR), 4, '0')
             |          ELSE text END AS synth
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // IQR outlier detection (Tukey fences) per event type: flag values
    // above q3 + 1.5·IQR. Quantiles are EXACT order statistics (the
    // deterministic choice — stddev-based z-scores would hinge on
    // accumulation order), the per-group fence table is tiny and
    // broadcast, and the fence is rounded to cents so a last-ulp
    // interpolation difference between engines cannot move it. The
    // detection pass is then one broadcast join over the fact scan — at
    // 100 TB the only full-data cost is the quantile aggregation itself.
    GraftQuery(
      "q_outliers",
      (s, d) => {
        val e = Tables.events(s, d)
        val fences = e.groupBy("event_type").agg(
          expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.75)").as("q3"))
          .select(col("event_type"),
            round(col("q3") + lit(1.5) * (col("q3") - col("q1")), 2).as("fence"))
        e.join(broadcast(fences), Seq("event_type"))
          .filter(col("value") > col("fence"))
          .select(col("event_id"), col("event_type"), col("value"), col("fence"))
          .orderBy("event_id")
      },
      Some("""WITH f AS (SELECT event_type,
             |  ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY value) +
             |        1.5*(percentile_cont(0.75) WITHIN GROUP (ORDER BY value) -
             |             percentile_cont(0.25) WITHIN GROUP (ORDER BY value)), 2) AS fence
             |  FROM events GROUP BY 1)
             |SELECT event_id, event_type, value, fence
             |FROM events JOIN f USING (event_type)
             |WHERE value > fence ORDER BY event_id""".stripMargin)),

    // 2D Pareto frontier (Skyline.pareto2D): lineitem points maximizing
    // (quantity, price) — multi-objective selection with NO dominance
    // self-join and NO global sort: a 256-bucket grid prefilter
    // (two bounded aggregates + one broadcast-threshold scan filter)
    // leaves a thin sliver; the exact sweep runs driver-side under the
    // bounded-candidates contract. The oracle exploits frontier ⊆
    // per-x maxima (any point below its x's max price is dominated by
    // that max, strictly in y), so its NOT EXISTS runs over ≤50 rows,
    // not 60k².
    GraftQuery(
      "q_skyline",
      (s, d) =>
        graft.operators.Skyline.pareto2D(
          Tables.lineitem(s, d), "l_quantity", "l_extendedprice")
          .select(col("l_quantity").as("qty"), col("l_extendedprice").as("price"))
          .orderBy("qty"),
      Some("""WITH m AS (SELECT CAST(l_quantity AS DOUBLE) AS qty,
             |                  CAST(MAX(l_extendedprice) AS DOUBLE) AS price
             |           FROM lineitem GROUP BY 1)
             |SELECT qty, price FROM m a
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM m b WHERE b.qty >= a.qty AND b.price >= a.price
             |    AND (b.qty > a.qty OR b.price > a.price))
             |ORDER BY qty""".stripMargin)),

    // Distribution drift (PSI) between two snapshots — the monitoring
    // step of a continuously-ingested corpus: one clearly-drifted pair
    // (quantity truncated at 40) and one stable control (random-subset
    // snapshot, same distribution). Fixed [1,51) 10-bucket edges keep
    // bucketing deterministic across engines; the oracle replays the
    // identical proportion/log arithmetic. Scale shape per metric: two
    // ≤10-row bucket aggregates, a bucket join, one scalar fold.
    GraftQuery(
      "q_drift_psi",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        def m(name: String, cur: org.apache.spark.sql.DataFrame) =
          graft.operators.Drift.psi(li, cur, "l_quantity", 10, 1.0, 51.0)
            .select(lit(name).as("metric"), col("psi"),
              col("rows_base"), col("rows_cur"))
        m("quantity_truncated", li.filter(col("l_quantity") <= 40))
          .unionByName(m("random_subset", li.filter(col("l_orderkey") % 2 === 0)))
          .orderBy("metric")
      },
      Some("""WITH b AS (SELECT LEAST(GREATEST(FLOOR((CAST(l_quantity AS DOUBLE)-1.0)/5.0),0),9) AS bucket FROM lineitem),
             |c1 AS (SELECT LEAST(GREATEST(FLOOR((CAST(l_quantity AS DOUBLE)-1.0)/5.0),0),9) AS bucket FROM lineitem WHERE l_quantity <= 40),
             |c2 AS (SELECT LEAST(GREATEST(FLOOR((CAST(l_quantity AS DOUBLE)-1.0)/5.0),0),9) AS bucket FROM lineitem WHERE l_orderkey % 2 = 0),
             |bb AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY 1),
             |b1 AS (SELECT bucket, COUNT(*) AS n FROM c1 GROUP BY 1),
             |b2 AS (SELECT bucket, COUNT(*) AS n FROM c2 GROUP BY 1),
             |m1 AS (SELECT 'quantity_truncated' AS metric,
             |         ROUND(SUM((pc-pb)*LN(pc/pb)), 4) AS psi,
             |         CAST(MAX(tb) AS BIGINT) AS rows_base,
             |         CAST(MAX(tc) AS BIGINT) AS rows_cur
             |       FROM (SELECT GREATEST(COALESCE(bb.n,0)/CAST(tb.t AS DOUBLE), 1e-6) AS pb,
             |                    GREATEST(COALESCE(b1.n,0)/CAST(tc.t AS DOUBLE), 1e-6) AS pc,
             |                    tb.t AS tb, tc.t AS tc
             |             FROM bb FULL JOIN b1 USING (bucket)
             |             CROSS JOIN (SELECT SUM(n) AS t FROM bb) tb
             |             CROSS JOIN (SELECT SUM(n) AS t FROM b1) tc)),
             |m2 AS (SELECT 'random_subset' AS metric,
             |         ROUND(SUM((pc-pb)*LN(pc/pb)), 4) AS psi,
             |         CAST(MAX(tb) AS BIGINT) AS rows_base,
             |         CAST(MAX(tc) AS BIGINT) AS rows_cur
             |       FROM (SELECT GREATEST(COALESCE(bb.n,0)/CAST(tb.t AS DOUBLE), 1e-6) AS pb,
             |                    GREATEST(COALESCE(b2.n,0)/CAST(tc.t AS DOUBLE), 1e-6) AS pc,
             |                    tb.t AS tb, tc.t AS tc
             |             FROM bb FULL JOIN b2 USING (bucket)
             |             CROSS JOIN (SELECT SUM(n) AS t FROM bb) tb
             |             CROSS JOIN (SELECT SUM(n) AS t FROM b2) tc)),
             |u AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
             |SELECT metric, psi, rows_base, rows_cur FROM u ORDER BY metric""".stripMargin)),

    // Categorical drift (PSI + chi-square) over a string column — the
    // corpus-monitoring companion to q_drift_psi for language/domain/
    // license mixes. Buckets = top-3 BASE categories (count desc, value
    // asc — deterministic) + __other__; one drifted pair (90% of
    // '3-MEDIUM' orders removed) and one stable control. The oracle
    // replays the identical top-N selection and proportion/log/chi2
    // arithmetic. Scale shape per metric: one capped top-N aggregate,
    // two ≤4-row bucket aggregates, a bucket join, one scalar fold.
    GraftQuery(
      "q_drift_cat",
      (s, d) => {
        val o = Tables.orders(s, d)
        val drifted = o.filter(
          !(col("o_orderpriority") === "3-MEDIUM" && col("o_orderkey") % 10 =!= 0))
        val control = o.filter(col("o_orderkey") % 2 === 0)
        def m(name: String, cur: org.apache.spark.sql.DataFrame) =
          graft.operators.Drift.psiCat(o, cur, "o_orderpriority", maxCategories = 3)
            .select(lit(name).as("metric"), col("psi"), col("chi2"),
              col("rows_base"), col("rows_cur"))
        m("medium_removed", drifted)
          .unionByName(m("random_subset", control))
          .orderBy("metric")
      },
      Some("""WITH top AS (SELECT o_orderpriority AS c FROM orders
             |            GROUP BY 1 ORDER BY COUNT(*) DESC, c ASC LIMIT 3),
             |bb AS (SELECT CASE WHEN o_orderpriority IN (SELECT c FROM top)
             |                   THEN o_orderpriority ELSE '__other__' END AS bucket,
             |              COUNT(*) AS n
             |       FROM orders GROUP BY 1),
             |b1 AS (SELECT CASE WHEN o_orderpriority IN (SELECT c FROM top)
             |                   THEN o_orderpriority ELSE '__other__' END AS bucket,
             |              COUNT(*) AS n
             |       FROM orders
             |       WHERE NOT (o_orderpriority = '3-MEDIUM' AND o_orderkey % 10 <> 0)
             |       GROUP BY 1),
             |b2 AS (SELECT CASE WHEN o_orderpriority IN (SELECT c FROM top)
             |                   THEN o_orderpriority ELSE '__other__' END AS bucket,
             |              COUNT(*) AS n
             |       FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
             |m1 AS (SELECT 'medium_removed' AS metric,
             |         ROUND(SUM((pc-pb)*LN(pc/pb)), 4) AS psi,
             |         ROUND(SUM(POW(nc - tc*pb, 2)/(tc*pb)), 2) AS chi2,
             |         CAST(MAX(tb) AS BIGINT) AS rows_base,
             |         CAST(MAX(tc) AS BIGINT) AS rows_cur
             |       FROM (SELECT GREATEST(COALESCE(bb.n,0)/CAST(tb.t AS DOUBLE), 1e-6) AS pb,
             |                    GREATEST(COALESCE(b1.n,0)/CAST(tc.t AS DOUBLE), 1e-6) AS pc,
             |                    CAST(COALESCE(b1.n,0) AS DOUBLE) AS nc,
             |                    tb.t AS tb, tc.t AS tc
             |             FROM bb FULL JOIN b1 USING (bucket)
             |             CROSS JOIN (SELECT SUM(n) AS t FROM bb) tb
             |             CROSS JOIN (SELECT SUM(n) AS t FROM b1) tc)),
             |m2 AS (SELECT 'random_subset' AS metric,
             |         ROUND(SUM((pc-pb)*LN(pc/pb)), 4) AS psi,
             |         ROUND(SUM(POW(nc - tc*pb, 2)/(tc*pb)), 2) AS chi2,
             |         CAST(MAX(tb) AS BIGINT) AS rows_base,
             |         CAST(MAX(tc) AS BIGINT) AS rows_cur
             |       FROM (SELECT GREATEST(COALESCE(bb.n,0)/CAST(tb.t AS DOUBLE), 1e-6) AS pb,
             |                    GREATEST(COALESCE(b2.n,0)/CAST(tc.t AS DOUBLE), 1e-6) AS pc,
             |                    CAST(COALESCE(b2.n,0) AS DOUBLE) AS nc,
             |                    tb.t AS tb, tc.t AS tc
             |             FROM bb FULL JOIN b2 USING (bucket)
             |             CROSS JOIN (SELECT SUM(n) AS t FROM bb) tb
             |             CROSS JOIN (SELECT SUM(n) AS t FROM b2) tc)),
             |u AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
             |SELECT metric, psi, chi2, rows_base, rows_cur FROM u ORDER BY metric""".stripMargin)),

    // Last-touch attribution: every purchase credits its revenue to the
    // user's most recent PRECEDING channel event (view/click/signup);
    // purchases with no prior channel fall to 'direct'. ONE ignore-nulls
    // window pass partitioned on user_id — no per-channel scans, no
    // self-join of purchases against history (the naive formulation is a
    // range theta join; the running last_value carries the same answer
    // through a single sort). (user_id, ts) is unique in the fixture but
    // event_id still breaks ordering ties so the window is total.
    GraftQuery(
      "q_attribution",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .withColumn("channel",
            last(when(col("event_type").isin("view", "click", "signup"),
              col("event_type")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            round(sum("value"), 2).as("revenue"))
          .orderBy("channel")
      },
      Some("""SELECT COALESCE(channel, 'direct') AS channel,
             |       COUNT(*) AS n_purchases,
             |       ROUND(SUM(value), 2) AS revenue
             |FROM (
             |  SELECT event_type, value,
             |         LAST_VALUE(CASE WHEN event_type IN ('view','click','signup')
             |                         THEN event_type END IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
             |  FROM events)
             |WHERE event_type = 'purchase'
             |GROUP BY 1 ORDER BY channel""".stripMargin)),

    // Sequence-pattern detection (the MATCH_RECOGNIZE role): each user's
    // event stream becomes one ordered character string (v/c/p/s/e) and a
    // regex counts non-overlapping conversion motifs 'v[cs]*p' — view,
    // then any clicks/signups, then purchase. One groupBy; per-user state
    // is bounded by the per-user event count (the same bound sessionize
    // already assumes). The ordered concat is array_sort over
    // (ts, event_id, ch) structs — lexicographic struct order IS the
    // event order, deterministic across partitionings — and both engines
    // run the same RE2-compatible pattern left-to-right non-overlapping.
    GraftQuery(
      "q_seq_pattern",
      (s, d) => {
        val ch = when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .when(col("event_type") === "signup", "s")
          .otherwise("e")
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), ch.as("ch"))
          .groupBy("user_id")
          .agg(array_join(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("ch")))),
              x => x.getField("ch")), "").as("seq"))
          .select(col("user_id"),
            length(col("seq")).cast("bigint").as("seq_len"),
            size(expr("regexp_extract_all(seq, 'v[cs]*p', 0)"))
              .cast("bigint").as("n_conv"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |       length(seq) AS seq_len,
             |       CAST(len(regexp_extract_all(seq, 'v[cs]*p')) AS BIGINT) AS n_conv
             |FROM (SELECT user_id,
             |        string_agg(CASE event_type WHEN 'view' THEN 'v'
             |                    WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
             |                    WHEN 'signup' THEN 's' ELSE 'e' END,
             |                   '' ORDER BY ts, event_id) AS seq
             |      FROM events GROUP BY user_id)
             |ORDER BY user_id""".stripMargin)),

    // Exponential smoothing (EWMA, α=0.2) of each user's value stream —
    // the RECURSIVE per-key fold (sᵢ = αxᵢ + (1−α)sᵢ₋₁) that window
    // functions cannot express (each output depends on the previous
    // OUTPUT, not a previous input): the ordered values fold through a
    // higher-order aggregate seeded with the first element, exactly the
    // left fold DuckDB's list_reduce performs, so both engines evaluate
    // the IDENTICAL IEEE operation sequence (constants spelled
    // CAST(0.2 AS DOUBLE) on both sides — bare decimal literals parse
    // as DECIMAL in both engines and would change the arithmetic).
    // Per-key state = that user's event count, the same bound
    // sessionize/q_seq_pattern already assume.
    GraftQuery(
      "q_ewma",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(array_sort(
            collect_list(struct(col("ts"), col("event_id"), col("value"))))
            .as("graft_seq"))
          .withColumn("graft_vals", expr("transform(graft_seq, x -> x.value)"))
          .select(col("user_id"),
            round(expr(
              "aggregate(slice(graft_vals, 2, greatest(size(graft_vals)-1, 0)), " +
                "element_at(graft_vals, 1), " +
                "(acc, x) -> CAST(0.2 AS DOUBLE)*x + CAST(0.8 AS DOUBLE)*acc)"),
              6).as("ewma"),
            size(col("graft_vals")).cast("bigint").as("n"))
          .orderBy("user_id"),
      Some("""SELECT user_id,
             |  ROUND(list_reduce(list(value ORDER BY ts, event_id),
             |        (acc, x) -> CAST(0.2 AS DOUBLE)*x + CAST(0.8 AS DOUBLE)*acc),
             |        6) AS ewma,
             |  count(*) AS n
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // CUSUM changepoint detection per user (Page's upward control
    // chart): has each user's value stream shifted above its own mean,
    // and when did it first alarm? The recursion Sᵢ = max(0, Sᵢ₋₁ + dᵢ)
    // evaluates by its CLOSED FORM — S = P − min(0, running-min(P)) over
    // the deviation cumsum — so Spark and DuckDB run the identical
    // two-window plan (cumsum + running min per user), no fold, no
    // driver loop. μ quantizes at 6 per the q_feature_scale rule, and
    // deviations quantize to the dyadic 1/64 grid BEFORE summation —
    // dyadic rationals sum exactly in double, so the statistic is
    // bit-identical under any accumulation order. That, not rounding,
    // is what survives the engines' different window-sum orders (DuckDB
    // segment tree vs Spark sequential — ~1e-10 noise that flipped a
    // round-4 peak on 3/1500 keys at sf0.1).
    GraftQuery(
      "q_cusum",
      (s, d) =>
        graft.operators.Changepoint.cusumSummary(
          Tables.events(s, d).select("user_id", "ts", "event_id", "value"),
          keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
          valueCol = "value", slack = 5.0, threshold = 320.0,
          firstAlarmCol = "first_alarm_ts")
          .withColumnRenamed("first_alarm_ts", "first_alarm")
          .withColumn("max_cusum", nz(col("max_cusum"))) // hazard class 4
          .orderBy("user_id"),
      Some("""WITH mu AS (SELECT user_id, ROUND(avg(value), 6) AS mu
             |            FROM events GROUP BY 1),
             |p AS (SELECT e.user_id, ts, event_id,
             |        SUM(FLOOR((value - mu - CAST(5 AS DOUBLE)) * 64) / 64) OVER
             |          (PARTITION BY e.user_id ORDER BY ts, event_id
             |           ROWS UNBOUNDED PRECEDING) AS P
             |      FROM events e JOIN mu USING (user_id)),
             |s AS (SELECT user_id, ts,
             |        P - LEAST(CAST(0 AS DOUBLE),
             |              MIN(P) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                           ROWS UNBOUNDED PRECEDING)) AS S
             |      FROM p)
             |SELECT user_id,
             |       ROUND(max(S), 2) + 0.0 AS max_cusum,
             |       CAST(SUM(CASE WHEN S > 320.0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_alarms,
             |       MIN(CASE WHEN S > 320.0 THEN ts END) AS first_alarm,
             |       count(*) AS n
             |FROM s GROUP BY 1 ORDER BY user_id""".stripMargin)))
}
