package graft.queries

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join family. The reference's only join is `DbDataJoiner` — a lookup join
  * against a dimension table with local cache and auto-upsert of unseen keys
  * (SURVEY.md §2.1 A18). Spark-natively that whole family decomposes into
  * broadcast/shuffle hash joins plus anti-join for the miss path, so we
  * declare the full relational join surface.
  *
  * Scale notes:
  *  - Dimension sides (customer/part/nation) are broadcast: at 100 TB the
  *    fact table (lineitem/orders) never shuffles for these joins. We hint
  *    `broadcast()` explicitly where the dim side is known-small; AQE
  *    converts the rest at runtime.
  *  - The dim-upsert surrogate-key assignment uses a window over DISTINCT
  *    dim values — the distinct set is dim-sized (small), not fact-sized,
  *    so the single-partition window is safe; the fact join-back is a
  *    broadcast join.
  */
object JoinQueries {

  val all: Seq[GraftQuery] = Seq(

    // A18 equi-join core: fact-dim join + aggregate. Shuffle hash/broadcast
    // picked by Catalyst; customer is broadcast-size.
    GraftQuery(
      "q_join_inner",
      (s, d) =>
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
             |       ROUND(SUM(o_totalprice), 2) AS rev
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin)),

    // Bloom-reduced join (Joins.bloomReducedJoin): the fact side is
    // prefiltered by a bloom sketch of the dim's key set BEFORE the
    // join's exchange — the middle ground when a dimension is too big
    // to broadcast as a hash relation but its key set fits a few MB of
    // bloom bits. The sketch has false positives but NO false
    // negatives and the real join still runs, so the result is
    // row-identical to the plain join — which is exactly what the
    // oracle is (plain SQL, no bloom): the gate proves the reduction
    // is semantically free.
    GraftQuery(
      "q_join_bloom",
      (s, d) => {
        val urgent = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
        graft.operators.Joins.bloomReducedJoin(
          Tables.lineitem(s, d), urgent, "l_orderkey", "o_orderkey",
          expectedItems = 200000L, numBits = 1600000L)
          .groupBy("l_linestatus")
          .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("rev"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus, COUNT(*) AS n,
             |       ROUND(SUM(l_extendedprice), 2) AS rev
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY 1 ORDER BY l_linestatus""".stripMargin)),

    // A18 local-cache parity: explicit broadcast hint — the Spark analog of
    // DbDataJoiner's in-process dimension cache (no shuffle of the fact).
    GraftQuery(
      "q_join_broadcast",
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"))
          .orderBy("p_brand"),
      Some("""SELECT p_brand, COUNT(*) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY p_brand""".stripMargin)),

    // A18 miss path: customers with no orders (left join + null filter).
    GraftQuery(
      "q_join_left",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, col("o_custkey") === col("c_custkey"), "left")
          .filter(col("o_orderkey").isNull)
          .select("c_custkey")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey
             |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |WHERE o_orderkey IS NULL ORDER BY c_custkey""".stripMargin)),

    // A18 hit path (LocalLookup): EXISTS as left-semi join.
    GraftQuery(
      "q_join_semi",
      (s, d) =>
        Tables.customer(s, d)
          .join(
            Tables.orders(s, d).filter(col("o_totalprice") > 100000),
            col("c_custkey") === col("o_custkey"),
            "left_semi")
          .select("c_custkey")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
             |ORDER BY c_custkey""".stripMargin)),

    // A18 DimTableInserter find-new-keys step: NOT EXISTS as left-anti join.
    GraftQuery(
      "q_join_anti",
      (s, d) =>
        Tables.part(s, d)
          .join(
            Tables.lineitem(s, d),
            col("p_partkey") === col("l_partkey"),
            "left_anti")
          .select("p_partkey")
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey FROM part
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
             |ORDER BY p_partkey""".stripMargin)),

    // Equi + interval predicate (range join): the equi key keeps it a hash
    // join with the range as a post-filter — no O(n²) theta join.
    GraftQuery(
      "q_join_range",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        l.join(
            o,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") >= col("o_orderdate") &&
              col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber
             |FROM lineitem JOIN orders
             |  ON l_orderkey = o_orderkey
             | AND l_shipdate >= o_orderdate
             | AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // As-of join (point-in-time lookup): each click gets the user's most
    // recent prior-or-simultaneous purchase value. Union + last_value
    // window — one shuffle on user_id, no range self-join (see
    // graft.operators.AsOfJoin for the scale rationale).
    GraftQuery(
      "q_join_asof",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.operators.AsOfJoin.asof(
            left = ev.filter(col("event_type") === "click")
              .select("event_id", "user_id", "ts"),
            right = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("value").as("purchase_value")),
            keyCols = Seq("user_id"),
            leftTs = "ts",
            rightTs = "ts",
            valueCols = Seq("purchase_value"))
          .select("event_id", "purchase_value")
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, r.value AS purchase_value
             |FROM (SELECT * FROM events WHERE event_type = 'click') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // Same as-of semantics on the CUSTOM physical operator (logical node +
    // planner strategy + per-partition streaming merge, AsOfJoinExec) —
    // checked against the identical DuckDB ASOF oracle as q_join_asof.
    GraftQuery(
      "q_join_asof_merge",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.operators.AsOfJoin.asofMerge(
            left = ev.filter(col("event_type") === "click")
              .select("event_id", "user_id", "ts"),
            right = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("value").as("purchase_value")),
            keyCols = Seq("user_id"),
            leftTs = "ts",
            rightTs = "ts",
            valueCols = Seq("purchase_value"))
          .select("event_id", "purchase_value")
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, r.value AS purchase_value
             |FROM (SELECT * FROM events WHERE event_type = 'click') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // Forward as-of: each click gets the user's EARLIEST subsequent (or
    // simultaneous) purchase — next-scheduled-event lookup; the identical
    // union+window machinery scanning time descending. DuckDB infers the
    // direction from the inequality.
    GraftQuery(
      "q_join_asof_fwd",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.operators.AsOfJoin.asof(
            left = ev.filter(col("event_type") === "click")
              .select("event_id", "user_id", "ts"),
            right = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("value").as("purchase_value")),
            keyCols = Seq("user_id"),
            leftTs = "ts",
            rightTs = "ts",
            valueCols = Seq("purchase_value"),
            direction = "forward")
          .select("event_id", "purchase_value")
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, r.value AS purchase_value
             |FROM (SELECT * FROM events WHERE event_type = 'click') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
             |  ON l.user_id = r.user_id AND l.ts <= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // Nearest as-of: whichever of the prior/subsequent purchase is closer
    // in time, exact ties going backward — pandas merge_asof
    // direction='nearest'. One shuffle, two in-partition scans; the
    // oracle replays it as backward ASOF + forward ASOF + distance CASE.
    GraftQuery(
      "q_join_asof_near",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.operators.AsOfJoin.asof(
            left = ev.filter(col("event_type") === "click")
              .select("event_id", "user_id", "ts"),
            right = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("value").as("purchase_value")),
            keyCols = Seq("user_id"),
            leftTs = "ts",
            rightTs = "ts",
            valueCols = Seq("purchase_value"),
            direction = "nearest")
          .select("event_id", "purchase_value")
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id,
             |  CASE WHEN b.ts IS NULL THEN f.value
             |       WHEN f.ts IS NULL THEN b.value
             |       WHEN epoch(l.ts) - epoch(b.ts) <= epoch(f.ts) - epoch(l.ts)
             |         THEN b.value
             |       ELSE f.value END AS purchase_value
             |FROM (SELECT * FROM events WHERE event_type = 'click') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
             |  ON l.user_id = b.user_id AND l.ts >= b.ts
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') f
             |  ON l.user_id = f.user_id AND l.ts <= f.ts
             |ORDER BY l.event_id""".stripMargin)),

    // Bounded-staleness as-of: backward lookup with pandas merge_asof's
    // `tolerance` — a prior purchase older than 6 hours attaches as NULL
    // (a point-in-time feature with an expiry). Oracle = plain ASOF plus
    // a distance CASE on the matched timestamp.
    GraftQuery(
      "q_join_asof_tol",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.operators.AsOfJoin.asof(
            left = ev.filter(col("event_type") === "click")
              .select("event_id", "user_id", "ts"),
            right = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("value").as("purchase_value")),
            keyCols = Seq("user_id"),
            leftTs = "ts",
            rightTs = "ts",
            valueCols = Seq("purchase_value"),
            direction = "backward",
            tolerance = Some(21600.0))
          .select("event_id", "purchase_value")
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id,
             |  CASE WHEN epoch(l.ts) - epoch(r.ts) <= 21600.0
             |       THEN r.value END AS purchase_value
             |FROM (SELECT * FROM events WHERE event_type = 'click') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // Co-located join via bucketed layout: BOTH sides written bucketed +
    // sorted on the join key, then joined with zero exchanges (the
    // bucketed scans already satisfy the join's distribution — the plan
    // contract BucketingSpec asserts). The one-time-layout-pays-for-
    // every-join trade that makes repeated fact⋈fact pipelines viable at
    // 100 TB. The oracle is the plain join: a hash match proves the
    // exchange-free plan computes the identical relation.
    GraftQuery(
      "q_join_bucketed",
      (s, d) => {
        val dir = graft.GraftQuery.tempDir("graft_bucket_q")
        // table names carry the per-run dir tag: concurrent executions
        // (or overlapping bench iterations) never collide in the catalog
        val tag = graft.GraftQuery.runTag(dir)
        val (tblO, tblL) = (s"graft_q_bucket_o_$tag", s"graft_q_bucket_l_$tag")
        val orders = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val li = Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
        graft.operators.Bucketing.writeBucketed(
          orders, tblO, s"$dir/o", 8, Seq("o_orderkey"))
        graft.operators.Bucketing.writeBucketed(
          li.withColumnRenamed("l_orderkey", "o_orderkey"),
          tblL, s"$dir/l", 8, Seq("o_orderkey"))
        val joined = graft.operators.Bucketing.colocatedJoin(s,
            tblO, tblL, Seq("o_orderkey"))
          .groupBy("o_custkey")
          .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
          .orderBy("o_custkey")
          // Eager materialization (lineage truncated to the computed
          // partitions) so the run-tagged catalog tables can be DROPPED
          // here instead of accumulating over a long-lived session
          // (round-12 ADVICE) — a lazy return would read the tables
          // after the drop. The exchange-free plan contract stays
          // BucketingSpec-gated on the operator itself.
          .localCheckpoint(true)
        s.sql(s"DROP TABLE IF EXISTS $tblO")
        s.sql(s"DROP TABLE IF EXISTS $tblL")
        joined
      },
      Some("""SELECT o_custkey, sum(l_quantity) AS qty, count(*) AS n
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY o_custkey""".stripMargin)),

    // A18 full semantics, deterministic batch model: distinct dim values →
    // dense_rank surrogate keys → broadcast join back onto the fact.
    // (True incremental upsert against a live store is the streaming layer's
    // job; this is the batch-equivalent contract.)
    GraftQuery(
      "q_join_dim_upsert",
      (s, d) => {
        // Drives the REAL operator (fresh store per run): distributed
        // surrogate assignment — range-sorted zipWithIndex, no global
        // window task — whose output is BY CONSTRUCTION dense_rank over
        // the sorted distinct keys, which is exactly what the oracle
        // states in SQL. The gate thus proves the distributed path ≡ the
        // SQL-declarative definition.
        val tmp = graft.GraftQuery.tempDir("graft_dimupq") + "/dim"
        graft.operators.DimUpsert
          .upsert(s, tmp, Tables.part(s, d), "p_brand")
          .select("p_partkey", "sk")
          .orderBy("p_partkey")
      },
      Some("""WITH dim AS (
             |  SELECT p_brand,
             |         CAST(DENSE_RANK() OVER (ORDER BY p_brand) AS BIGINT) AS sk
             |  FROM (SELECT DISTINCT p_brand FROM part)
             |)
             |SELECT p_partkey, sk FROM part JOIN dim USING (p_brand)
             |ORDER BY p_partkey""".stripMargin)),

    // Skew-salted join (Skew.saltedJoin with a DETERMINISTIC saltFrom):
    // the fact side joins on (key, salt) with the dim replicated once
    // per salt, spreading a hot key over `buckets` reducers instead of
    // one — the planned counterpart to AQE's after-the-fact skew split,
    // and the only option when one logical key exceeds a single task.
    // The rewrite is semantically FREE: every fact row meets its key's
    // dim rows exactly once, so the oracle is the PLAIN join SQL — the
    // gate proves salting changes the physical routing and nothing else.
    GraftQuery(
      "q_join_salted",
      (s, d) =>
        graft.operators.Skew.saltedJoin(
            Tables.lineitem(s, d),
            Tables.part(s, d).withColumnRenamed("p_partkey", "l_partkey"),
            key = "l_partkey", buckets = 8,
            saltFrom = Some(col("l_orderkey") * lit(8L) + col("l_linenumber")))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("rev"))
          .orderBy("p_brand"),
      Some("""SELECT p_brand, COUNT(*) AS n,
             |       ROUND(SUM(l_extendedprice), 2) AS rev
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY p_brand""".stripMargin)),

    // Interval-overlap join WITHOUT an equi key (IntervalJoin.overlapJoin):
    // per-user activity sessions (30-min gaps-and-islands) × 2-hour
    // incident windows opened by each error event. A naive plan for
    // "which sessions overlap which incidents" is a BroadcastNestedLoop
    // theta join — O(|sess|·|inc|); the operator grid-blocks the timeline
    // into 1-hour buckets and equi-joins on bucket id with an exact
    // overlap residual and a dedup-free first-shared-bucket rule. The
    // oracle IS the naive theta join in DuckDB — fine at sf0.01, fatal at
    // scale — so the gate proves the blocked rewrite exact.
    GraftQuery(
      "q_join_interval",
      (s, d) => {
        val usExpr =
          expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts)")
        val e = Tables.events(s, d)
        val w = Window.partitionBy("user_id").orderBy("ts")
        val sess = e
          .withColumn("us", usExpr)
          .withColumn("new_s",
            when(col("us") - lag(col("us"), 1).over(w) > lit(1800000000L), 1)
              .otherwise(0))
          .withColumn("session_id",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(min("us").as("s_start"), max("us").as("s_end"))
          .select("user_id", "s_start", "s_end")
        val inc = e.filter(col("event_type") === "error")
          .withColumn("us", usExpr)
          .select(col("event_id"), col("us").as("i_start"),
            (col("us") + lit(7200000000L)).as("i_end"))
        val pairs = graft.operators.IntervalJoin.overlapJoin(
          sess, inc, "s_start", "s_end", "i_start", "i_end",
          bucketWidth = 3600000000L)
        val agg = pairs.groupBy("event_id")
          .agg(count(lit(1)).as("n_sessions"),
            countDistinct("user_id").as("n_users"))
        inc.select("event_id").join(agg, Seq("event_id"), "left")
          .na.fill(0L, Seq("n_sessions", "n_users"))
          .orderBy("event_id")
      },
      Some("""WITH sess AS (
             |  SELECT user_id,
             |         min(epoch_us(ts)) AS s_start, max(epoch_us(ts)) AS s_end
             |  FROM (
             |    SELECT user_id, ts,
             |           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             |             ROWS UNBOUNDED PRECEDING) AS session_id
             |    FROM (SELECT user_id, ts,
             |                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                           > INTERVAL 30 MINUTE
             |                      THEN 1 ELSE 0 END AS new_session
             |          FROM events))
             |  GROUP BY user_id, session_id),
             |inc AS (SELECT event_id, epoch_us(ts) AS i_start,
             |               epoch_us(ts + INTERVAL 2 HOUR) AS i_end
             |        FROM events WHERE event_type = 'error')
             |SELECT inc.event_id,
             |       count(sess.user_id) AS n_sessions,
             |       count(DISTINCT sess.user_id) AS n_users
             |FROM inc LEFT JOIN sess
             |  ON sess.s_start <= inc.i_end AND inc.i_start <= sess.s_end
             |GROUP BY 1 ORDER BY event_id""".stripMargin)),
  )
}
