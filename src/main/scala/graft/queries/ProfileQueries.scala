package graft.queries

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Table/corpus introspection: per-column data profiling and sketch-based
  * frequency estimation — the "what is in this 100 TB pile" pass every
  * ingest pipeline runs before curation.
  */
object ProfileQueries {

  /** DuckDB replay of the replayable count-min sketch (q_freq_sketch):
    * md5 base per term, the depth row hashes as spliced Carter–Wegman
    * literals (the SAME md5-derived coefficients CmSketch.coefs
    * derives), cell counts grouped by (row, col), estimates as the min
    * over rows of the probed cells. Generated so depth/width/coefs stay
    * in lockstep with the query's parameters. */
  private val freqSketchOracleSql: String = {
    val depth = 5
    val width = 2048
    val p = graft.functions.TextFunctions.ReplayP
    val cs = graft.operators.CmSketch.coefs(depth)
    def colCase(x: String, r: String = "r"): String =
      s"CASE $r " + cs.zipWithIndex.map { case ((a, b), i) =>
        s"WHEN $i THEN (($a*$x + $b) % $p) % $width"
      }.mkString(" ") + " END"
    s"""WITH terms AS (SELECT unnest(string_split(text, ' ')) AS term
       |               FROM documents),
       |xs AS (SELECT (('0x' || substring(md5(term), 1, 8))::BIGINT % $p) AS x
       |       FROM terms),
       |cells AS (SELECT r, ${colCase("x")} AS c, COUNT(*) AS n
       |          FROM xs CROSS JOIN range(0, $depth) rr(r)
       |          GROUP BY 1, 2),
       |top AS (SELECT term, COUNT(*) AS n_exact FROM terms
       |        GROUP BY 1 ORDER BY n_exact DESC, term LIMIT 20),
       |tx AS (SELECT term, n_exact,
       |         (('0x' || substring(md5(term), 1, 8))::BIGINT % $p) AS x
       |       FROM top)
       |SELECT tx.term, tx.n_exact, MIN(cells.n) AS n_est
       |FROM tx CROSS JOIN range(0, $depth) rr(r)
       |JOIN cells ON cells.r = rr.r AND cells.c = ${colCase("tx.x", "rr.r")}
       |GROUP BY 1, 2
       |ORDER BY term""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(

    // Per-column profile (null count, exact distinct, min, max) in ONE
    // pass over the table: all aggregates run in a single agg, then the
    // per-column rows unfold from an array of structs — no per-column
    // rescans. The multi-countDistinct expands the aggregate (one
    // distinct-shuffle per column, same shape as q_agg_multidistinct);
    // at 100 TB swap countDistinct for approx_count_distinct and the
    // plan collapses to one partial-aggregated pass. l_tax_nz plants
    // NULLs (nullif) so the null-count leg is exercised on the
    // null-free TPC-H fixture.
    GraftQuery(
      "q_profile",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("l_tax_nz", when(col("l_tax") =!= 0, col("l_tax")))
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax_nz")
        val agg = li.agg(
          count(when(col(cols.head).isNull, lit(1))).as(s"${cols.head}__nn"),
          cols.tail.map(c => count(when(col(c).isNull, lit(1))).as(s"${c}__nn")) ++
            cols.map(c => countDistinct(col(c)).as(s"${c}__nd")) ++
            cols.map(c => round(min(col(c)).cast("double"), 4).as(s"${c}__mn")) ++
            cols.map(c => round(max(col(c)).cast("double"), 4).as(s"${c}__mx")): _*)
        val rows = array(cols.map(c => struct(
          lit(c).as("col_name"),
          col(s"${c}__nn").as("n_null"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__mn").as("vmin"),
          col(s"${c}__mx").as("vmax"))): _*)
        agg.select(explode(rows).as("p")).select("p.*").orderBy("col_name")
      },
      Some("""WITH li AS (SELECT *, nullif(l_tax, 0.0) AS l_tax_nz FROM lineitem)
             |SELECT 'l_quantity' AS col_name, COUNT(*) - COUNT(l_quantity) AS n_null,
             |       COUNT(DISTINCT l_quantity) AS n_distinct,
             |       ROUND(CAST(MIN(l_quantity) AS DOUBLE), 4) AS vmin,
             |       ROUND(CAST(MAX(l_quantity) AS DOUBLE), 4) AS vmax FROM li
             |UNION ALL
             |SELECT 'l_extendedprice', COUNT(*) - COUNT(l_extendedprice),
             |       COUNT(DISTINCT l_extendedprice),
             |       ROUND(CAST(MIN(l_extendedprice) AS DOUBLE), 4),
             |       ROUND(CAST(MAX(l_extendedprice) AS DOUBLE), 4) FROM li
             |UNION ALL
             |SELECT 'l_discount', COUNT(*) - COUNT(l_discount),
             |       COUNT(DISTINCT l_discount),
             |       ROUND(CAST(MIN(l_discount) AS DOUBLE), 4),
             |       ROUND(CAST(MAX(l_discount) AS DOUBLE), 4) FROM li
             |UNION ALL
             |SELECT 'l_tax_nz', COUNT(*) - COUNT(l_tax_nz),
             |       COUNT(DISTINCT l_tax_nz),
             |       ROUND(CAST(MIN(l_tax_nz) AS DOUBLE), 4),
             |       ROUND(CAST(MAX(l_tax_nz) AS DOUBLE), 4) FROM li
             |ORDER BY col_name""".stripMargin)),

    // Count-min-sketch term frequencies probed at the exact top-20,
    // ORACLE-GATED (promoted r14): the sketch is the md5-Carter-Wegman
    // replayable CMS (graft.operators.CmSketch) — row hashes both
    // engines compute identically, so every counter AND every estimate
    // is a deterministic pure function of the corpus that DuckDB
    // replays. Same 100 TB shape as a builtin sketch: the build's
    // partial aggregation collapses each partition to <= depth*width
    // cells before the shuffle; the probe joins 20x5 keys against the
    // bounded cell table. FreqSketchSpec still pins the CMS guarantee
    // (est >= exact; bounded overestimate) on both this and the builtin
    // count_min_sketch path.
    GraftQuery(
      "q_freq_sketch",
      (s, d) => {
        import graft.operators.CmSketch
        val terms = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("term"))
        val sketch = CmSketch.build(terms, "term", depth = 5, width = 2048)
        val top = terms.groupBy("term").agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("term")).limit(20)
        CmSketch.estimate(sketch, top, "term", depth = 5, width = 2048)
          .select("term", "n_exact", "n_est")
          .orderBy("term")
      },
      Some(freqSketchOracleSql)),

    // Declarative data-quality expectations (Expectations.evaluate): the
    // admission gate a pipeline runs before trusting a batch. Seven
    // checks over documents — completeness, key uniqueness, range,
    // mean, regex conformance, membership — ALL compiled into one
    // aggregate pass (single scan; the unique check's count-distinct
    // rides the same scan via Expand). Every metric is an exact-integer
    // ratio or a single division, so the DuckDB replay is bit-identical
    // and the oracle gates metric values AND pass verdicts.
    GraftQuery(
      "q_expectations",
      (s, d) => {
        import graft.operators.Expectations._
        evaluate(Tables.documents(s, d), Seq(
          Complete("text", 1.0),
          Complete("lang", 1.0),
          Unique("doc_id"),
          Between("n_chars", 1, 10000),
          MeanBetween("n_chars", 100, 500),
          MatchesRegex("source", "^src[0-9]+$", 1.0),
          MemberOf("lang", Seq("en", "de", "es", "fr", "zh"), 0.95)))
      },
      Some("""WITH m AS (
             |  SELECT count(*) AS n,
             |         count(text) AS c_text,
             |         count(lang) AS c_lang,
             |         count(doc_id) AS c_doc,
             |         count(DISTINCT doc_id) AS d_doc,
             |         avg(CASE WHEN n_chars IS NULL THEN NULL
             |                  WHEN n_chars BETWEEN 1 AND 10000 THEN 1.0
             |                  ELSE 0.0 END) AS f_range,
             |         avg(CAST(n_chars AS DOUBLE)) AS mean_chars,
             |         avg(CASE WHEN source IS NULL THEN NULL
             |                  WHEN regexp_matches(source, '^src[0-9]+$') THEN 1.0
             |                  ELSE 0.0 END) AS f_regex,
             |         avg(CASE WHEN lang IS NULL THEN NULL
             |                  WHEN lang IN ('en','de','es','fr','zh') THEN 1.0
             |                  ELSE 0.0 END) AS f_member
             |  FROM documents)
             |SELECT * FROM (
             |  SELECT 'between(n_chars)' AS check_name, 'n_chars' AS column_name,
             |         ROUND(COALESCE(f_range, 1.0), 6) AS metric,
             |         COALESCE(f_range, 1.0) = 1.0 AS passed FROM m
             |  UNION ALL
             |  SELECT 'complete(lang)', 'lang',
             |         ROUND(COALESCE(c_lang/CAST(n AS DOUBLE), 1.0), 6),
             |         COALESCE(c_lang/CAST(n AS DOUBLE), 1.0) >= 1.0 FROM m
             |  UNION ALL
             |  SELECT 'complete(text)', 'text',
             |         ROUND(COALESCE(c_text/CAST(n AS DOUBLE), 1.0), 6),
             |         COALESCE(c_text/CAST(n AS DOUBLE), 1.0) >= 1.0 FROM m
             |  UNION ALL
             |  SELECT 'matches_regex(source)', 'source',
             |         ROUND(COALESCE(f_regex, 1.0), 6),
             |         COALESCE(f_regex, 1.0) >= 1.0 FROM m
             |  UNION ALL
             |  SELECT 'mean_between(n_chars)', 'n_chars',
             |         ROUND(mean_chars, 6),
             |         COALESCE(mean_chars >= 100 AND mean_chars <= 500, FALSE) FROM m
             |  UNION ALL
             |  SELECT 'member_of(lang)', 'lang',
             |         ROUND(COALESCE(f_member, 1.0), 6),
             |         COALESCE(f_member, 1.0) >= 0.95 FROM m
             |  UNION ALL
             |  SELECT 'unique(doc_id)', 'doc_id',
             |         ROUND(COALESCE(d_doc/CAST(c_doc AS DOUBLE), 1.0), 6),
             |         COALESCE(d_doc/CAST(c_doc AS DOUBLE), 1.0) = 1.0 FROM m)
             |ORDER BY check_name""".stripMargin)),

    // Per-SEGMENT expectations (Expectations.evaluateBy): the same
    // one-pass compilation grouped by language — one report row per
    // (lang, check). This is the shape that catches a quality collapse
    // in ONE language that the corpus-wide averages smooth over
    // (exactly how curation regressions hide in multilingual crawls).
    GraftQuery(
      "q_expectations_by",
      (s, d) => {
        import graft.operators.Expectations._
        evaluateBy(Tables.documents(s, d), Seq("lang"), Seq(
          Complete("text", 1.0),
          Between("n_chars", 1, 10000),
          MeanBetween("n_chars", 100, 500)))
      },
      Some("""WITH m AS (
             |  SELECT lang, count(*) AS n,
             |         count(text) AS c_text,
             |         avg(CASE WHEN n_chars IS NULL THEN NULL
             |                  WHEN n_chars BETWEEN 1 AND 10000 THEN 1.0
             |                  ELSE 0.0 END) AS f_range,
             |         avg(CAST(n_chars AS DOUBLE)) AS mean_chars
             |  FROM documents GROUP BY lang)
             |SELECT * FROM (
             |  SELECT lang, 'between(n_chars)' AS check_name,
             |         'n_chars' AS column_name,
             |         ROUND(COALESCE(f_range, 1.0), 6) AS metric,
             |         COALESCE(f_range, 1.0) = 1.0 AS passed FROM m
             |  UNION ALL
             |  SELECT lang, 'complete(text)', 'text',
             |         ROUND(COALESCE(c_text/CAST(n AS DOUBLE), 1.0), 6),
             |         COALESCE(c_text/CAST(n AS DOUBLE), 1.0) >= 1.0 FROM m
             |  UNION ALL
             |  SELECT lang, 'mean_between(n_chars)', 'n_chars',
             |         ROUND(mean_chars, 6),
             |         COALESCE(mean_chars >= 100 AND mean_chars <= 500, FALSE)
             |  FROM m)
             |ORDER BY lang, check_name""".stripMargin)))
}
