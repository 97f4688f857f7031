package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query pairs a Spark implementation with DuckDB oracle SQL
  * (where SQL-expressible); the driver hash-compares the two at sf0.01.
  * Non-oracle operators (streaming, MinHash LSH, Flow API) are exercised by
  * ScalaTest instead — see src/test/scala/graft.
  */
object SparkEntry {

  private val registry: Seq[GraftQuery] =
    RelationalQueries.all ++
      JoinQueries.all ++
      AggQueries.all ++
      WindowQueries.all ++
      TextQueries.all ++
      SimilarityQueries.all ++
      ExtendedQueries.all ++
      LateralMapQueries.all ++
      CoverageQueries.all ++
      AnalyticsQueries.all ++
      GraphQueries.all ++
      CurationQueries.all ++
      StoreQueries.all ++
      ProfileQueries.all ++
      MediaCurateQueries.all ++
      NonOracleQueries.all

  require(
    registry.map(_.name).distinct.size == registry.size,
    "duplicate query names in registry")

  /** Full declared-query registry, exposed for contract specs
    * (OracleContractSpec validates every oracle query's output schema
    * against the driver-comparator sortability contract). */
  private[graft] def allQueries: Seq[GraftQuery] = registry

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
