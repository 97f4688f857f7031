package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator: a Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver uses for the
  * hash-compare correctness gate (see Verify.scala).
  *
  * Discipline (SURVEY.md §2.3): every oracle query ends in a total ORDER BY,
  * rounds double aggregates, and aliases every computed column identically
  * on both sides (the driver sorts columns by name before hashing).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
