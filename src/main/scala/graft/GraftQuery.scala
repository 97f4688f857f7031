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

object GraftQuery {

  /** Driver-comparator output contract for oracle queries: every output
    * column must be a sortable scalar. The driver loads both sides into
    * pandas and sorts ALL columns before hashing; `sort_values` over a
    * column of arrays/maps/structs throws (`unhashable type:
    * 'numpy.ndarray'`) and the query goes red at the gate regardless of
    * the computation being right — exactly how q_embed_quantize failed in
    * round 7. Complex values must be projected to scalar digests
    * (element_at, aggregate-sum, size, …) before the final select.
    * Verify.scala calls this per oracle query before dumping its parquet,
    * so a violation fails that query loudly at build time rather than
    * opaquely inside the driver's comparator.
    */
  def assertSortableOracle(
      name: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val bad = schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }
    require(
      bad.isEmpty,
      s"oracle query $name emits non-sortable column(s) [${bad.mkString(", ")}] — " +
        "the driver comparator sorts with pandas, which cannot order " +
        "array/map/struct values; project scalar digests instead")
  }
}
