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

  /** Negative-zero normalization (determinism hazard class 4, SURVEY §7.4).
    *
    * A signed expression that rounds to zero yields IEEE -0.0 in DuckDB
    * (sign bit preserved through ROUND) but +0.0 in Spark (round goes via
    * BigDecimal, which has no signed zero). `-0.0 == 0.0` is true, so
    * value-compares pass — but the driver hashes raw bytes and
    * 0x8000000000000000 != 0x0 (the r10/r11 `q_feature_scale` red row).
    * `+ 0.0` maps -0.0 to +0.0 on both engines (IEEE 754 addition) and is
    * the identity everywhere else. Apply to EVERY rounded output column
    * whose input can be negative; mirror `+ 0.0` in the oracle SQL.
    */
  def nz(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c + org.apache.spark.sql.functions.lit(0.0)

  private val tmpDirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  private lazy val cleanupHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tmpDirs.forEach { d =>
        try deleteRecursively(d.toFile)
        catch { case _: Exception => () } // best-effort at exit
      }))
  }

  /** Recursive best-effort tree delete — THE shared helper (review r15:
    * three private copies had grown; Multimodal's memo publisher and
    * RecallReport's panel cleanup now call this one). */
  def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Temp scratch dir for queries that stage a store/index/layout on
    * disk, registered for recursive deletion at JVM exit. Query results
    * read these files LAZILY (Verify/Bench act on the returned frame
    * after the query function returns), so an inline delete would break
    * the plan; the shutdown hook means repeated runs leak nothing
    * beyond the life of one process. Unique per call, so concurrent
    * executions never collide. */
  def tempDir(prefix: String): String = {
    cleanupHook
    val d = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs.add(d)
    d.toString
  }

  /** Per-run unique suffix for global names (catalog tables) derived
    * from a fresh temp path, so concurrent executions cannot collide. */
  def runTag(dir: String): String =
    new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9_]", "_")

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
