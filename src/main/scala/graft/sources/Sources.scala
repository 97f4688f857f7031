package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources beyond the fixture parquet (SURVEY.md §2.2: the
  * reference has no built-in sources — A24 — so the engine's source
  * surface is Spark's reader path with schemas pinned explicitly).
  *
  * Always pass a schema in production: schema inference reads the data
  * twice and locks the job to whatever the first sample implied — at
  * 100 TB both are bugs, so these helpers make the schema parameter
  * non-optional except for self-describing parquet.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC — the other self-describing columnar format Spark reads
    * natively (same pushdown/pruning machinery as parquet). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Malformed rows are genuinely quarantined: the raw bad line lands in
    * `_corrupt_record` (non-null there ⇒ the row failed parsing), so
    * corrupt data is countable and separable from legitimate nulls —
    * PERMISSIVE alone would silently null the fields. */
  val corruptCol = "_corrupt_record"

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** JSON-lines (one object per line — the streaming-friendly layout). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Raw text: one row per line, column `value`. */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Avro container files — block-splittable read on the mapreduce I/O
    * path (the external spark-avro module is absent here; see
    * [[graft.sources.Avro]] for the full reader/writer/quarantine
    * surface and the supported type subset). */
  def avro(spark: SparkSession, path: String,
      avroSchemaJson: Option[String] = None): DataFrame =
    Avro.read(spark, path, avroSchemaJson)

  /** Streaming file source: picks up new files per micro-batch;
    * `maxFilesPerTrigger` is the backpressure knob (A23 BoundedCapacity
    * parity). */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet", maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .format(format)
      .load(path)
}
