package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-local work-linearity probe (TEST scope on purpose — the r15
  * review deleted its src/main predecessor for shipping in the jar and
  * rotting): counts the CANDIDATE work of the decade-2 suspicious rows
  * so a wall-clock slope can be attributed to plan growth vs the memory
  * hierarchy (the SCALE_r14 discipline).
  *
  * Usage: Test/runMain graft.dev.ScaleWorkProbe <sfDir>
  * Prints containment candidate-pair count and simhash/media pair-graph
  * sizes for the given fixture.
  */
object ScaleWorkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/scale/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)

    // containment candidate volume: prefixes (df >= 2) joined to full
    // posting lists — the df-bounded join the operator pays, COUNTED
    // not materialized
    val sh = docs.select(col("doc_id").as("graft_id"),
      array_distinct(graft.functions.TextFunctions.shingles(col("text"), 3))
        .as("graft_sh"))
    val docTok = sh.select(col("graft_id"), explode(col("graft_sh")).as("graft_tok"))
    val tokWin = org.apache.spark.sql.expressions.Window.partitionBy("graft_tok")
    val withDf = docTok.withColumn("graft_df", count(lit(1)).over(tokWin))
    val t = 0.8
    val ordered = withDf.groupBy("graft_id")
      .agg(sort_array(collect_list(struct(col("graft_df"), col("graft_tok"))))
        .as("graft_ord"))
    val plen = (size(col("graft_ord")) -
      ceil(lit(t) * size(col("graft_ord")) - lit(1e-9)).cast("int") + 1)
    val prefixes = ordered
      .select(col("graft_id"), explode(slice(col("graft_ord"), lit(1), plen)).as("e"))
      .select(col("graft_id"), col("e.graft_tok").as("graft_tok"),
        col("e.graft_df").as("graft_df"))
      .filter(col("graft_df") >= 2)
    val nPrefix = prefixes.count()
    val candidates = prefixes.as("a")
      .join(withDf.select("graft_id", "graft_tok").as("b"),
        col("a.graft_tok") === col("b.graft_tok") &&
          col("a.graft_id") =!= col("b.graft_id"))
      .count()
    println(s"[probe] $sfDir containment: prefixRows=$nPrefix candidatePairs=$candidates")

    // media text stage: simhash pair-graph size (the CC input)
    val pairs = graft.operators.Dedup.simhashNearDupReplayable(
      docs, "doc_id", "text", maxHamming = 7, chunks = 4).count()
    println(s"[probe] $sfDir simhash pairs=$pairs")
    spark.stop()
  }
}
