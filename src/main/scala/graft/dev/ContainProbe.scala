package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch plan probe for q_containment tuning (builder-local). */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}")
      r
    }
    timed("warm full")(graft.operators.Dedup.containmentNearDup(
      docs, "doc_id", "text", 3, 0.8).count())
    // mirror the operator body WITH its persist
    val sh = docs.select(col("doc_id").as("graft_id"),
      array_distinct(graft.functions.TextFunctions.shingles(col("text"), 3)).as("graft_sh"))
      .persist()
    timed("sh materialize")(sh.count())
    val docTok = sh.select(col("graft_id"), explode(col("graft_sh")).as("graft_tok"))
    val tokWin = org.apache.spark.sql.expressions.Window.partitionBy("graft_tok")
    val withDf = docTok.withColumn("graft_df", count(lit(1)).over(tokWin))
    val ordered = withDf.groupBy("graft_id")
      .agg(sort_array(collect_list(struct(col("graft_df"), col("graft_tok")))).as("graft_ord"))
    val plen = (size(col("graft_ord")) -
      ceil(lit(0.8) * size(col("graft_ord")) - lit(1e-9)).cast("int") + 1)
    val prefixes = ordered
      .select(col("graft_id"), explode(slice(col("graft_ord"), lit(1), plen)).as("graft_e"))
      .select(col("graft_id"), col("graft_e.graft_tok").as("graft_tok"),
        col("graft_e.graft_df").as("graft_df"))
    timed("prefixes (cached sh)")(prefixes.count())
    val candidates = prefixes.filter(col("graft_df") >= 2).as("a")
      .join(withDf.select("graft_id", "graft_tok").as("b"),
        col("a.graft_tok") === col("b.graft_tok") && col("a.graft_id") =!= col("b.graft_id"))
      .select(col("a.graft_id").as("id_a"), col("b.graft_id").as("id_b"))
    timed("candidates (cached sh)")(candidates.count())
    val result = candidates
      .join(sh.select(col("graft_id").as("id_a"), col("graft_sh").as("sh_a")), "id_a")
      .join(sh.select(col("graft_id").as("id_b"), col("graft_sh").as("sh_b")), "id_b")
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") / size(col("sh_a")))
      .filter(col("containment") >= 0.8)
      .select(col("id_a"), col("id_b"), round(col("containment"), 4).as("containment"))
      .distinct()
    timed("full (cached sh)")(result.count())
    timed("full again")(result.count())
    sh.unpersist()
    timed("operator fresh 1")(graft.operators.Dedup.containmentNearDup(
      docs, "doc_id", "text", 3, 0.8).count())
    timed("operator fresh 2")(graft.operators.Dedup.containmentNearDup(
      docs, "doc_id", "text", 3, 0.8).count())
    spark.stop()
  }
}
