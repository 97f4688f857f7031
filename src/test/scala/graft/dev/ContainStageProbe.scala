package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-local stage-time probe for q_containment at scale (r16 task
  * 2): splits the operator's wall into (cache build) / (candidate join)
  * / (verify join) so the optimization target is measured, not guessed.
  *
  * Usage: Test/runMain graft.dev.ContainStageProbe <sfDir>
  */
object ContainStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/scale/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val t = 0.8

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = docs.select(col("doc_id").as("graft_id"),
      sort_array(array_distinct(
        graft.functions.TextFunctions.shingles(col("text"), 3))).as("graft_sh"))
      .persist()
    val docTok = sh.select(col("graft_id"), explode(col("graft_sh")).as("graft_tok"))
    val tokWin = org.apache.spark.sql.expressions.Window.partitionBy("graft_tok")
    val withDf = docTok.withColumn("graft_df", count(lit(1)).over(tokWin))
    val ordered = withDf.groupBy("graft_id")
      .agg(sort_array(collect_list(struct(col("graft_df"), col("graft_tok"))))
        .as("graft_ord"))
      .persist()
    timed("cache build (sh + ordered materialize)") {
      ordered.count()
    }
    val plen = (size(col("graft_ord")) -
      ceil(lit(t) * size(col("graft_ord")) - lit(1e-9)).cast("int") + 1)
    val prefixes = ordered
      .select(col("graft_id"), size(col("graft_ord")).as("graft_sz"),
        explode(slice(col("graft_ord"), lit(1), plen)).as("graft_e"))
      .select(col("graft_id"), col("graft_sz"),
        col("graft_e.graft_tok").as("graft_tok"),
        col("graft_e.graft_df").as("graft_df"))
    def candidates = prefixes.filter(col("graft_df") >= 2).as("a")
      .join(
        ordered.select(col("graft_id"), size(col("graft_ord")).as("graft_sz"),
          explode(col("graft_ord.graft_tok")).as("graft_tok")).as("b"),
        col("a.graft_tok") === col("b.graft_tok") &&
          col("a.graft_id") =!= col("b.graft_id") &&
          col("b.graft_sz").cast("double") >=
            lit(t) * col("a.graft_sz") - lit(1e-9))
      .select(col("a.graft_id").as("id_a"), col("b.graft_id").as("id_b"))
    val nCand = timed("candidate join (count only)") { candidates.count() }
    println(s"[probe] candidates=$nCand")
    val result = candidates
      .join(sh.select(col("graft_id").as("id_a"), col("graft_sh").as("sh_a")), "id_a")
      .join(sh.select(col("graft_id").as("id_b"), col("graft_sh").as("sh_b")), "id_b")
      .withColumn("containment",
        org.apache.spark.sql.graft.SortedIntersectSize
          .sortedIntersectSize(col("sh_a"), col("sh_b")).cast("double") /
          size(col("sh_a")))
      .filter(col("containment") >= t)
      .select(col("id_a"), col("id_b"), round(col("containment"), 4).as("containment"))
      .distinct()
    val nRes = timed("candidate join + VERIFY (full result)") { result.count() }
    println(s"[probe] survivors=$nRes")
    spark.stop()
  }
}
