package graft.dev
import org.apache.spark.sql.SparkSession
object PairCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/scale/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.prefixJaccardNearDup(
      docs, "doc_id", "text", shingleN = 3, threshold = 0.5)
    val n = pairs.count()
    println(f"[probe] $sfDir jaccard pair-graph rows=$n (${(System.nanoTime()-t0)/1e9}%.1f s)")
    spark.stop()
  }
}
