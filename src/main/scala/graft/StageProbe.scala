package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-local stage timer for chasing a specific query's cost
  * decomposition (the r14 near-dup bench work). Not driver-facing. */
object StageProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up
    sources.Tables.documents(spark, sfDir).count()
    sources.Tables.embeddings(spark, sfDir).count()

    for (rep <- 1 to 3) {
      System.err.println(s"=== rep $rep ===")
      val docs = sources.Tables.documents(spark, sfDir)
      val sig = time("mh sig scan+persist") {
        val s = docs.select(
          col("doc_id").as("graft_id"),
          org.apache.spark.sql.graft.Md5Expressions
            .md5MinhashText(col("text"), 3, 32).as("graft_sig")).persist()
        s.count(); s
      }
      time("mh banded window") {
        import org.apache.spark.sql.expressions.Window
        val rows = 4
        val banded = sig
          .select(col("graft_id"), explode(array((0 until 8).map { b =>
            struct(lit(b).as("band"),
              slice(col("graft_sig"), b * rows + 1, rows).as("bucket"))
          }: _*)).as("graft_band"))
          .select(col("graft_id"), col("graft_band.band"), col("graft_band.bucket"))
        val w = Window.partitionBy("band", "bucket")
        val pruned = banded.withColumn("n", count(lit(1)).over(w))
          .filter(col("n") <= 1000 && col("n") >= 2).drop("n")
        val cand = pruned.as("l")
          .join(pruned.as("r"),
            col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
              col("l.graft_id") < col("r.graft_id"))
          .select(col("l.graft_id").as("id_a"), col("r.graft_id").as("id_b"))
          .distinct()
        System.err.println(s"[probe]   candidates: ${cand.count()}")
      }
      time("mh full") {
        operators.Dedup.minhashNearDupReplayable(docs, "doc_id", "text",
          numHashes = 32, bands = 8, shingleN = 3, threshold = 0.8).count()
      }
      time("mh full+orderBy (registered)") {
        SparkEntry.queries("q_minhash_pairs")(spark, sfDir).count()
      }
      sig.unpersist()

      val emb = sources.Tables.embeddings(spark, sfDir)
      time("emb count+dim") {
        emb.agg(count(lit(1)), max(size(col("embedding")))).head
      }
      time("emb bucket scan") {
        emb.select(operators.Similarity.replayableHyperplaneBucket(
          col("embedding"), 4, 64).as("b")).groupBy("b").count().count()
      }
      time("emb full") {
        operators.Dedup.embeddingNearDupReplayable(emb, "vec_id", "embedding",
          threshold = 0.3).count()
      }
      time("semantic full") {
        SparkEntry.queries("q_semantic_dedup")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
