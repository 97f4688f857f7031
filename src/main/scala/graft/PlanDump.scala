package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan for one or all declared
  * queries — the "is this the plan I'd want at 100 TB" review loop
  * (pushed filters, broadcast joins, whole-stage codegen spans).
  *
  * Usage: runMain graft.PlanDump [queryName] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = name match {
      case Some(n) => Seq(n -> SparkEntry.queries(n))
      case None => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    targets.foreach { case (n, fn) =>
      println(s"\n=== $n ===")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
