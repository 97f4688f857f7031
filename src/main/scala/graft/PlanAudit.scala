package graft
import org.apache.spark.sql.SparkSession

/** Builder-local plan diagnostics. With query names as args: dump each
  * formatted plan. With NO args: sweep EVERY registered query at
  * sf0.001 and flag the 100 TB antipatterns a refactor could silently
  * introduce — a Window fed by a single-partition exchange (one task
  * holds everything), a cartesian product, or a broadcast nested-loop
  * join. A flag is a lead to audit, not automatically a bug (global
  * aggregates legitimately use SinglePartition; tiny deliberate cross
  * joins exist) — the point is that the list stays SHORT and every entry
  * has a known story. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    if (args.nonEmpty) {
      for (q <- args) {
        println(s"===== $q =====")
        SparkEntry.queries(q)(spark, d).explain("formatted")
      }
    } else {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val df = fn(spark, d)
          df.collect()
          val plan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==")(0)
          // window-on-single-partition must be ADJACENT (the window's own
          // input exchange), not mere co-occurrence — a scalar aggregate
          // elsewhere in the same plan legitimately uses SinglePartition
          val lines = plan.linesIterator.toIndexedSeq
          val globalWindow = lines.zipWithIndex.exists { case (l, i) =>
            l.contains("Window") &&
              lines.slice(i + 1, i + 5).exists(_.contains("Exchange SinglePartition"))
          }
          val flags = Seq(
            "window-on-single-partition" -> globalWindow,
            "cartesian-product" -> plan.contains("CartesianProduct"),
            "broadcast-nested-loop" -> plan.contains("BroadcastNestedLoopJoin"))
            .collect { case (f, true) => f }
          println(s"AUDIT $name: ${if (flags.isEmpty) "ok" else flags.mkString(",")}")
        } catch { case e: Throwable =>
          println(s"AUDIT $name: ERR ${Option(e.getMessage).getOrElse(e.toString).take(120)}")
        }
      }
    }
    spark.stop()
  }
}
