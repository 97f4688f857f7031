package graft.flow

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // writes to the session's default warehouse dir (./spark-warehouse,
    // gitignored); warehouse.dir is a static conf and can't move at runtime
    for (t <- Seq("graft_bl", "graft_br")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("k", "rv")
    Sinks.bucketedTable(left, "graft_bl", 4, "k")
    Sinks.bucketedTable(right, "graft_br", 4, "k")

    // force a non-broadcast join so the bucket co-location is what saves
    // the shuffle (at 100 TB neither side of a fact-fact join broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bl").join(spark.table("graft_br"), "k")
      assert(joined.count() == 1000)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // co-located buckets: the join repartitions neither side
      assert(!plan.contains("ShuffleExchange"), plan)
      assert(plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bl")
      spark.sql("DROP TABLE IF EXISTS graft_br")
    }
  }
}
