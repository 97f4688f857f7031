package graft.functions

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_hll_sketch's merge algebra (rows-only query): Datasketches HLL
  * sketches built per group and UNIONED must estimate the same
  * cardinality as one sketch over the whole column — the property that
  * lets distinct-counting scale to 100 TB by shipping fixed-size register
  * arrays instead of values. */
class HllSketchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("union of per-group sketches estimates the global distinct count") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = docs.agg(countDistinct("text")).head().getLong(0).toDouble

    val merged = docs.groupBy("lang")
      .agg(expr("hll_sketch_agg(text, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))"))
      .head().getLong(0).toDouble

    val direct = docs.agg(expr("hll_sketch_estimate(hll_sketch_agg(text, 12))"))
      .head().getLong(0).toDouble

    // lgK=12 → relative standard error ≈ 1.04/√2^12 ≈ 1.6%; 5% is a
    // generous envelope that survives fixture regeneration
    assert(math.abs(merged - exact) / exact < 0.05,
      s"merged estimate $merged vs exact $exact")
    // merging a partition of the items must agree with sketching them all
    // at once (registers are order- and partition-independent)
    assert(math.abs(merged - direct) / direct < 0.01,
      s"merged $merged vs direct $direct")
  }

  test("sketch union is insensitive to how rows are partitioned " +
    "(within sketch error)") {
    import spark.implicits._
    val vals = (1 to 5000).map(i => (i % 7, s"v${i % 1200}")).toDF("g", "v")
    val byGroup = vals.groupBy("g").agg(expr("hll_sketch_agg(v, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")).head().getLong(0)
    val bySplit = vals.withColumn("g2", col("v").substr(2, 1))
      .groupBy("g2").agg(expr("hll_sketch_agg(v, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")).head().getLong(0)
    // not register-exact: a sketch's coupon-list→HLL-array promotion point
    // depends on its group's size, and the union inherits whichever
    // happened — estimates agree within the sketch's error band, not bit-
    // for-bit
    assert(math.abs(byGroup - bySplit) <= 0.01 * byGroup + 1,
      s"same item set, different grouping: $byGroup vs $bySplit")
    assert(math.abs(byGroup - 1200L) <= 0.05 * 1200,
      s"estimate $byGroup far from exact 1200")
  }
}
