package graft

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-comparator output contract (see GraftQuery.assertSortableOracle):
  * an oracle query whose output schema contains array/map/struct columns
  * crashes the driver's pandas sort and goes red at the gate no matter how
  * correct the values are (round-7 q_embed_quantize). This spec makes the
  * contract un-missable: a synthetic violator is rejected, and every
  * registered oracle query's resolved schema passes.
  */
class OracleContractSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("a synthetic array-output oracle query is rejected at the contract check") {
    val bad = GraftQuery(
      "q_synthetic_array_out",
      (s, d) => s.read.parquet(s"$d/embeddings.parquet")
        .select("vec_id", "embedding"),
      Some("SELECT vec_id, embedding FROM embeddings"))
    val schema = bad.run(spark, sfDir).schema
    val e = intercept[IllegalArgumentException] {
      GraftQuery.assertSortableOracle(bad.name, schema)
    }
    assert(e.getMessage.contains("embedding"), e.getMessage)
    assert(e.getMessage.contains("q_synthetic_array_out"), e.getMessage)
  }

  test("every registered oracle query emits only sortable scalar columns") {
    val oracled = SparkEntry.allQueries.filter(_.oracle.isDefined)
    assert(oracled.nonEmpty)
    oracled.foreach { q =>
      val schema = q.run(spark, sfDir).schema
      GraftQuery.assertSortableOracle(q.name, schema)
    }
  }
}
