package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("PSI identity, monotonicity, and count grounding") {
    val base = (1 to 1000).map(i => (i.toLong, (i % 50 + 1).toDouble))
      .toDF("id", "v")
    // identical snapshots → zero drift exactly (no eps floor engaged:
    // every bucket is populated on both sides)
    val same = Drift.psi(base, base, "v", 10, 1.0, 51.0).head()
    assert(same.getDouble(0) == 0.0, same)
    assert(same.getLong(1) == 1000 && same.getLong(2) == 1000)
    // a truncated distribution drifts significantly; a random half does not
    val trunc = Drift.psi(base, base.filter($"v" <= 25), "v", 10, 1.0, 51.0)
      .head().getDouble(0)
    val subset = Drift.psi(base, base.filter($"id" % 2 === 0), "v", 10, 1.0, 51.0)
      .head().getDouble(0)
    assert(trunc > 0.25, s"truncated psi $trunc should flag significant drift")
    assert(subset < 0.1, s"subset psi $subset should be stable")
    assert(trunc > subset)
  }
}
