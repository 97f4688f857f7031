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

  test("categorical PSI/chi2: identity is zero, a removed category " +
    "drifts, a brand-new category folds into __other__ and still flags") {
    val base = (1 to 1000).map(i =>
      (i.toLong, Seq("en", "de", "fr", "ja")(i % 4))).toDF("id", "lang")
    // identical snapshots → exactly zero (all buckets populated both sides)
    val same = Drift.psiCat(base, base, "lang", maxCategories = 3).head()
    assert(same.getDouble(0) == 0.0 && same.getDouble(1) == 0.0, same)
    assert(same.getLong(2) == 1000 && same.getLong(3) == 1000)
    // dropping a category entirely → significant drift on both statistics
    val dropped = Drift.psiCat(base, base.filter($"lang" =!= "de"), "lang",
      maxCategories = 3).head()
    assert(dropped.getDouble(0) > 0.25, s"psi ${dropped.getDouble(0)}")
    assert(dropped.getDouble(1) > 100.0, s"chi2 ${dropped.getDouble(1)}")
    // a category UNSEEN in base (the new-language case) folds into
    // __other__ — wait, ja is base's 4th: with maxCategories=3 it is
    // already __other__; now add a truly new one and grow its share
    val invaded = base.limit(600).unionByName(
      (1 to 400).map(i => (10000L + i, "zh")).toDF("id", "lang"))
    val inv = Drift.psiCat(base, invaded, "lang", maxCategories = 3).head()
    assert(inv.getDouble(0) > 0.25, s"psi ${inv.getDouble(0)}")
    // a mix-preserving half stays stable (id % 2 would CORRELATE with
    // lang = id % 4 and register real drift; % 8 < 4 keeps the mix)
    val half = Drift.psiCat(base, base.filter($"id" % 8 < 4), "lang",
      maxCategories = 3).head()
    assert(half.getDouble(0) < 0.1 && half.getDouble(1) < 10.0, half)
  }
}
