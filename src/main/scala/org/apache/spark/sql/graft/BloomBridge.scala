package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Bridge to Spark's OWN bloom-filter expressions (the machinery behind
  * `spark.sql.optimizer.runtime.bloomFilter` injected filters). Neither
  * `bloom_filter_agg` nor `might_contain` is registered in the public
  * FunctionRegistry in Spark 4.1, so graft.operators.Joins reaches them
  * through this package-private bridge — reusing Spark's codegen'd,
  * spill-tested implementation instead of hand-rolling a sketch.
  */
object BloomBridge {

  /** Aggregate a bloom sketch (binary) of `key`'s xxhash64 values. */
  def bloomAggregate(key: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(key))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of `key`'s xxhash64 against a collected sketch
    * (inlined as a binary literal — broadcast with the plan). */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        Literal(sketch, BinaryType),
        new XxHash64(Seq(ExpressionUtils.expression(key)))))

  /** DRIVER-side probe of a collected sketch: hashes `value` exactly as
    * [[bloomAggregate]] hashed the column (catalyst XxHash64 over a
    * literal), so the answer matches what the distributed probe would
    * say. The value's Scala type must map to the SAME Spark type as the
    * aggregated column — xxhash64 is type-sensitive (an Int probe of a
    * LongType column hashes differently and silently never matches);
    * use [[hashForType]] + [[deserialize]] when the column's DataType is
    * known, which casts the probe first and amortizes sketch decoding. */
  def mightContainValue(sketch: Array[Byte], value: Any): Boolean = {
    val h = new XxHash64(Seq(Literal(value))).eval(null).asInstanceOf[Long]
    deserialize(sketch).mightContainLong(h)
  }

  /** xxhash64 of `value` AS the column's type `dt` — the hash the
    * aggregate computed for an equal column value. The probe is cast to
    * `dt` first (an Int probing a LongType column must hash as a Long);
    * None when the cast fails, so a type-mismatched probe degrades to
    * "cannot rule anything out" instead of silently mis-pruning. */
  def hashForType(
      value: Any,
      dt: org.apache.spark.sql.types.DataType): Option[Long] = {
    val lit = Literal(value)
    val casted: Any =
      if (lit.dataType == dt) lit.value
      else if (org.apache.spark.sql.catalyst.expressions.Cast
        .canCast(lit.dataType, dt))
        // Session timezone supplied (a timezone-dependent cast — e.g.
        // string probe of a timestamp column — throws at eval when built
        // with timeZoneId=None), and try/catch as the backstop: a failed
        // probe must degrade to None (scan everything), not fail the
        // lookup.
        try {
          org.apache.spark.sql.catalyst.expressions.Cast(
            lit, dt,
            timeZoneId = Some(
              org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone),
            evalMode =
              org.apache.spark.sql.catalyst.expressions.EvalMode.TRY).eval(null)
        } catch { case scala.util.control.NonFatal(_) => null }
      else null
    Option(casted).map(c =>
      new XxHash64(Seq(Literal.create(c, dt))).eval(null).asInstanceOf[Long])
  }

  /** Decode a collected sketch ONCE; probe with `mightContainLong`. */
  def deserialize(sketch: Array[Byte]): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(sketch))
}
