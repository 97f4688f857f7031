package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.util.SizeEstimator

/** Join-side sizing helpers. */
object Joins {

  /** MEASURED broadcast switch: materialize `df` once (localCheckpoint —
    * computed a single time, lineage cut) and return it with a broadcast
    * hint when its actual size fits BOTH a row cap and a byte cap;
    * otherwise return the materialized frame for a shuffle join.
    *
    * Use on a join side whose size is data-dependent and unknowable at
    * plan time (an aggregate like a vocabulary or a dimension delta):
    * Catalyst's static size estimate for an aggregate is the CHILD's
    * size, so the built-in autoBroadcastJoinThreshold almost never fires
    * on them, and an unconditional `broadcast()` hint OOMs the driver the
    * day the side grows past memory. Counting costs one job over the
    * already-materialized result — rows of a key-sized aggregate, never
    * the input data.
    *
    * The byte cap exists because row count alone under-constrains memory:
    * 4M rows of wide aggregates (arrays, long strings) can exceed the
    * broadcast budget long before the 8 GB hard limit. Bytes are
    * estimated as rows x the JVM size of a driver-side sample of up to
    * `sampleRows` rows (SizeEstimator over materialized Row objects —
    * an overestimate of the packed UnsafeRow broadcast, so the gate errs
    * toward shuffling, never toward OOM). The sample collect is bounded
    * and only paid when the row gate already passed. */
  def broadcastIfSmall(
      df: DataFrame,
      maxRows: Long = 4000000L,
      maxBytes: Long = 256L * 1024 * 1024,
      sampleRows: Int = 1000): DataFrame = {
    val mat = df.localCheckpoint()
    val n = mat.count()
    if (n > maxRows) return mat
    // a RANDOM sample, not limit(): the first rows of an aggregate are
    // whatever partition sorts first and can be systematically narrower
    // than the tail (e.g. small groups sorting first), which would
    // under-estimate and broadcast an oversized side. No trailing
    // limit() either — GlobalLimit drains partitions IN ORDER, which
    // would re-introduce the same bias; the seeded fraction already
    // bounds the collect at ~sampleRows expected rows.
    val sample =
      (if (n <= sampleRows) mat
       else mat.sample(withReplacement = false,
         math.min(1.0, sampleRows.toDouble / n), seed = 42L))
        .collect()
    val estBytes =
      if (sample.isEmpty) 0L
      else (SizeEstimator.estimate(sample).toDouble / sample.length * n).toLong
    if (estBytes <= maxBytes) broadcast(mat) else mat
  }
}
