package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col, explode, lit, pmod, sequence, xxhash64}
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
    * broadcast budget long before the 8 GB hard limit. Bytes are measured
    * EXACTLY: the side is already materialized (localCheckpoint), so one
    * pass over its UnsafeRows sums the true packed size — no sampling, so
    * no way for a heavy-tailed row-size distribution (a few huge
    * array/text rows in an otherwise narrow aggregate) to slip under the
    * gate the way a mean-extrapolated sample could. The measured bytes
    * are doubled for the broadcast HashedRelation's hash-table overhead
    * before comparing against `maxBytes`. If some partition yields
    * non-UnsafeRow rows (no known case, but the InternalRow contract
    * allows it), fall back to the conservative sample estimate blended
    * with the sampled max so the gate still errs toward shuffling. */
  def broadcastIfSmall(
      df: DataFrame,
      maxRows: Long = 4000000L,
      maxBytes: Long = 256L * 1024 * 1024,
      sampleRows: Int = 1000): DataFrame = {
    val mat = df.localCheckpoint()
    // ONE pass yields rows AND bytes (r18-opt: this was a count() job
    // followed by a second size-scan job over the same checkpointed
    // partitions — both numbers fall out of one iterator walk; the size
    // sum is wasted work only in the n > maxRows early-return case,
    // where the pass is the same either way)
    val perPart = mat.queryExecution.toRdd.mapPartitions { it =>
      var cnt = 0L
      var sum = 0L
      var exact = true
      it.foreach {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          cnt += 1; sum += u.getSizeInBytes
        case _ => cnt += 1; exact = false
      }
      Iterator.single((cnt, sum, exact))
    }.collect().map { case (c, s, e) => (s, e, c) }
    val n = perPart.map(_._3).sum
    if (n > maxRows) return mat
    val estBytes =
      if (perPart.forall(_._2)) perPart.map(_._1).sum * 2
      else {
        // a RANDOM sample, not limit(): the first rows of an aggregate are
        // whatever partition sorts first and can be systematically narrower
        // than the tail, which would under-estimate and broadcast an
        // oversized side. Blend the mean-extrapolation with the sampled
        // max so one observed wide row bounds the unobserved tail.
        val sample =
          (if (n <= sampleRows) mat
           else mat.sample(withReplacement = false,
             math.min(1.0, sampleRows.toDouble / n), seed = 42L))
            .collect()
        if (sample.isEmpty) 0L
        else {
          val mean = SizeEstimator.estimate(sample).toDouble / sample.length
          val maxRow = sample.map(r => SizeEstimator.estimate(
            r.asInstanceOf[AnyRef])).max
          math.max((mean * n).toLong, maxRow * math.min(n, sampleRows.toLong))
        }
      }
    if (estBytes <= maxBytes) broadcast(mat) else mat
  }

  /** Bloom-filter SEMI-JOIN REDUCTION: filter `fact` down to rows whose
    * key probably exists in `dim` BEFORE the join's shuffle, using a
    * bloom sketch of dim's key set.
    *
    * The gap this fills between broadcast and shuffle joins: a dimension
    * of 10⁸ keys can't broadcast as a hash relation (tens of GB with
    * row + table overhead), but its bloom sketch at ~10 bits/key is
    * ~125 MB — so the fact side's non-matching rows (the bulk, when the
    * dim is selective) die AT THE SCAN instead of traveling through the
    * exchange. This is exactly Spark's own injected runtime filter
    * (spark.sql.optimizer.runtime.bloomFilter), exposed as an explicit
    * operator because the optimizer's version only fires on selective
    * joins it can PROVE selective and within its own size thresholds;
    * a pipeline that knows its dimensions can size the sketch
    * deliberately.
    *
    * Exactness is unconditional: the bloom filter has false positives
    * but NO false negatives, and the real join still runs after the
    * prefilter — so the result is row-identical to the plain join (the
    * q_join_bloom oracle is the PLAIN SQL join, no bloom anywhere).
    * False-positive rows merely survive to the join and are dropped
    * there, same as without the filter.
    *
    * Driver memory is `numBits/8` bytes (the collected sketch — the
    * same bounded-by-contract envelope as a broadcast side). NULL fact
    * keys are dropped by the filter (might_contain(NULL) is NULL) —
    * identical semantics to the inner join they could never match. */
  def bloomReducedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8000000L): DataFrame = {
    import org.apache.spark.sql.graft.BloomBridge
    val sketch = BloomBridge.bloomAggregate(dim(dimKey), expectedItems, numBits)
    // one row of numBits/8 bytes to the driver; null when dim is empty
    val bytes = dim.select(sketch.as("graft_bf"))
      .collect().head.getAs[Array[Byte]](0)
    val reduced = fact.filter(BloomBridge.mightContain(bytes, fact(factKey)))
    reduced.join(dim, reduced(factKey) === dim(dimKey))
  }

}
