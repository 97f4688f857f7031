package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style training-sequence packing: documents are concatenated in a
  * deterministic order and cut into fixed `ctxTokens` windows, so every
  * training sequence is full and no padding is wasted — the standard
  * "concat-then-chunk" batch layout an LLM data pipeline emits last,
  * after curation/dedup/split.
  *
  * Each doc is labeled with the sequence its first token lands in
  * (`seq_id`) and its offset inside that sequence (`seq_off`); docs may
  * straddle sequence boundaries, exactly like the training layout they
  * describe. Packing is SHARDED: a global token cumsum would be one
  * unpartitioned window — a single task holding the whole corpus at
  * 100 TB. Instead docs shard deterministically by `id % shards`, each
  * shard packs independently (its own cumsum, its own sequence space:
  * `seq_id = shard * 1e12 + seqInShard`), and shards pack in parallel.
  * Set `shards` to cluster parallelism in production; sequence QUALITY
  * is unaffected because sequences never span shards by construction.
  * Deterministic and engine-reproducible: same docs in, same layout out,
  * independent of partitioning (the label derives only from id order and
  * token counts).
  */
object SeqPack {

  def pack(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ctxTokens: Int = 2048,
      shards: Int = 8): DataFrame = {
    require(ctxTokens > 0 && shards > 0)
    val win = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(
        col(idCol),
        pmod(col(idCol), lit(shards)).as("shard"),
        graft.functions.TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(win), lit(0L)))
      .select(
        col(idCol),
        col("shard"),
        col("n_tokens"),
        (col("shard") * 1000000000000L +
          expr(s"cum_before div $ctxTokens")).as("seq_id"),
        pmod(col("cum_before"), lit(ctxTokens.toLong)).as("seq_off"))
  }

  /** One doc's placement under [[packBestFit]]. `seq_off` is the token
    * offset where the doc starts inside its sequence; `truncated` marks
    * an oversized doc (n_tokens > ctx) that got a singleton sequence and
    * will be cut at the context edge downstream. */
  final case class Packed(
      id: Long, shard: Int, n_tokens: Long, seq_id: Long, seq_off: Long,
      truncated: Boolean)

  /** One shard's carried open-bin state: the next bin id to mint and the
    * open (partially filled) bins as (remaining, binId) pairs. The
    * streaming packer ([[graft.streaming.StreamOps.seqPackStream]])
    * checkpoints one of these per shard across micro-batches; batch
    * packing is the same core from [[BinState.empty]]. */
  final case class BinState(nextBin: Long, open: Seq[(Long, Long)])
  object BinState { val empty: BinState = BinState(0L, Nil) }

  /** Best-fit-decreasing packing of ONE shard's docs ((id, n_tokens),
    * any order) against carried open-bin state — the shared core of
    * [[packBestFit]] (empty initial state) and the streaming packer
    * (state carried across micro-batches). Docs sort (tokens desc,
    * id asc); placement picks the TIGHTEST open bin that fits, lowest
    * bin id among equals; oversized docs get singleton truncated bins.
    * A bin's fill is always ctx − remaining (invariant maintained by
    * construction), so the start offset is ctx − remaining-at-placement.
    * Deterministic: a pure function of (docs, state). */
  def packGroup(
      shard: Int,
      docs: Array[(Long, Long)],
      ctxTokens: Int,
      state: BinState): (Seq[Packed], BinState) = {
    val ctx = ctxTokens.toLong
    val open = new java.util.TreeMap[(Long, Long), Unit](
      Ordering.Tuple2[Long, Long])
    state.open.foreach(p => open.put(p, ()))
    var nextBin = state.nextBin
    val ds = docs.sortBy(t => (-t._2, t._1)) // tokens desc, id asc
    val out = new scala.collection.mutable.ArrayBuffer[Packed](ds.length)
    ds.foreach { case (id, n) =>
      val need = math.min(n, ctx)
      val slot = open.ceilingKey((need, -1L))
      val (binId, off) =
        if (slot == null || n > ctx) { // no fit, or oversized singleton
          val b = nextBin; nextBin += 1
          if (n < ctx) open.put((ctx - n, b), ())
          (b, 0L)
        } else {
          val (rem, b) = slot
          open.remove(slot)
          if (rem - need > 0) open.put((rem - need, b), ())
          (b, ctx - rem)
        }
      out += Packed(id, shard, n, shard * 1000000000000L + binId, off, n > ctx)
    }
    // seq_id namespaces shards at 1e12 bins each; a long-lived streaming
    // shard whose bin counter crossed that width would silently collide
    // into the next shard's ids (r17 ADVICE) — fail loudly instead.
    require(nextBin < 1000000000000L,
      s"shard $shard exhausted its 1e12-bin seq_id namespace " +
        s"(nextBin=$nextBin) — restart the packer with more shards")
    import scala.jdk.CollectionConverters._
    (out.toSeq, BinState(nextBin, open.keySet().asScala.toSeq))
  }

  /** Whole-document packing: best-fit-decreasing bin packing within each
    * shard — the layout real training pipelines prefer over
    * concat-then-chunk when documents must NOT straddle sequence
    * boundaries (attention never crosses a doc cut, no mid-document
    * truncation of reasoning chains). The price is padding: bins are not
    * always full; best-fit-decreasing keeps that waste within the
    * classic ≤ 11/9·OPT + 1 bin-packing bound and always at or under a
    * naive in-arrival-order first-fit.
    *
    * Same sharding story as [[pack]]: docs shard by `id % shards`, each
    * shard packs independently and in parallel, sequences never span
    * shards (`seq_id = shard·1e12 + bin`). Within a shard the packing is
    * genuinely sequential state (open bins with remaining capacity), so
    * it runs as per-group imperative logic over a sorted doc array —
    * `shards` is the parallelism AND memory grain: size it so one
    * shard's (id, tokens) pairs fit an executor (16 bytes/doc — a
    * billion-doc corpus at shards=1024 is ~16 MB per group).
    *
    * Deterministic and partitioning-independent: docs sort by
    * (tokens desc, id asc) inside the group; the best-fit tie-break is
    * (tightest remaining, lowest bin id); oversized docs get singleton
    * bins flagged `truncated`. */
  def packBestFit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ctxTokens: Int = 2048,
      shards: Int = 8): DataFrame = {
    require(ctxTokens > 0 && shards > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col(idCol).cast("long").as("id"),
        pmod(col(idCol), lit(shards)).cast("int").as("shard"),
        graft.functions.TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .as[(Long, Int, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (shard: Int, it: Iterator[(Long, Int, Long)]) =>
        packGroup(shard, it.map(t => (t._1, t._3)).toArray,
          ctxTokens, BinState.empty)._1.iterator
      }
      .toDF()
      .withColumnRenamed("id", idCol)
  }

  /** Padding accounting for a [[packBestFit]] layout: tokens placed vs
    * sequence capacity. One aggregate over the packed table. */
  def utilization(packed: DataFrame, ctxTokens: Int): Double = {
    val row = packed.agg(
      sum(least(col("n_tokens"), lit(ctxTokens.toLong))).as("placed"),
      countDistinct(col("seq_id")).as("bins")).head()
    val placed = row.getLong(0)
    val bins = row.getLong(1)
    if (bins == 0) 1.0 else placed.toDouble / (bins * ctxTokens.toLong)
  }
}
