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
}
