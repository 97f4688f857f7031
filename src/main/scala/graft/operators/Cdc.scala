package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** APPLY a change-data-capture feed to a commit-log store — the
  * `apply_changes` / MERGE-from-CDC operator that turns a stream of
  * keyed (op, sequence) events from an upstream database into a
  * replicated table.
  *
  * A raw CDC feed is messy in exactly two ways this operator absorbs:
  * a key can appear MANY times (insert, three updates, a delete, out of
  * order across micro-batches), and inserts/updates/deletes interleave.
  * Resolution: per key, the action with the HIGHEST `seqCol` wins
  * (upstream commit order), everything older is discarded BEFORE any
  * store write — so applying a feed costs one bounded-heap argmax over
  * the feed (feed-sized, never store-sized) plus one Merge upsert and
  * one set-based Delete, both file-grain copy-on-write.
  *
  * Determinism: (key, seq) pairs must be unique per key at the tip —
  * the upstream log's own guarantee; enforced here (duplicate max-seq
  * rows for a key abort loudly rather than apply either one
  * arbitrarily).
  *
  * Idempotence note: re-applying the same feed yields the same store
  * state (upserts overwrite with identical rows; deletes of absent keys
  * no-op) — the crash-replay property a foreachBatch caller needs.
  */
object Cdc {

  /** Apply `feed` to the store at `targetPath`. `feed` columns: the
    * store's data columns + `opCol` (values "I"/"U" upsert, "D" delete)
    * + `seqCol` (orderable). Returns the resulting table. */
  def applyChanges(
      spark: SparkSession,
      targetPath: String,
      feed: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")

    // per-key winner by seq — bounded-heap argmax, feed-sized
    val winners = TopK.perKey(
        feed.withColumn("graft_seq", col(seqCol)),
        keys = keyCols, ordering = Seq("graft_seq"), k = 1)
      .join(feed.withColumnRenamed(seqCol, "graft_seq"),
        keyCols :+ "graft_seq")

    // the upstream log guarantees one action per (key, seq); a tie at
    // the winning seq means a corrupt feed — refuse, don't guess
    val dupTies = winners.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("graft_n")).filter(col("graft_n") > 1)
    val firstDup = dupTies.limit(1).collect()
    require(firstDup.isEmpty,
      s"CDC feed has multiple actions at the winning sequence for key " +
        s"${firstDup.headOption.map(_.toString).getOrElse("")} — refusing to apply")

    val upserts = winners.filter(col(opCol) =!= "D")
      .drop(opCol, "graft_seq")
    val deletes = winners.filter(col(opCol) === "D")
      .select(keyCols.map(col): _*)

    Merge.into(spark, targetPath, upserts, keyCols, log = Some(true))
    Delete.whereIn(spark, targetPath, deletes, keyCols)
  }
}
