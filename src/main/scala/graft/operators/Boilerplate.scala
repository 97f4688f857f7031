package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repeated-segment (boilerplate) removal — the curation step between
  * whole-document dedup and near-dup: headers, footers, cookie banners
  * and navigation text repeat VERBATIM across many pages whose bodies
  * are distinct, so document-grain dedup keeps them and they end up
  * over-represented in the training mix. The standard fix (C4,
  * RefinedWeb) drops any segment whose exact text occurs in at least
  * `minDocs` distinct documents and keeps the rest of the page.
  *
  * Shape at 100 TB: segmentation is a NARROW whole-stage-codegen
  * projection (split → fixed-width word windows via
  * transform/sequence/slice — no groupBy to build segments); the only
  * shuffles are the document-frequency count at segment grain and the
  * per-document reassembly. The frequent-segment side of the join is
  * `df >= minDocs` — by construction the small side (boilerplate is few
  * DISTINCT strings, however many copies) — so AQE broadcasts it and
  * the segment stream never shuffles for the join.
  *
  * Documents whose every segment is boilerplate come back with empty
  * `clean_text` (callers typically filter on a min length afterwards);
  * null-text documents drop, matching the relational treatment of null
  * everywhere else in the engine.
  *
  * Determinism: segments rebuild in segment order (array_sort over
  * (seg, text) structs), so output text is a pure function of the
  * input — no dependence on partitioning or aggregation order.
  */
object Boilerplate {

  /** Remove segments repeated across `minDocs`+ documents.
    *
    * @param segmentWords fixed segment width in whitespace tokens — the
    *   segmenter; real corpora with layout structure would split on
    *   paragraph boundaries instead, which changes only the narrow
    *   projection
    * @return (doc_id, clean_text, n_removed) one row per non-null doc
    */
  def removeRepeated(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      segmentWords: Int = 50,
      minDocs: Int = 16): DataFrame = {
    require(segmentWords > 0 && minDocs > 1,
      s"need segmentWords > 0 and minDocs > 1, got ($segmentWords, $minDocs)")
    val words = split(col(textCol), " ")
    val segs = docs.select(
      col(idCol).as("doc_id"),
      posexplode(transform(
        // truncating cast, not floor: an empty word array gives -1/segw →
        // 0, so the degenerate doc still produces its single "" segment
        sequence(lit(0), ((size(words) - 1) / segmentWords).cast("int")),
        i => array_join(
          slice(words, i * segmentWords + 1, lit(segmentWords)), " ")))
        .as(Seq("seg", "seg_text")))
    val boiler = segs
      .groupBy("seg_text")
      .agg(countDistinct(col("doc_id")).as("graft_df"))
      .filter(col("graft_df") >= minDocs)
      .select(col("seg_text"), lit(true).as("graft_boiler"))
    segs
      .join(boiler, Seq("seg_text"), "left")
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("graft_boiler").isNull,
                struct(col("seg"), col("seg_text"))))),
            _.getField("seg_text")),
          " ").as("clean_text"),
        count(when(col("graft_boiler"), 1)).as("n_removed"))
  }
}
