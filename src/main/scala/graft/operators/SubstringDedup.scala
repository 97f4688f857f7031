package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact substring-level deduplication (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499): remove
  * every duplicated token span of length ≥ `minTokens` from all but its
  * most-senior occurrence, keeping the REST of each document. The step
  * document-grain dedup (exact/MinHash/SemDeDup) and segment-grain
  * boilerplate removal both miss: a unique page quoting a duplicated
  * paragraph keeps its unique prose and loses only the quote.
  *
  * The paper builds a corpus-wide suffix array; that is a single-machine
  * construction. The same SEMANTICS re-expressed Spark-first: every
  * length-L token window becomes an (md5(window), doc, start) occurrence
  * row; a window hash seen at more than one position is duplicated, its
  * lexicographically-least (doc_id, start) occurrence is the keeper, and
  * every OTHER occurrence marks its L tokens for removal. Overlapping
  * marked windows inside a doc union into longer spans, so a duplicated
  * paragraph of any length ≥ L is removed wholesale (its windows overlap)
  * — the suffix-array result, from windows. Within-doc repetition
  * collapses the same way (the second copy's windows lose to the first).
  *
  * Exactness: md5 keys make this exact up to 128-bit collision (~2⁻⁶⁴ at
  * corpus scale — the same md5-as-identity contract the splits/sampling
  * family already relies on), and md5 exists in BOTH engines, so the
  * whole pipeline — windows, keeper election, span union, reassembly —
  * replays in DuckDB: q_substring_dedup is driver-gated end to end.
  *
  * Scale shape:
  *  - the window stage is narrow: tokens once per doc, starts via
  *    `sequence`, ONE explode; occurrence rows carry (16-byte hash, id,
  *    int) — never text;
  *  - keeper election is ONE map-side-combinable aggregate on the hash
  *    (min(struct(doc,start)) + count); a boilerplate window shared by a
  *    million docs is a 1-row group result, not a join explosion;
  *  - non-keepers come from the occurrence rows re-joined to that
  *    (hash-partitioned, dup-hashes-only) keeper table — shuffle carries
  *    occurrences, not text;
  *  - span union + reassembly is a per-doc aggregate of START OFFSETS
  *    (bounded by the doc's own token count) joined back to the text for
  *    a narrow rebuild — token i survives iff no removed span covers it.
  */
object SubstringDedup {

  /** Returns (idCol, textCol) with duplicated spans removed; column names
    * preserved. Docs shorter than `minTokens` pass through unchanged; a
    * fully-duplicated doc comes back as the empty string (drop it with a
    * length filter downstream if that is the policy). */
  def dedupSubstrings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 20): DataFrame = {
    require(minTokens >= 2, s"minTokens=$minTokens must be >= 2")
    val l = minTokens

    val base = df.select(
      col(idCol).as("graft_id"),
      split(col(textCol), " ").as("graft_toks"))

    // (hash, doc, start) per length-l window — narrow until the explode
    val occurrences = base
      .filter(size(col("graft_toks")) >= l)
      .select(col("graft_id"),
        explode(sequence(lit(0), size(col("graft_toks")) - l)).as("graft_s"),
        col("graft_toks"))
      .select(col("graft_id"), col("graft_s"),
        md5(concat_ws(" ", slice(col("graft_toks"), col("graft_s") + 1, lit(l))))
          .as("graft_h"))

    // keeper per duplicated hash: ONE aggregate, never a self-join
    val keepers = occurrences
      .groupBy("graft_h")
      .agg(
        min(struct(col("graft_id"), col("graft_s"))).as("graft_keep"),
        count(lit(1)).as("graft_n"))
      .filter(col("graft_n") > 1)
      .select("graft_h", "graft_keep")

    // every non-keeper occurrence of a duplicated window marks a span
    val removedSpans = occurrences
      .join(keepers, Seq("graft_h"))
      .filter(
        col("graft_id") =!= col("graft_keep.graft_id") ||
          col("graft_s") =!= col("graft_keep.graft_s"))
      .groupBy(col("graft_id"))
      .agg(sort_array(collect_set(col("graft_s"))).as("graft_starts"))

    // narrow rebuild: token i survives iff no removed span covers it
    val kept = base
      .join(removedSpans, Seq("graft_id"), "left")
      .select(
        col("graft_id").as(idCol),
        concat_ws(" ",
          transform(
            filter(
              zip_with(
                col("graft_toks"),
                sequence(lit(0), size(col("graft_toks")) - 1),
                (t, i) => struct(t.as("t"), i.as("i"))),
              s => !coveredBy(s.getField("i"), col("graft_starts"), l)),
            s => s.getField("t"))).as(textCol))
    kept
  }

  /** True when token index `i` falls inside any [s, s+l) span of
    * `starts` (null → not covered). */
  private def coveredBy(i: Column, starts: Column, l: Int): Column =
    coalesce(
      exists(starts, s => i >= s && i < s + l),
      lit(false))
}
