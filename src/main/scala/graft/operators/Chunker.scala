package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training pipelines: split each document into
  * overlapping fixed-size token windows (`chunkTokens` tokens, advancing
  * `stride` tokens per chunk, so consecutive chunks overlap by
  * `chunkTokens - stride`).
  *
  * Entirely narrow — tokenize, generate chunk starts, slice, join — one
  * codegen'd pass per document with no shuffle: chunking 100 TB is
  * scan-bound. The final chunk may be shorter than `chunkTokens` (the
  * document's tail is never dropped), and a chunk is emitted only when
  * the PREVIOUS chunk did not already reach the document's end — a
  * fully-contained tail chunk would inject duplicated text into a
  * training corpus.
  */
object Chunker {

  /** @return one row per chunk: all of `df`'s columns replaced by
    *         (`idCol`, `chunk_ix`, `chunk`). */
  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 512,
      stride: Int = 384): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens (got stride=$stride, chunkTokens=$chunkTokens)")
    val toks = split(col(textCol), " ")
    df.select(col(idCol), toks.as("graft_toks"))
      .select(
        col(idCol),
        // last start s must satisfy (s-1)*stride + chunkTokens < size —
        // i.e. emit chunk s only when chunk s-1 stopped short of the
        // document end — so maxS = max(0, ceil((size - chunkTokens) / stride))
        explode(sequence(lit(0),
          greatest(lit(0L),
            floor((size(col("graft_toks")) - lit(chunkTokens - stride + 1)) /
              lit(stride.toDouble))).cast("int")))
          .as("chunk_ix"),
        col("graft_toks"))
      .select(
        col(idCol),
        col("chunk_ix"),
        concat_ws(" ",
          slice(col("graft_toks"), col("chunk_ix") * stride + 1, lit(chunkTokens)))
          .as("chunk"))
  }
}
