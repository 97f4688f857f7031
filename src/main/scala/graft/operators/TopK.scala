package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKAgg

/** Per-key top-k without a window sort.
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` shuffles and
  * sorts every row of every group; this operator aggregates with a
  * bounded heap instead (see org.apache.spark.sql.graft.TopKAgg), so the
  * map side already reduces each (partition, key) to k rows — the
  * shuffle carries k·|keys| rows, the reduce side merges heaps, nothing
  * is ever sorted beyond k elements. The 100 TB shape for "top n
  * documents per domain", "latest k events per user", etc.
  */
object TopK {

  /** Top `k` rows per `keys` group, ranked by `ordering` columns compared
    * left-to-right, all descending when `desc` (include a unique id as
    * the last ordering column for fully deterministic output). Returns
    * `keys ++ ordering` columns, k rows per key, best first. */
  def perKey(
      df: DataFrame,
      keys: Seq[String],
      ordering: Seq[String],
      k: Int,
      desc: Boolean = true): DataFrame = {
    val strct = struct(ordering.map(col): _*)
    val keyCols: Seq[Column] = keys.map(col)
    df.groupBy(keyCols: _*)
      .agg(TopKAgg.topK(strct, k, largest = desc).as("graft_topk"))
      .select(keyCols :+ explode(col("graft_topk")).as("graft_row"): _*)
      .select(keyCols ++ ordering.map(c => col(s"graft_row.$c").as(c)): _*)
  }
}
