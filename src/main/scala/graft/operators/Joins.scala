package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-side sizing helpers. */
object Joins {

  /** MEASURED broadcast switch: materialize `df` once (localCheckpoint —
    * computed a single time, lineage cut) and return it with a broadcast
    * hint when its actual row count is at or under `maxRows`; otherwise
    * return the materialized frame for a shuffle join.
    *
    * Use on a join side whose size is data-dependent and unknowable at
    * plan time (an aggregate like a vocabulary or a dimension delta):
    * Catalyst's static size estimate for an aggregate is the CHILD's
    * size, so the built-in autoBroadcastJoinThreshold almost never fires
    * on them, and an unconditional `broadcast()` hint OOMs the driver the
    * day the side grows past memory. Counting costs one job over the
    * already-materialized result — rows of a key-sized aggregate, never
    * the input data. */
  def broadcastIfSmall(df: DataFrame, maxRows: Long = 4000000L): DataFrame = {
    val mat = df.localCheckpoint()
    if (mat.count() <= maxRows) broadcast(mat) else mat
  }
}
