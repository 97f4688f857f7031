package graft.flow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Cyclic-flow parity — DataflowEx A20 `RingMonitor` / A27 crawler loop
  * (SURVEY.md §2.1). The reference supports cyclic pipeline graphs (a
  * crawler feeding discovered links back to its own input) with
  * heartbeat-based completion detection.
  *
  * Spark plans are acyclic, so the Spark-native form is driver-side
  * iteration over DataFrames (the Pregel pattern): evolve a frontier until
  * empty, accumulating results. Completion detection is the loop condition
  * — no heartbeat machinery needed because each iteration is a materialized
  * action.
  *
  * Scale notes: each iteration materializes (persist + count) the next
  * frontier — that action is what bounds lineage growth; without
  * checkpointing, 50 iterations of lazy union would build a 50-deep plan.
  * `maxIterations` is the safety rail the reference gets from ring
  * monitoring.
  */
object Iterate {

  /** Fixpoint loop: start from `seed`, apply `step(frontier)` to discover
    * the next frontier, stop when empty (or maxIterations). Returns the
    * union of all frontiers (the "visited set").
    *
    * `step` must return a frame schema-compatible with `seed`; rows already
    * visited are subtracted automatically (the crawler's "seen URL" check).
    */
  def fixpoint(
      seed: DataFrame,
      maxIterations: Int = 50,
      checkpointEvery: Int = 10)(
      step: DataFrame => DataFrame): DataFrame = {

    var visited = seed.persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = visited
    var i = 0
    while (i < maxIterations && !frontier.isEmpty) {
      val discovered = step(frontier)
      // null-SAFE subtraction: a plain using-columns anti join never
      // matches NULL = NULL, so a discovered row containing a NULL would
      // re-enter the frontier forever and the loop could not terminate.
      // Frame-qualified refs (not string paths) keep dotted column names
      // working.
      val sameRow = discovered.columns
        .map(c => discovered.col(s"`$c`") <=> visited.col(s"`$c`"))
        .reduce(_ && _)
      val next = discovered.join(visited, sameRow, "left_anti")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val grown = visited.union(next).persist(StorageLevel.MEMORY_AND_DISK)
      // Bound lineage: periodically collapse the accumulated plan.
      val materialized =
        if ((i + 1) % checkpointEvery == 0) grown.localCheckpoint(eager = true) else grown
      materialized.count() // materialize before unpersisting parents
      frontier.unpersist()
      visited.unpersist()
      if (materialized ne grown) grown.unpersist() // checkpoint copied it
      visited = materialized
      frontier = next
      i += 1
    }
    visited
  }
}
