package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the block storage behind `Dataset.localCheckpoint`: the
  * checkpoint's persisted RDD sits inside the returned frame's
  * `LogicalRDD` leaf, and `Dataset.unpersist` cannot release it (it only
  * talks to the CacheManager, which never saw this RDD). Iterative
  * operators that checkpoint per round need a deterministic release for
  * the superseded round — waiting for the ContextCleaner means storage
  * grows with rounds between driver GCs (default periodic GC: 30 min).
  *
  * Lives under `org.apache.spark.sql` solely because `LogicalRDD` is
  * `private[sql]` — the same pattern as [[ColumnBridge]].
  */
object CheckpointBridge {
  /** Release the checkpoint blocks behind `df` if its analyzed plan is
    * a `LogicalRDD` leaf (what `localCheckpoint` returns). No-op —
    * never an error — for any other plan, so callers can hold a mix of
    * checkpointed and plain frames. Non-blocking.
    *
    * Caller contract: release ONLY frames that nothing will read again
    * — in the iterative loops that means strictly after an ACTION has
    * materialized the successor round's checkpoint (whose build read
    * this frame). The blocks being dropped are then dead by
    * construction. The drop goes through the `private[spark]`
    * `SparkContext.unpersistRDD` rather than `RDD.unpersist`: the two
    * release the same blocks (unpersistRDD is what RDD.unpersist calls
    * underneath), but `RDD.unpersist` first logs an unconditional
    * "lineage … cannot be recomputed after unpersisting" WARN for every
    * locally checkpointed RDD — a false alarm for this deliberate
    * dead-block release, firing once per CC round in every bench run
    * (BENCH_r11 tail), and exactly the noise that buries real lifetime
    * bugs. SemDedupSpec's log-capture leg pins the silence. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        l.rdd.sparkContext.unpersistRDD(l.rdd.id, blocking = false)
      case _ => ()
    }
}
