// Lives in org.apache.spark.sql.graft to reach the private[sql] LogicalRDD
// node (same access route as the native expressions in this package).
package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the storage behind `Dataset.localCheckpoint`.
  *
  * `localCheckpoint(true)` persists the query's RDD at the RDD level and
  * wraps it in a LogicalRDD — the Dataset-level `unpersist()` only consults
  * the CacheManager, so the checkpoint blocks survive it (and survive
  * `catalog.clearCache()` too): every checkpointed training pass or
  * connected-components round would otherwise park its blocks until the
  * ContextCleaner happens to GC the RDD reference. Iterative operators call
  * [[release]] on a superseded checkpoint frame to free the blocks
  * deterministically.
  */
object Checkpoints {

  /** Unpersist the RDDs backing every LogicalRDD in `df`'s plan. Safe on
    * non-checkpointed frames (no LogicalRDD → no-op); non-blocking. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
