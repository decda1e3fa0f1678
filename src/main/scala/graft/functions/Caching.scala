package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Release discipline for operators that persist shared intermediates.
  *
  * Several operators cache a frame that feeds two or more downstream
  * branches of ONE query (a fingerprint table probed twice, a tf table
  * feeding both model training and scoring). The result is returned
  * lazily, so the operator cannot unpersist before returning — the cache
  * must survive until the CALLER's terminal action. Without cleanup those
  * blocks outlive the query: a long-lived session running many operators
  * would accumulate every query's intermediates until the executors'
  * storage pool evicts them (harnesses mask this with
  * `catalog.clearCache()` between queries, but a library must not rely on
  * its caller's hygiene).
  *
  * [[releaseAfterAction]] closes the gap: it registers a one-shot
  * QueryExecutionListener that unpersists the intermediates as soon as the
  * NEXT action on the session completes (success or failure) and then
  * unregisters itself. In the intended pattern — build the query, run its
  * terminal action — that next action IS the query's own, so the blocks
  * are freed exactly when the advisor's "unpersist after the terminal
  * action" asks. If a caller interleaves an unrelated action first, the
  * intermediates are released early and the query transparently recomputes
  * them — a deterministic-correctness no-op, never a wrong answer (the
  * same contract `unpersist()` itself gives). The callback runs on the
  * listener bus thread; `unpersist(blocking = false)` and listener
  * self-removal are both thread-safe.
  */
object Caching {

  /** Return `result` with `cached` scheduled for release after the next
    * completed action on its session. */
  def releaseAfterAction(result: DataFrame, cached: DataFrame*): DataFrame = {
    val manager = result.sparkSession.listenerManager
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def release(): Unit = if (done.compareAndSet(false, true)) {
        cached.foreach { df =>
          try df.unpersist(false) catch { case _: Throwable => () }
          // localCheckpoint'd frames persist at the RDD level, which
          // Dataset.unpersist cannot see — free those blocks too.
          try org.apache.spark.sql.graft.Checkpoints.release(df)
          catch { case _: Throwable => () }
        }
        manager.unregister(this)
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = release()
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = release()
    }
    manager.register(listener)
    result
  }
}
