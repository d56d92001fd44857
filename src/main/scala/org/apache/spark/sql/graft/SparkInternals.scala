package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Narrow bridge to `private[spark]` surfaces (this package lives under
  * org.apache.spark for exactly this reason — same pattern as the
  * Catalyst expressions in this directory).
  */
object SparkInternals {

  /** Block until the async listener bus has delivered all queued events
    * (or the timeout elapses). Bench uses this so per-query stage-metric
    * deltas are attributed to the query that produced them — a fixed
    * sleep can under-wait on a backlogged bus.
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Free the block-manager blocks behind a `localCheckpoint`ed frame.
    * `Dataset.localCheckpoint` wraps the materialized RDD in a
    * `LogicalRDD`; those blocks are otherwise released only when the
    * ContextCleaner GCs the RDD reference — which a long-lived memo
    * (Graph.projectionTables) defeats by design. Replaced memo entries
    * call this so a dir-fingerprint refresh doesn't strand the old
    * corpus's blocks.
    */
  def releaseCheckpointBlocks(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        try l.rdd.unpersist(blocking = false)
        catch { case _: Throwable => () } // context already stopped
      case _ => ()
    }

  /** True when the session's CacheManager holds no persisted frames —
    * the post-query hygiene assertion operators with internal persists
    * are specced against (VERDICT r14 #3).
    */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
