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
}
