package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener-bus drain.
  *
  * The bench's per-query shuffle/task ledger reads task metrics off a
  * `SparkListener`, but the listener bus is asynchronous: `count()`
  * returning does not mean every `onTaskEnd` has been delivered. Spark's
  * own test utilities drain with `listenerBus.waitUntilEmpty()`, which is
  * `private[spark]` — this shim re-exports it (same pattern as
  * `org.apache.spark.sql.graft.ColumnBridge` for the hidden
  * Column↔Expression conversions).
  */
object ListenerBridge {
  /** Block until every queued listener event has been delivered (or the
    * timeout elapses; returns false on timeout).
    */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: Exception => false }
}
