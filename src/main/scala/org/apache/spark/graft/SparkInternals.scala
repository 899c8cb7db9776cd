package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Core-internals shim (same pattern as
  * org.apache.spark.sql.graft.Bridge): `listenerBus` is private[spark],
  * and benchmark metric attribution needs a deterministic flush point
  * between queries — polling or sleeping would race the event queue.
  */
object SparkInternals {
  /** Blocks until every queued listener event has been delivered. */
  def drainListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
