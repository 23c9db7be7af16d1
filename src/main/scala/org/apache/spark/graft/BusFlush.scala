// Lives under org.apache.spark so it can call the private[spark]
// LiveListenerBus.waitUntilEmpty() (public Apache Spark source; Spark's
// own test utilities drain the bus the same way). Needed because task
// metrics arrive on the async listener bus — a per-query snapshot taken
// right after an action returns would race in-flight TaskEnd events and
// attribute them to the wrong query.
package org.apache.spark.graft

import org.apache.spark.SparkContext

object BusFlush {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
