package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Narrow bridge into Spark's private[spark] listener-bus surface
  * (same idiom as [[org.apache.spark.sql.graft.ColumnBridge]]): the
  * metrics sink needs a "all posted events are processed" barrier so
  * an op label can be scoped around the ASYNC QueryExecutionListener
  * callbacks its queries will produce.
  */
object ListenerBridge {

  /** Block until every event already posted to the shared listener bus
    * has been delivered (the SQL ExecutionListenerBus rides that bus).
    */
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
