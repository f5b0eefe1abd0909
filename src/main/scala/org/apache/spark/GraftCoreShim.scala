package org.apache.spark

/** Core-side bridge (the sql-side one is o.a.s.sql.GraftShim): Bench
  * attributes shuffle bytes to individual queries via a SparkListener,
  * and task-end events post asynchronously — without draining the bus
  * between queries, bytes from query N would be credited to query N+1.
  * `listenerBus` is private[spark], hence this shim.
  */
object GraftCoreShim {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
