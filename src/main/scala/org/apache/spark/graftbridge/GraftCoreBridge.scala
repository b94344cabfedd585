package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Core-side bridge (the SQL twin lives in
  * org.apache.spark.sql.graftbridge): `listenerBus` is private[spark],
  * and [[graft.WorkProfile]] must drain it between queries so a
  * snapshot's task metrics belong to the query that ran, not to the
  * previous one's stragglers.
  */
object GraftCoreBridge {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
