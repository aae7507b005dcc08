package org.apache.spark

/** Bridge to SparkContext.listenerBus (private[spark]): Bench attributes
  * executor CPU time to individual queries by snapshotting a listener
  * counter around each timed run, which is only exact if the async
  * listener bus has drained between snapshots.
  */
object GraftSparkBridge {
  def waitListenerBus(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
