package org.apache.spark

/** Bridge to `private[spark]` listener-bus draining — needed so metric
  * collection can wait for late task-end events deterministically. */
object GraftSparkBridge {
  def drainListeners(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
