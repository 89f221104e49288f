package org.apache.spark

/** Test-only bridge into `private[spark]` listener-bus internals: specs that
  * count jobs/actions via a SparkListener must drain the ASYNC listener bus
  * before asserting, and the supported way — `sc.listenerBus.waitUntilEmpty`
  * (what Spark's own test suites use) — is package-private. Deterministic,
  * unlike polling the event count against a wall-clock deadline.
  */
object GraftTestBridge {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMillis: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
