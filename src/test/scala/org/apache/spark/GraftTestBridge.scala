package org.apache.spark

/** Test-only bridge into `private[spark]` surface: deterministic
  * listener-bus drain for specs that assert on listener-collected
  * metrics (MlSpec's driver-result-bytes guard). Replaces the
  * sleep-poll that could read a partially drained counter on a
  * loaded box. */
object GraftTestBridge {
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
