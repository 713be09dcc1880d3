package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; the broadcast-guard
  * probe counts jobs through a `SparkListener` and needs an EXACT
  * listener-bus drain between the build and the read — a fixed sleep is
  * both slow (two seconds of suite time) and, under a loaded box, an
  * under-drain risk (r16 verdict nit). Same minimal escape-hatch
  * pattern as [[org.apache.spark.sql.graftbridge.ColumnBridge]]: a
  * bridge object inside the org.apache.spark package, test-classpath
  * only.
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
