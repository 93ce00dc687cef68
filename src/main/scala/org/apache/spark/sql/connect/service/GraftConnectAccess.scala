package org.apache.spark.sql.connect.service

import java.util.concurrent.TimeUnit

import org.apache.spark.SparkContext

/** Access shim: `SparkConnectService`'s lifecycle members
  * (`start`/`stop`/`started`/`localPort`) and `SparkContext.conf` are
  * `private[spark]`, so the library's [[graft.service.ConnectServer]]
  * reaches them through this object compiled into the service's own
  * package — the same pattern Spark extensions use for
  * `private[spark]` surfaces. No behavior here, only visibility. */
object GraftConnectAccess {

  /** Set the gRPC bind port on the LIVE SparkConf (0 = ephemeral) —
    * `sc.getConf` hands back a clone, which the service would never
    * see, so this must go through the private live conf. */
  def setBindPort(sc: SparkContext, port: Int): Unit =
    sc.conf.set("spark.connect.grpc.binding.port", port.toString)

  def startIfStopped(sc: SparkContext): Unit =
    if (!SparkConnectService.started) SparkConnectService.start(sc)

  def boundPort: Int = SparkConnectService.localPort

  def stop(timeoutSec: Long): Unit =
    if (SparkConnectService.started && !SparkConnectService.stopped)
      SparkConnectService.stop(Some(timeoutSec), Some(TimeUnit.SECONDS))
}
