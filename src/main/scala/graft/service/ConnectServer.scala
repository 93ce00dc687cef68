package graft.service

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connect.service.GraftConnectAccess

/** Service mode, modern endpoint: the engine as a long-running **Spark
  * Connect** gRPC server (the Spark-4 successor to the Thrift/JDBC
  * endpoint the library also exposes — see ThriftServerSpec for that
  * surface). Reference analog: the NestJS HTTP server shell
  * (/root/reference/src/main.ts — a routeless `app.listen`); the
  * capability a reference user migrates to is "my engine stays up and
  * remote clients send it work", which for Spark-native code means the
  * Connect protocol: clients build DataFrame plans locally (any
  * language with a Connect client), ship them as proto over gRPC, and
  * stream Arrow batches back.
  *
  * Scale note: the endpoint is a thin control-plane — query EXECUTION
  * stays on the cluster with all of the library's plan properties
  * (pushdown, broadcast, AQE); the gRPC layer only streams result
  * batches, so serving 1000-executor jobs through it adds no
  * data-plane hop. Library operators are served by registering their
  * result (or a view over them) in `global_temp`, which is shared
  * across all Connect client sessions.
  */
object ConnectServer {

  /** Start the Connect gRPC service bound to `port` (0 = pick a free
    * ephemeral port) against `spark`'s context and return the actual
    * bound port. Idempotent per JVM: Spark hosts ONE Connect service
    * per context (`SparkConnectService.started`). */
  def start(spark: SparkSession, port: Int = 15002): Int = {
    GraftConnectAccess.setBindPort(spark.sparkContext, port)
    GraftConnectAccess.startIfStopped(spark.sparkContext)
    GraftConnectAccess.boundPort
  }

  /** Stop the service, waiting up to `timeoutSec` for in-flight RPCs. */
  def stop(timeoutSec: Long = 10L): Unit = GraftConnectAccess.stop(timeoutSec)
}
