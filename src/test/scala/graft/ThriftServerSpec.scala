package graft

import org.scalatest.funsuite.AnyFunSuite

/** E2 service-mode parity (reference: the Nest HTTP server shell,
  * /root/reference/src/main.ts — no routes beyond a hello): the engine as
  * a long-running SQL SERVICE. The stock Spark Thrift/JDBC endpoint
  * (HiveThriftServer2) is started against the library's SparkSession;
  * external clients connect over hive-jdbc and query BOTH raw tables and
  * library operators (exposed as global temp views) — the service surface
  * a reference user would actually migrate to. Asserts byte-equal results
  * between the JDBC path and the direct DataFrame path. */
class ThriftServerSpec extends AnyFunSuite {
  import SparkTestSession._

  test("engine serves tables AND library operators over the Thrift/JDBC endpoint") {
    val port = 10139
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    // service surface: a raw table and a library OPERATOR result
    Tables.orders(spark, sf).createOrReplaceGlobalTempView("orders_srv")
    SparkEntry.queries("q_dedup_exact")(spark, sf)
      .createOrReplaceGlobalTempView("dedup_exact_srv")
    val server =
      org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(spark.sqlContext)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server binds asynchronously; retry the connect briefly
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null) {
        try conn = java.sql.DriverManager
          .getConnection(s"jdbc:hive2://localhost:$port/default", "", "")
        catch {
          case e: java.sql.SQLException if attempts < 20 =>
            attempts += 1; Thread.sleep(500)
        }
      }
      try {
        val st = conn.createStatement()
        // 1) raw-table aggregation over JDBC == direct DataFrame run
        val rs1 = st.executeQuery(
          """SELECT o_orderstatus, count(*) AS n,
            |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_c
            |FROM global_temp.orders_srv GROUP BY o_orderstatus""".stripMargin)
        val viaJdbc = Iterator.continually(rs1)
          .takeWhile(_.next()).map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
        val direct = spark.sql(
          """SELECT o_orderstatus, count(*) AS n,
            |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_c
            |FROM global_temp.orders_srv GROUP BY o_orderstatus""".stripMargin)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        assert(viaJdbc == direct && viaJdbc.nonEmpty)

        // 2) a library operator served through the endpoint
        val rs2 = st.executeQuery(
          "SELECT source, n_docs, n_unique, n_dups FROM global_temp.dedup_exact_srv")
        val opJdbc = Iterator.continually(rs2)
          .takeWhile(_.next())
          .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
        val opDirect = SparkEntry.queries("q_dedup_exact")(spark, sf)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(opJdbc == opDirect && opJdbc.nonEmpty)
      } finally conn.close()
    } finally server.stop()
  }
}
