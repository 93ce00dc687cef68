package graft

import org.scalatest.funsuite.AnyFunSuite

/** E2 service-mode parity, modern endpoint: the engine served over
  * **Spark Connect** (gRPC + Arrow), the Spark-4 replacement for the
  * Thrift/JDBC surface that ThriftServerSpec covers. A REAL wire round
  * trip in one JVM: [[graft.service.ConnectServer]] starts the gRPC
  * service against the library session; a genuine Connect CLIENT
  * session (`org.apache.spark.sql.connect.SparkSession`) dials
  * `sc://localhost:<port>`, ships proto plans, and deserializes Arrow
  * result batches. Asserts byte-equal results between the wire path and
  * the direct DataFrame path for (1) SQL over a served table, (2) a
  * client-side DataFrame-API plan, and (3) a library operator result. */
class ConnectServerSpec extends AnyFunSuite {
  import SparkTestSession._

  test("engine serves tables, DataFrame plans AND library operators over Spark Connect") {
    // service surface: a raw table and a library OPERATOR result, in
    // global_temp so every Connect client session sees them
    Tables.orders(spark, sf).createOrReplaceGlobalTempView("orders_sc")
    SparkEntry.queries("q_dedup_exact")(spark, sf)
      .createOrReplaceGlobalTempView("dedup_exact_sc")

    val port = graft.service.ConnectServer.start(spark, port = 0)
    assert(port > 0)
    val remote = org.apache.spark.sql.connect.SparkSession.builder()
      .remote(s"sc://localhost:$port").create()
    try {
      // 1) SQL through the wire == direct
      val q =
        """SELECT o_orderstatus, count(*) AS n,
          |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_c
          |FROM global_temp.orders_sc GROUP BY o_orderstatus""".stripMargin
      val viaWire = remote.sql(q).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val direct = spark.sql(q).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(viaWire == direct && viaWire.nonEmpty)

      // 2) a DataFrame plan BUILT CLIENT-SIDE (proto over gRPC, executed
      // server-side, Arrow back) == the same plan built directly
      import org.apache.spark.sql.functions.{count, sum, col}
      val wireDf = remote.table("global_temp.orders_sc")
        .filter(col("o_totalprice") > 1000)
        .groupBy(col("o_orderpriority"))
        .agg(count(col("o_orderkey")).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val directDf = spark.table("global_temp.orders_sc")
        .filter(col("o_totalprice") > 1000)
        .groupBy(col("o_orderpriority"))
        .agg(count(col("o_orderkey")).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(wireDf == directDf && wireDf.nonEmpty)

      // 3) a library operator served through the endpoint
      val opWire = remote.sql(
          "SELECT source, n_docs, n_unique, n_dups FROM global_temp.dedup_exact_sc")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val opDirect = SparkEntry.queries("q_dedup_exact")(spark, sf)
        .select("source", "n_docs", "n_unique", "n_dups")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(opWire == opDirect && opWire.nonEmpty)
    } finally {
      remote.close()
      graft.service.ConnectServer.stop()
    }
  }
}
