package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("4").appName("graft-test")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every query has an oracle and every oracle has a query (no silent rows-only entries)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without a query: ${o -- q}")
    // the gate's strongest claim: ZERO rows-only entries — every single
    // registered query is DuckDB-hash-gated. A new query without an
    // oracle (or a typo'd key) fails here before it weakens the gate.
    assert(q == o, s"queries without an oracle: ${q -- o}")
    assert(q.size >= 180)
  }

  test("every registered query runs and q1 returns expected groups") {
    val q1 = SparkEntry.queries("q1_agg")(spark, sf)
    val rows = q1.collect()
    assert(rows.nonEmpty && rows.length <= 6) // |returnflag| x |linestatus|
    assert(q1.columns.contains("sum_qty_c") && q1.columns.contains("count_order"))
  }

  test("q6 revenue positive and pushdown-filtered") {
    val r = SparkEntry.queries("q6_filter_sum")(spark, sf).collect()(0)
    assert(r.getAs[Long]("revenue_c4") > 0)
  }

  test("semi + anti join partition the customer set per segment") {
    import org.apache.spark.sql.functions._
    val semi = SparkEntry.queries("q_semi_join")(spark, sf)
      .agg(sum("n_customers")).collect()(0).getLong(0)
    val anti = SparkEntry.queries("q_anti_join")(spark, sf)
      .agg(sum("n_customers")).collect()(0).getLong(0)
    val total = Tables.customer(spark, sf).count()
    assert(semi + anti == total)
  }

  test("window rn per customer is at most 3 and running sums are monotone") {
    import org.apache.spark.sql.functions._
    val w = SparkEntry.queries("q_window")(spark, sf)
    assert(w.agg(max("rn")).collect()(0).getLong(0) <= 3)
    assert(w.filter(col("running_spend_c") <= 0).count() == 0)
  }

  test("rollup row count = detail + subtotals + grand total") {
    val detail = Tables.orders(spark, sf)
      .select("o_orderstatus", "o_orderpriority").distinct().count()
    val statuses = Tables.orders(spark, sf).select("o_orderstatus").distinct().count()
    val rollup = SparkEntry.queries("q_rollup")(spark, sf).count()
    assert(rollup == detail + statuses + 1)
  }

  test("all queries have matching oracle entries and column aliasing") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
