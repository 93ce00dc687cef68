package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** General relational operator surface (SURVEY §2.3–§2.6).
  *
  * The reference delegates all of this to hand-written loops
  * (/root/reference/src/scripts/run-etl.ts:26–54) or simply lacks it;
  * here it is the stock Catalyst surface: hash/sort aggregates, broadcast
  * + sort-merge joins, windows, set ops, rollup/cube. Every query reads
  * through `Tables` (plain parquet scans) so filter pushdown and column
  * pruning reach the scan.
  *
  * Oracle-exactness convention (round-2 hardening): the driver gate hashes
  * EXACT RENDERED values, and Spark DECIMAL (pandas Decimal, trailing
  * zeros) vs DuckDB DECIMAL (fetchdf float64) render differently even when
  * equal — so NO gated output column is ever DECIMAL or raw DOUBLE. Money
  * and ratios are emitted as scaled BIGINT fixed-point: `_c` = x100 cents,
  * `_c4`/`_c6` = x10^4/x10^6, `_u` = x10^6 micro-units, `_ppb` = x10^9.
  * Per-row 2-decimal doubles convert exactly via round(x*100) (the double
  * is within 1 ulp of the true cent value, never near .5); sums/ratios then
  * stay in exact integer arithmetic (DIV == DuckDB's //) on both engines.
  */
object Relational {

  /** Exact cents of a 2-decimal double column (BIGINT on both engines). */
  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  /** TPC-H Q1 flavor: scan → filter → hash aggregate (map-side partials).
    * All money in integer cents; averages via integer division. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pC = cents($"l_extendedprice")
    val dC = cents($"l_discount")
    val tC = cents($"l_tax")
    val qC = cents($"l_quantity")
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(qC).as("sum_qty_c"),
        sum(pC).as("sum_base_price_c"),
        sum(pC * (lit(100L) - dC)).as("sum_disc_price_c4"),
        sum(pC * (lit(100L) - dC) * (lit(100L) + tC)).as("sum_charge_c6"),
        sum(dC).as("sum_disc_c"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty_c", expr("sum_qty_c DIV count_order"))
      .withColumn("avg_price_c", expr("sum_base_price_c DIV count_order"))
      .withColumn("avg_disc_c4", expr("(sum_disc_c * 100) DIV count_order"))
      .drop("sum_disc_c")
  }

  val q1AggSql: String =
    """WITH c AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS qc,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
      |    CAST(round(l_discount * 100) AS BIGINT) AS dc,
      |    CAST(round(l_tax * 100) AS BIGINT) AS tc
      |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
      |SELECT l_returnflag, l_linestatus,
      |  CAST(sum(qc) AS BIGINT) AS sum_qty_c,
      |  CAST(sum(pc) AS BIGINT) AS sum_base_price_c,
      |  CAST(sum(pc * (100 - dc)) AS BIGINT) AS sum_disc_price_c4,
      |  CAST(sum(pc * (100 - dc) * (100 + tc)) AS BIGINT) AS sum_charge_c6,
      |  count(*) AS count_order,
      |  CAST(sum(qc) AS BIGINT) // count(*) AS avg_qty_c,
      |  CAST(sum(pc) AS BIGINT) // count(*) AS avg_price_c,
      |  (CAST(sum(dc) AS BIGINT) * 100) // count(*) AS avg_disc_c4
      |FROM c GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6 flavor: tight filter + global sum — exercises parquet
    * predicate pushdown (all three predicates reach the scan). */
  def q6FilterSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
              $"l_quantity" < 24)
      .agg(sum(cents($"l_extendedprice") * cents($"l_discount")).as("revenue_c4"),
           count(lit(1)).as("n_rows"))
  }

  val q6FilterSumSql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c4,
      |       count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q3 flavor: fact-fact sort-merge join (lineitem ⋈ orders) with a
    * customer-segment filter. No broadcast hint on customer: the segment
    * slice is ~1/5 of all customers and grows with the corpus — a pinned
    * broadcast is a driver OOM at 100×. AQE broadcasts it adaptively when
    * runtime stats say it is actually small. Top-10 revenue. */
  def q3Join(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val ord  = Tables.orders(s, dir)
      .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li   = Tables.lineitem(s, dir)
      .filter($"l_shipdate" > lit("1998-01-01").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
        .as("revenue_c4"))
      .orderBy($"revenue_c4".desc, $"l_orderkey".asc)
      .limit(10)
  }

  val q3JoinSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c4
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue_c4 DESC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** Multi-dim star join: region→nation→customer→orders. Only the
    * genuinely bounded dims (nation: 25 rows, region: 5 rows — fixed by
    * the data model at any SF) carry broadcast hints; customer grows with
    * the corpus, so its join to orders is left to AQE. */
  def q5StarJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dims = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
    Tables.orders(s, dir)
      .join(dims, $"o_custkey" === $"c_custkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum(cents($"o_totalprice")).as("total_price_c"),
           count(lit(1)).as("n_orders"))
  }

  val q5StarJoinSql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_price_c,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  /** Left semi join (EXISTS): customers having at least one urgent order. */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urgent = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
    Tables.customer(s, dir)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
           sum(cents($"c_acctbal")).as("total_bal_c"))
  }

  val qSemiJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_bal_c
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin

  /** Left anti join (NOT EXISTS): customers with no urgent orders. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urgent = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
    Tables.customer(s, dir)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
  }

  val qAntiJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin

  /** Window functions: rank + running sum per customer's order history. */
  def qWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w  = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_spend_c", sum(cents($"o_totalprice")).over(ws))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rn", $"running_spend_c")
  }

  val qWindowSql: String =
    """SELECT o_custkey, o_orderkey, rn, running_spend_c FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(row_number() OVER w AS BIGINT) AS rn,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS running_spend_c
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |) WHERE rn <= 3""".stripMargin

  /** Top-k: highest-value orders (TakeOrderedAndProject, no full sort). */
  def qTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", cents($"o_totalprice").as("o_totalprice_c"))
      .orderBy($"o_totalprice_c".desc, $"o_orderkey".asc)
      .limit(25)
  }

  val qTopKSql: String =
    """SELECT o_orderkey, o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_c
      |FROM orders ORDER BY o_totalprice_c DESC, o_orderkey ASC LIMIT 25""".stripMargin

  /** Distinct + count-distinct aggregations (SURVEY A3). */
  def qDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n_orders"),
           countDistinct($"l_partkey").as("n_parts"),
           count(lit(1)).as("n_rows"))
  }

  val qDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** ROLLUP hierarchy totals (status → priority → grand total). */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(cents($"o_totalprice")).as("total_c"))
  }

  val qRollupSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** CUBE over two dims. */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), sum(cents($"l_quantity")).as("qty_c"))
  }

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** Set ops: customers in segment A minus those with open orders, plus
    * intersection — EXCEPT/INTERSECT on key projections. */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val building = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val openCust = Tables.orders(s, dir)
      .filter($"o_orderstatus" === "O").select($"o_custkey".as("c_custkey"))
    val except    = building.except(openCust)
      .withColumn("op", lit("except"))
    val intersect = building.intersect(openCust)
      .withColumn("op", lit("intersect"))
    except.unionByName(intersect)
      .groupBy($"op").agg(count(lit(1)).as("n"), sum($"c_custkey").as("key_sum"))
  }

  val qSetOpsSql: String =
    """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     open_cust AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'),
      |     both_ops AS (
      |       SELECT c_custkey, 'except' AS op FROM (SELECT * FROM building EXCEPT SELECT * FROM open_cust)
      |       UNION ALL
      |       SELECT c_custkey, 'intersect' AS op FROM (SELECT * FROM building INTERSECT SELECT * FROM open_cust))
      |SELECT op, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS key_sum FROM both_ops GROUP BY op""".stripMargin

  /** Full outer join — the reconciliation shape (orders placed vs items
    * shipped per epoch day): the ship calendar trails the order calendar
    * on both ends, so BOTH null-fill sides are genuinely exercised.
    * USING-style key join coalesces the day key; counts null-fill to 0
    * and presence flags stay BIGINT. Sort-merge full outer on the
    * (already aggregated) daily relations — the join input is
    * O(distinct days), not O(rows). */
  def qFullJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
      .groupBy(expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val l = Tables.lineitem(s, dir)
      .groupBy(expr("CAST(CAST(l_shipdate AS TIMESTAMP) AS LONG) DIV 86400").as("day"))
      .agg(count(lit(1)).as("n_ships"))
    o.join(l, Seq("day"), "full_outer")
      .select($"day",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"n_ships", lit(0L)).as("n_ships"),
        $"n_orders".isNotNull.cast("long").as("had_orders"),
        $"n_ships".isNotNull.cast("long").as("had_ships"))
  }

  val qFullJoinSql: String =
    """WITH o AS (
      |  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS day, count(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |l AS (
      |  SELECT epoch_us(l_shipdate) // 1000000 // 86400 AS day, count(*) AS n_ships
      |  FROM lineitem GROUP BY 1)
      |SELECT day,
      |  CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
      |  CAST(coalesce(n_ships, 0) AS BIGINT) AS n_ships,
      |  CAST(CASE WHEN n_orders IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS had_orders,
      |  CAST(CASE WHEN n_ships IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS had_ships
      |FROM o FULL JOIN l USING (day)""".stripMargin

  /** Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL over two
    * relations that genuinely carry duplicates (a customer places many
    * open and many urgent orders): INTERSECT ALL keeps min(multiplicity),
    * EXCEPT ALL subtracts multiplicities. Catalyst plans both as
    * count-bearing aggregates + a generate (no row-by-row anti join), so
    * the shuffle carries one row per distinct key. */
  def qSetOpsAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir)
    val open   = ord.filter($"o_orderstatus" === "O").select($"o_custkey")
    val urgent = ord.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val exceptAll    = open.exceptAll(urgent).withColumn("op", lit("except_all"))
    val intersectAll = open.intersectAll(urgent).withColumn("op", lit("intersect_all"))
    exceptAll.unionByName(intersectAll)
      .groupBy($"op").agg(count(lit(1)).as("n"), sum($"o_custkey").as("key_sum"))
  }

  val qSetOpsAllSql: String =
    """WITH open_o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |     urgent_o AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |     both_ops AS (
      |       SELECT o_custkey, 'except_all' AS op
      |       FROM (SELECT * FROM open_o EXCEPT ALL SELECT * FROM urgent_o)
      |       UNION ALL
      |       SELECT o_custkey, 'intersect_all' AS op
      |       FROM (SELECT * FROM open_o INTERSECT ALL SELECT * FROM urgent_o))
      |SELECT op, count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS key_sum
      |FROM both_ops GROUP BY op""".stripMargin

  /** Conditional aggregation (sum(CASE WHEN ...)) — pivot-style counts. */
  def qCaseAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(
        sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when($"o_orderstatus" === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when($"o_orderstatus" === "P", 1L).otherwise(0L)).as("n_p"),
        sum(when($"o_totalprice" > 200000.0, cents($"o_totalprice"))).as("big_total_c"))
  }

  val qCaseAggSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
      |  CAST(sum(CASE WHEN o_totalprice > 200000.0
      |           THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS big_total_c
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Date bucketing: monthly order volume (SURVEY §2.6 date functions). */
  def qDateAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").cast("long").as("yr"),
               month($"o_orderdate").cast("long").as("mo"))
      .agg(count(lit(1)).as("n_orders"),
           sum(cents($"o_totalprice")).as("total_c"))
  }

  val qDateAggSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |       CAST(month(o_orderdate) AS BIGINT) AS mo,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** Exact percentiles via sort-based percentile (deterministic, matches
    * DuckDB quantile_cont) + min/max — over integer cents so the linear
    * interpolation happens on exact integers on both engines. */
  def qPercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .withColumn("pc", cents($"l_extendedprice"))
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(pc, 0.5)")).cast("long").as("median_price_c"),
        round(expr("percentile(pc, 0.95)")).cast("long").as("p95_price_c"),
        min($"pc").as("min_price_c"),
        max($"pc").as("max_price_c"))
  }

  val qPercentileSql: String =
    """WITH c AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
      |           FROM lineitem)
      |SELECT l_returnflag,
      |  CAST(round(quantile_cont(pc, 0.5)) AS BIGINT) AS median_price_c,
      |  CAST(round(quantile_cont(pc, 0.95)) AS BIGINT) AS p95_price_c,
      |  min(pc) AS min_price_c,
      |  max(pc) AS max_price_c
      |FROM c GROUP BY l_returnflag""".stripMargin

  /** Scalar string/regex function surface over part (SURVEY §2.6). */
  def qStringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .select(
        $"p_partkey",
        lower($"p_name").as("lname"),
        upper($"p_brand").as("ubrand"),
        length($"p_name").cast("long").as("name_len"),
        regexp_extract($"p_brand", "Brand#(\\d+)", 1).as("brand_num"),
        regexp_replace($"p_type", "\\s+", "_").as("type_slug"),
        substring($"p_type", 1, 5).as("type_pfx"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        lpad($"p_size".cast("string"), 4, "0").as("size_pad"),
        trim(lit("  x  ")).as("trimmed"))
      .filter($"p_name".startsWith("a") || $"p_name".endsWith("e"))
  }

  val qStringFuncsSql: String =
    """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
      |  regexp_replace(p_type, '\s+', '_', 'g') AS type_slug,
      |  substring(p_type, 1, 5) AS type_pfx,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      |  trim('  x  ') AS trimmed
      |FROM part
      |WHERE p_name LIKE 'a%' OR p_name LIKE '%e'""".stripMargin

  /** IN-subquery (converted to semi join by Catalyst) + NOT IN guard. */
  def qInSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigParts = Tables.part(s, dir).filter($"p_size" >= 40).select($"p_partkey")
    Tables.lineitem(s, dir)
      .join(bigParts, $"l_partkey" === $"p_partkey", "left_semi")
      .agg(count(lit(1)).as("n"), sum(cents($"l_quantity")).as("qty_c"))
  }

  val qInSubquerySql: String =
    """SELECT count(*) AS n,
      |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
      |FROM lineitem
      |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)""".stripMargin

  /** Scalar subquery: orders above the global average price. */
  def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir)
    // Broadcast the single-row aggregate instead of collecting to driver.
    val avgPrice = ord.agg(avg($"o_totalprice").as("avg_price"))
    ord.join(broadcast(avgPrice))
      .filter($"o_totalprice" > $"avg_price")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_above_avg"))
  }

  val qScalarSubquerySql: String =
    """SELECT o_orderstatus, count(*) AS n_above_avg
      |FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |GROUP BY o_orderstatus""".stripMargin

  /** Correlated EXISTS / NOT EXISTS as *projection* predicates (inside
    * CASE, not WHERE) — the subquery surface beyond the semi/anti joins:
    * Catalyst decorrelates both into left-semi/left-anti joins under the
    * aggregate, so each EXISTS costs one key-partitioned join, never a
    * per-row re-scan. Textually identical SQL runs on both engines. */
  def qExists(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql("""
      SELECT c_mktsegment, count(*) AS n_customers,
        CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT') THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive
      FROM customer c GROUP BY c_mktsegment""")
  }

  val qExistsSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
      |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderpriority = '1-URGENT') THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
      |  CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive
      |FROM customer c GROUP BY c_mktsegment""".stripMargin

  /** Correlated LATERAL derived table, "top-2 orders for each (filtered)
    * customer". The lateral body ranks with a row_number PARTITIONed on
    * the correlation key and keeps rk <= 2 — semantically identical to
    * the correlated `ORDER BY … LIMIT 2` the oracle runs (within one
    * customer's rows the partition is the whole subquery), but the
    * decorrelation is night-and-day: the ORDER-BY-LIMIT shape makes
    * Catalyst 4.1 interpose a GLOBAL sort of `orders` between two
    * windows (verified round 7: Sort[global=true], the one scale-killer
    * plan in the registry), while this rank-filter shape plans
    * filtered-customers –broadcast→ per-key Window(partitionBy
    * o_custkey) + Filter(rk<=2) — partition-local sorts only, the same
    * rows, and the inner relation is pruned by the broadcast join
    * (verified round 8: zero global SortExec, off the PlanHygieneSpec
    * whitelist). The oracle keeps the ORDER-BY-LIMIT LATERAL text, so
    * the gate also proves the two shapes row-identical cross-engine. */
  def qLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql("""
      SELECT c.c_custkey, t.o_orderkey, t.price_c, t.rk
      FROM customer c,
      LATERAL (SELECT * FROM (
                 SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
                 FROM orders o WHERE o.o_custkey = c.c_custkey) WHERE rk <= 2) t
      WHERE c.c_acctbal > 9000""")
  }

  val qLateralSql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.price_c, t.rk
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
      |           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |         FROM orders o WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c.c_acctbal > 9000""".stripMargin

  /** Explode/lateral: token frequency top-20 over documents (array ops +
    * generate + top-k — the §2.2 table-valued surface as a query). */
  def qExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"tok")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok".asc)
      .limit(20)
  }

  val qExplodeSql: String =
    """WITH toks AS (
      |  SELECT list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t
      |  FROM documents)
      |SELECT tok, count(*) AS n FROM toks, unnest(t) u(tok)
      |GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20""".stripMargin

  /** Unpivot/melt: wide per-flag aggregates to long (measure, value) rows. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(sum(cents($"l_quantity")).as("qty"),
           sum(cents($"l_extendedprice")).as("price"),
           sum(cents($"l_discount")).as("disc"))
      .unpivot(Array($"l_returnflag"), Array($"qty", $"price", $"disc"),
        "measure", "value_c")
  }

  val qUnpivotSql: String =
    """WITH w AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price,
      |    CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, 'qty' AS measure, qty AS value_c FROM w
      |UNION ALL SELECT l_returnflag, 'price', price FROM w
      |UNION ALL SELECT l_returnflag, 'disc', disc FROM w""".stripMargin

  /** Pivot: status counts spread to columns per priority (groupBy.pivot
    * with explicit values — plan-stable, no extra distinct pass). */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
  }

  val qPivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Range join: purchases joined to the 1-hour activity window opened by
    * each signup of the same user — implemented the scalable way: equi-join
    * on a coarse time bucket (plus neighbor bucket) then exact filter,
    * instead of a raw inequality join. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts".as("s_ts"), $"event_id".as("signup_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("purchase_id"))
    // bucket = epoch hour; a [s, s+1h) window spans at most 2 buckets
    val sb = signups.withColumn("bucket",
      explode(array(($"s_ts".cast("long") / 3600L).cast("long"),
        ($"s_ts".cast("long") / 3600L).cast("long") + 1)))
    val pb = purchases.withColumn("bucket", ($"p_ts".cast("long") / 3600L).cast("long"))
    pb.join(sb, Seq("user_id", "bucket"))
      .filter($"p_ts" >= $"s_ts" && $"p_ts" < $"s_ts" + expr("INTERVAL 1 HOUR"))
      .select($"user_id", $"signup_id", $"purchase_id",
        ($"p_ts".cast("long") - $"s_ts".cast("long")).as("delay_s"))
  }

  val qRangeJoinSql: String =
    """SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id,
      |  epoch_us(p.ts) // 1000000 - epoch_us(s.ts) // 1000000 AS delay_s
      |FROM (SELECT * FROM events WHERE event_type = 'signup') s
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      | AND p.ts < s.ts + INTERVAL 1 HOUR""".stripMargin

  /** SALTED skew join, GATED — the §2.4 skew-mitigation path as a live
    * query instead of a spec-only operator: each event enriches with its
    * user's total activity through [[graft.operators.Skew.saltedJoin]]
    * (probe side scatters each row to one of 8 salt values by a
    * deterministic hash, build side replicates 8x, join on
    * (user_id, _salt)) — a hot user's rows spread across 8 tasks instead
    * of funneling one. Salting is exact by construction, so the oracle
    * is the PLAIN join in SQL; the rollup keeps the gate output at
    * |event types| rows while the salted join itself carries the full
    * event volume through the plan. */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val perUser = ev.groupBy($"user_id").agg(count(lit(1)).as("user_n"))
    val enriched = graft.operators.Skew.saltedJoin(
      ev.select($"event_id", $"user_id", $"event_type"), perUser,
      "user_id", 8, probeSaltBy = Seq("event_id"))
    enriched.groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"user_n" >= 100L, 1L).otherwise(0L)).as("n_heavy_user_events"),
        max($"user_n").as("max_user_n"))
  }

  val qSaltedJoinSql: String =
    """WITH c AS (SELECT user_id, count(*) AS user_n FROM events GROUP BY 1)
      |SELECT e.event_type, count(*) AS n_events,
      |  CAST(sum(CASE WHEN c.user_n >= 100 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_heavy_user_events,
      |  max(c.user_n) AS max_user_n
      |FROM events e JOIN c ON e.user_id = c.user_id
      |GROUP BY e.event_type""".stripMargin

  /** Window-function breadth: lead/lag/ntile/first/last/rank over the
    * per-customer order timeline. */
  def qWindowFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey",
        // -1 encodes "no prior/next": keeps the column non-null BIGINT so
        // neither engine's read path ever renders it as float (gate rule)
        coalesce(lag($"o_orderkey", 1).over(w), lit(-1L)).as("prev_order"),
        coalesce(lead($"o_orderkey", 1).over(w), lit(-1L)).as("next_order"),
        ntile(4).over(w).cast("long").as("quartile"),
        first($"o_orderkey").over(wf).as("first_order"),
        last($"o_orderkey").over(wf).as("last_order"),
        rank().over(w).cast("long").as("rnk"))
  }

  val qWindowFnsSql: String =
    """SELECT o_custkey, o_orderkey,
      |  coalesce(lag(o_orderkey, 1) OVER w, -1) AS prev_order,
      |  coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_order,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  first_value(o_orderkey) OVER wf AS first_order,
      |  last_value(o_orderkey) OVER wf AS last_order,
      |  CAST(rank() OVER w AS BIGINT) AS rnk
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  /** Rank-ratio window functions — dense_rank plus percent_rank and
    * cume_dist computed as EXACT integers instead of the built-in
    * doubles: pr_u = (rank−1)·1e6 DIV (n−1), cd_u = peers_cum·1e6 DIV n,
    * where peers_cum is a RANGE-framed count (peer rows always included)
    * — bit-identical cross-engine with no float division anywhere. */
  def qWindowRanks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"price_c".desc, $"o_orderkey".asc)
    val wp = Window.partitionBy($"o_custkey")
    // peers share (price_c, o_orderkey) — unique, so the RANGE frame on
    // the full ordering equals rows; still exercises the frame type
    val wr = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", cents($"o_totalprice").as("price_c"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(wp))
      .withColumn("peers_cum", count(lit(1)).over(wr))
      .withColumn("pr_u",
        when($"cnt" > 1, expr("((rnk - 1) * 1000000L) DIV (cnt - 1)")).otherwise(0L))
      .withColumn("cd_u", expr("(peers_cum * 1000000L) DIV cnt"))
      .select($"o_custkey", $"o_orderkey", $"price_c", $"rnk", $"drnk", $"pr_u", $"cd_u")
  }

  val qWindowRanksSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders),
      |r AS (
      |  SELECT o_custkey, o_orderkey, price_c,
      |    CAST(rank() OVER w AS BIGINT) AS rnk,
      |    CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |    count(*) OVER (PARTITION BY o_custkey) AS cnt,
      |    count(*) OVER (w RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peers_cum
      |  FROM o
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY price_c DESC, o_orderkey ASC))
      |SELECT o_custkey, o_orderkey, price_c, rnk, drnk,
      |  CASE WHEN cnt > 1 THEN ((rnk - 1) * 1000000) // (cnt - 1) ELSE 0 END AS pr_u,
      |  (peers_cum * 1000000) // cnt AS cd_u
      |FROM r""".stripMargin

  /** Explicit GROUPING SETS (beyond rollup/cube) + grouping() marker. */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq.empty),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
           grouping($"o_orderstatus").cast("long").as("g_status"),
           grouping($"o_orderpriority").cast("long").as("g_prio"))
  }

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** Raw-SQL entry surface: the same engine through `spark.sql` over
    * registered temp views — a user can paste ANSI SQL instead of using
    * the DataFrame API (Spark and DuckDB run textually identical SQL
    * here, minus type-cast dialect). */
  def qSqlApi(s: SparkSession, dir: String): DataFrame = {
    // events goes through Tables.events (nanos-timestamp handling); the
    // rest are plain parquet
    Tables.all.foreach {
      case "events" => Tables.events(s, dir).createOrReplaceTempView("events")
      case t => Tables(s, dir, t).createOrReplaceTempView(t)
    }
    s.sql("""
      SELECT o_orderstatus, count(*) AS n,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_c,
             count(DISTINCT o_custkey) AS n_cust
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_acctbal > 0
      GROUP BY o_orderstatus""")
  }

  val qSqlApiSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
      |       count(DISTINCT o_custkey) AS n_cust
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_acctbal > 0
      |GROUP BY o_orderstatus""".stripMargin

  /** Statistical aggregates: stddev/variance/correlation/covariance —
    * both engines use numerically-stable streaming moments; the raw
    * doubles agree only to ~1 ulp (summation order), so the gated output
    * is micro-unit fixed-point (round(x*1e6) as BIGINT), which absorbs
    * the ulp while still verifying 6 decimal places of the statistic. */
  def qStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(stddev_samp($"l_extendedprice") * 1e6).cast("long").as("sd_price_u"),
        round(var_samp($"l_quantity") * 1e6).cast("long").as("var_qty_u"),
        round(corr($"l_quantity", $"l_extendedprice") * 1e6).cast("long").as("corr_qty_price_u"),
        round(covar_samp($"l_quantity", $"l_extendedprice") * 1e6).cast("long").as("covar_qty_price_u"),
        round(avg($"l_discount") * 1e6).cast("long").as("avg_disc_u"))
  }

  val qStatsSql: String =
    """SELECT l_returnflag,
      |  CAST(round(stddev_samp(l_extendedprice) * 1e6) AS BIGINT) AS sd_price_u,
      |  CAST(round(var_samp(l_quantity) * 1e6) AS BIGINT) AS var_qty_u,
      |  CAST(round(corr(l_quantity, l_extendedprice) * 1e6) AS BIGINT) AS corr_qty_price_u,
      |  CAST(round(covar_samp(l_quantity, l_extendedprice) * 1e6) AS BIGINT) AS covar_qty_price_u,
      |  CAST(round(avg(l_discount) * 1e6) AS BIGINT) AS avg_disc_u
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Table profiling — the first query any pipeline runs against an
    * unknown table: one row per numeric measure with count, null count,
    * and exact-cents min/max/sum. Single scan, one aggregate row
    * unpivoted driver-free via stack(): at 100 TB this is one pass with
    * map-side partials, never a per-column job. */
  def qProfileNumeric(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
          sum(col(c).isNull.cast("long")).as(s"nul_$c"),
          min(cents(col(c))).as(s"min_$c"),
          max(cents(col(c))).as(s"max_$c"),
          sum(cents(col(c))).as(s"sum_$c"))
    }
    val one = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c =>
      s"'$c', cnt_$c, nul_$c, min_$c, max_$c, sum_$c").mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stackExpr) AS (col_name, n, n_null, min_c, max_c, sum_c)")
  }

  val qProfileNumericSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count($c) AS n,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(min(round($c * 100)) AS BIGINT) AS min_c,
         |  CAST(max(round($c * 100)) AS BIGINT) AS max_c,
         |  CAST(sum(round($c * 100)) AS BIGINT) AS sum_c
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  /** Categorical column profiling — the companion to [[qProfileNumeric]]
    * for string columns: per column, row/null/distinct counts and the
    * most frequent value (the "mode", tie → lexicographically smallest).
    * Two key-partitioned aggregations: (column, value) counts, then a
    * per-column rollup whose mode is a hash-aggregate argmax over
    * (count, reversed-tie value) — no window, no sort, no driver state.
    * Profiling lang/source of documents + event_type of events exercises
    * multi-table stacking in one gated result. */
  def qProfileCats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val ev = Tables.events(s, dir)
    val long = docs.select(lit("documents.lang").as("col_name"), $"lang".as("val"))
      .unionByName(docs.select(lit("documents.source").as("col_name"), $"source".as("val")))
      .unionByName(ev.select(lit("events.event_type").as("col_name"), $"event_type".as("val")))
    val vc = long.groupBy($"col_name", $"val")
      .agg(count(lit(1)).as("n"), sum($"val".isNull.cast("long")).as("n_null_part"))
    vc.groupBy($"col_name")
      .agg(sum($"n").as("n_rows"),
           sum($"n_null_part").as("n_nulls"),
           sum($"val".isNotNull.cast("long")).as("n_distinct"),
           // argmax by (count, then SMALLEST value): max of (n, negated
           // lexicographic order) isn't expressible for strings, so use
           // min over (-n, val) — highest count, then smallest value
           min(when($"val".isNotNull, struct((-$"n").as("neg_n"), $"val"))).as("top"))
      .select($"col_name", $"n_rows", $"n_nulls", $"n_distinct",
        $"top.val".as("top_val"), (-$"top.neg_n").as("top_n"))
  }

  val qProfileCatsSql: String =
    """WITH long AS (
      |  SELECT 'documents.lang' AS col_name, lang AS val FROM documents
      |  UNION ALL
      |  SELECT 'documents.source', source FROM documents
      |  UNION ALL
      |  SELECT 'events.event_type', event_type FROM events),
      |vc AS (
      |  SELECT col_name, val, count(*) AS n,
      |    CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_part
      |  FROM long GROUP BY 1, 2),
      |ranked AS (
      |  SELECT col_name, val, n,
      |    row_number() OVER (PARTITION BY col_name ORDER BY n DESC, val ASC) AS rk
      |  FROM vc WHERE val IS NOT NULL)
      |SELECT v.col_name,
      |  CAST(sum(v.n) AS BIGINT) AS n_rows,
      |  CAST(sum(v.n_null_part) AS BIGINT) AS n_nulls,
      |  CAST(sum(CASE WHEN v.val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct,
      |  min(r.val) AS top_val,
      |  CAST(min(r.n) AS BIGINT) AS top_n
      |FROM vc v LEFT JOIN ranked r ON v.col_name = r.col_name AND r.rk = 1
      |GROUP BY v.col_name""".stripMargin

  /** Join-key skew diagnostics — the statistics a planner (or an engineer
    * choosing between plain, broadcast, and salted joins;
    * operators.Skew) reads BEFORE running the join at 100 TB: for each
    * candidate key of the fact table, key cardinality, the hottest key's
    * row count, and its ratio to the uniform share (×1000). One
    * hash-aggregate per key column over the same single scan; the
    * hottest key is a hash-aggregate argmax (no window, no sort). */
  def qSkewKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val perKey = Seq("l_orderkey", "l_partkey", "l_suppkey").map { k =>
      li.groupBy(col(k).as("key")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"),
             sum($"c").as("n_rows"),
             // round-16: hash-aggregable argmax — max(struct) forced the
             // whole mixed aggregate (count/sum included) onto SortAggregate
             org.apache.spark.sql.graft.ArgExtremum
               .argmaxStruct($"c", -$"key", "c", "neg_key").as("hot"))
        .select(lit(k).as("col_name"), $"n_keys", $"n_rows",
          (-$"hot.neg_key").as("hot_key"), $"hot.c".as("hot_rows"))
    }
    perKey.reduce(_ unionByName _)
      // hot/uniform ratio x1000: 1000 = perfectly uniform
      .withColumn("skew_x1000", expr("(hot_rows * n_keys * 1000L) DIV n_rows"))
  }

  val qSkewKeysSql: String =
    Seq("l_orderkey", "l_partkey", "l_suppkey").map { k =>
      s"""SELECT '$k' AS col_name, n_keys, n_rows, hot_key, hot_rows,
         |  (hot_rows * n_keys * 1000) // n_rows AS skew_x1000
         |FROM (
         |  SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
         |    min(hk) AS hot_key, CAST(max(c) AS BIGINT) AS hot_rows
         |  FROM (
         |    SELECT c, CASE WHEN rk = 1 THEN key END AS hk FROM (
         |      SELECT $k AS key, count(*) AS c,
         |        row_number() OVER (ORDER BY count(*) DESC, $k ASC) AS rk
         |      FROM lineitem GROUP BY $k)))""".stripMargin
    }.mkString("\nUNION ALL\n")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_join"     -> (qSaltedJoin _),
    "q_skew_keys"       -> (qSkewKeys _),
    "q_window_ranks"    -> (qWindowRanks _),
    "q_setops_all"      -> (qSetOpsAll _),
    "q_full_join"       -> (qFullJoin _),
    "q_profile_cats"    -> (qProfileCats _),
    "q_profile_numeric" -> (qProfileNumeric _),
    "q_stats"          -> (qStats _),
    "q_sql_api"        -> (qSqlApi _),
    "q_window_fns"     -> (qWindowFns _),
    "q_grouping_sets"  -> (qGroupingSets _),
    "q_pivot"          -> (qPivot _),
    "q_range_join"     -> (qRangeJoin _),
    "q_explode"        -> (qExplode _),
    "q_unpivot"        -> (qUnpivot _),
    "q1_agg"           -> (q1Agg _),
    "q6_filter_sum"    -> (q6FilterSum _),
    "q3_join_topk"     -> (q3Join _),
    "q5_star_join"     -> (q5StarJoin _),
    "q_semi_join"      -> (qSemiJoin _),
    "q_anti_join"      -> (qAntiJoin _),
    "q_window"         -> (qWindow _),
    "q_topk"           -> (qTopK _),
    "q_distinct"       -> (qDistinct _),
    "q_rollup"         -> (qRollup _),
    "q_cube"           -> (qCube _),
    "q_setops"         -> (qSetOps _),
    "q_case_agg"       -> (qCaseAgg _),
    "q_date_agg"       -> (qDateAgg _),
    "q_percentile"     -> (qPercentile _),
    "q_string_funcs"   -> (qStringFuncs _),
    "q_in_subquery"    -> (qInSubquery _),
    "q_exists"         -> (qExists _),
    "q_lateral"        -> (qLateral _),
    "q_scalar_subquery"-> (qScalarSubquery _),
  )

  def oracles: Map[String, String] = Map(
    "q_stats"           -> qStatsSql,
    "q_sql_api"         -> qSqlApiSql,
    "q_window_fns"      -> qWindowFnsSql,
    "q_grouping_sets"   -> qGroupingSetsSql,
    "q_pivot"           -> qPivotSql,
    "q_range_join"      -> qRangeJoinSql,
    "q_explode"         -> qExplodeSql,
    "q_unpivot"         -> qUnpivotSql,
    "q1_agg"            -> q1AggSql,
    "q_salted_join"     -> qSaltedJoinSql,
    "q_skew_keys"       -> qSkewKeysSql,
    "q_window_ranks"    -> qWindowRanksSql,
    "q_setops_all"      -> qSetOpsAllSql,
    "q_full_join"       -> qFullJoinSql,
    "q_profile_cats"    -> qProfileCatsSql,
    "q_profile_numeric" -> qProfileNumericSql,
    "q6_filter_sum"     -> q6FilterSumSql,
    "q3_join_topk"      -> q3JoinSql,
    "q5_star_join"      -> q5StarJoinSql,
    "q_semi_join"       -> qSemiJoinSql,
    "q_anti_join"       -> qAntiJoinSql,
    "q_window"          -> qWindowSql,
    "q_topk"            -> qTopKSql,
    "q_distinct"        -> qDistinctSql,
    "q_rollup"          -> qRollupSql,
    "q_cube"            -> qCubeSql,
    "q_setops"          -> qSetOpsSql,
    "q_case_agg"        -> qCaseAggSql,
    "q_date_agg"        -> qDateAggSql,
    "q_percentile"      -> qPercentileSql,
    "q_string_funcs"    -> qStringFuncsSql,
    "q_in_subquery"     -> qInSubquerySql,
    "q_exists"          -> qExistsSql,
    "q_lateral"         -> qLateralSql,
    "q_scalar_subquery" -> qScalarSubquerySql,
  )
}
