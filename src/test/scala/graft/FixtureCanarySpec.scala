package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema canary (round-7, VERDICT item #2).
  *
  * The driver regenerates /root/testdata between rounds and its physical
  * types have drifted before (round 6: events.ts TIMESTAMP(NANOS) →
  * TIMESTAMP_MICROS isAdjustedToUTC=0 → Spark TIMESTAMP_NTZ, which broke
  * 11 queries and 15 tests with scattered analysis errors). This spec
  * reads every table through `Tables.*` — i.e. AFTER normalization — and
  * asserts the schema contract the 168 queries rely on, so the next
  * fixture drift fails HERE with the drifted column named, instead of as
  * a pile of CAST_WITHOUT_SUGGESTION failures elsewhere.
  *
  * Deliberately type-CLASS based for columns where queries tolerate
  * several physical shapes (orders/lineitem date columns work as either
  * TIMESTAMP or TIMESTAMP_NTZ), and exact where queries require an exact
  * type (events.ts must be TimestampType: `cast(ts as bigint)`,
  * `withWatermark` and `Row.getTimestamp` all reject NTZ).
  */
class FixtureCanarySpec extends AnyFunSuite {
  import SparkTestSession._

  private sealed trait Kind { def ok(dt: DataType): Boolean; def name: String }
  private case object I extends Kind { // any integral
    def ok(dt: DataType) = dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
    val name = "integral"
  }
  private case object F extends Kind { // any fractional
    def ok(dt: DataType) = dt == FloatType || dt == DoubleType || dt.isInstanceOf[DecimalType]
    val name = "fractional"
  }
  private case object S extends Kind {
    def ok(dt: DataType) = dt == StringType; val name = "string"
  }
  private case object TAny extends Kind { // either timestamp flavor
    def ok(dt: DataType) = dt == TimestampType || dt == TimestampNTZType
    val name = "timestamp|timestamp_ntz"
  }
  private case object TExact extends Kind { // session-tz timestamp ONLY
    def ok(dt: DataType) = dt == TimestampType; val name = "timestamp (session-tz)"
  }
  private case object VecF extends Kind {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    val name = "array<float|double>"
  }

  private val contract: Map[String, Seq[(String, Kind)]] = Map(
    "region"   -> Seq("r_regionkey" -> I, "r_name" -> S),
    "nation"   -> Seq("n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I),
    "customer" -> Seq("c_custkey" -> I, "c_name" -> S, "c_nationkey" -> I,
                      "c_acctbal" -> F, "c_mktsegment" -> S),
    "supplier" -> Seq("s_suppkey" -> I, "s_name" -> S, "s_nationkey" -> I,
                      "s_acctbal" -> F),
    "part"     -> Seq("p_partkey" -> I, "p_name" -> S, "p_brand" -> S,
                      "p_type" -> S, "p_size" -> I, "p_retailprice" -> F),
    "orders"   -> Seq("o_orderkey" -> I, "o_custkey" -> I, "o_orderstatus" -> S,
                      "o_totalprice" -> F, "o_orderdate" -> TAny,
                      "o_orderpriority" -> S),
    "lineitem" -> Seq("l_orderkey" -> I, "l_partkey" -> I, "l_suppkey" -> I,
                      "l_linenumber" -> I, "l_quantity" -> F,
                      "l_extendedprice" -> F, "l_discount" -> F, "l_tax" -> F,
                      "l_returnflag" -> S, "l_linestatus" -> S,
                      "l_shipdate" -> TAny),
    "events"   -> Seq("event_id" -> I, "ts" -> TExact, "user_id" -> I,
                      "event_type" -> S, "value" -> F, "props" -> S),
    "documents" -> Seq("doc_id" -> I, "text" -> S, "lang" -> S,
                       "source" -> S, "n_chars" -> I),
    "embeddings" -> Seq("vec_id" -> I, "embedding" -> VecF, "label" -> I)
  )

  private def load(name: String) = name match {
    case "events" => Tables.events(spark, sf)
    case other    => Tables(spark, sf, other)
  }

  test("every fixture table matches the normalized schema contract") {
    val problems = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = load(table).schema
      val missing = cols.collect {
        case (c, _) if !schema.fieldNames.contains(c) =>
          s"$table.$c: MISSING (fixture columns: ${schema.fieldNames.mkString(", ")})"
      }
      val drifted = cols.collect {
        case (c, kind) if schema.fieldNames.contains(c) && !kind.ok(schema(c).dataType) =>
          s"$table.$c: expected ${kind.name}, fixture now reads as ${schema(c).dataType.sql} — " +
            "fixture drift; adjust Tables normalization"
      }
      missing ++ drifted
    }
    assert(problems.isEmpty, "\nFIXTURE DRIFT DETECTED:\n" + problems.mkString("\n"))
  }

  test("normalized events.ts supports the operations the time-series family needs") {
    val ev = Tables.events(spark, sf)
    // these were exactly the round-6 failure modes; keep them planning
    ev.selectExpr("cast(ts as bigint) AS ts_s").queryExecution.analyzed
    ev.withWatermark("ts", "1 hour").queryExecution.analyzed
    val r = ev.limit(1).collect().head
    assert(r.getAs[java.sql.Timestamp](r.fieldIndex("ts")) != null,
      "Row.getTimestamp must work on normalized events.ts")
  }
}
