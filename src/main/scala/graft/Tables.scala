package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `dir`. Reads are plain
  * `spark.read.parquet` so Catalyst's parquet scan handles predicate
  * pushdown / column pruning for whatever the downstream plan needs —
  * never pre-select here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** events.parquet's `ts` physical type has drifted across fixture
    * generations; normalize every known shape to a session-tz TIMESTAMP so
    * downstream casts (`cast(ts as bigint)`), watermarks, and
    * `Row.getTimestamp` all see the same thing:
    *   - TIMESTAMP(NANOS): no native Spark type — with
    *     spark.sql.legacy.parquet.nanosAsLong=true the column arrives as
    *     Long nanos; floor-convert to microsecond TIMESTAMP.
    *   - TIMESTAMP_MICROS isAdjustedToUTC=0: Spark reads TIMESTAMP_NTZ;
    *     cast to TIMESTAMP (all graft sessions pin UTC, so the wall-clock
    *     micros are preserved exactly — matching DuckDB's epoch_us).
    *   - TIMESTAMP (adjusted): already what we want. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // runtime confs, so sessions built without GraftSession still read
    // nanos AND see the NTZ→TIMESTAMP cast as value-preserving: that cast
    // reinterprets wall-clock micros in the SESSION timezone, so a
    // non-UTC session would shift every epoch second vs DuckDB's epoch_us
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
