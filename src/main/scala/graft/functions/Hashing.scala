package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The engine's cross-engine deterministic hash: the low 60 bits of
  * md5(value-as-string). One definition, used by batch sampling, streaming
  * sampling, and any oracle that needs the DuckDB-equivalent
  * `('0x' || substr(md5(CAST(x AS VARCHAR)), 18, 15))::BIGINT`.
  * Changing this breaks stream/batch/oracle parity together — which is
  * the point of having exactly one copy. */
object Hashing {

  /** Spark SQL expression text for the 60-bit hash of `col`. */
  def h60Sql(col: String): String =
    s"CAST(conv(substr(md5(CAST($col AS STRING)), 18, 15), 16, 10) AS BIGINT)"

  def h60(col: String): Column = expr(h60Sql(col))

  /** Uniform bucket in [0, buckets) from the 60-bit hash. */
  def bucket(col: String, buckets: Int): Column =
    expr(s"${h60Sql(col)} % $buckets")

  /** DuckDB rendering of the same hash (for oracle SQL builders). */
  def h60Duck(col: String): String =
    s"('0x' || substr(md5(CAST($col AS VARCHAR)), 18, 15))::BIGINT"
}
