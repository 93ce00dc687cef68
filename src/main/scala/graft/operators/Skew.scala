package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys (the 100 TB concern: one hot
  * competência/UF key turning a shuffle join into a single straggler task).
  *
  * AQE's skew-join splitting handles sort-merge cases at runtime; explicit
  * salting remains the tool when the skewed side must hash-join or the
  * skew is known up front. `saltedJoin` spreads each probe row over one of
  * `salt` sub-keys deterministically and replicates the build side `salt`
  * times, so a hot key becomes `salt` parallel tasks. Result is exactly
  * the plain equi-join (verified by spec).
  */
object Skew {

  /** Deterministic per-row salt in [0, salt): hash of the given columns. */
  def saltCol(salt: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salt.toLong)).cast("int")

  /** Equi-join `probe` (large, possibly skewed) with `build` (smaller) on
    * `key`, spreading each probe key across `salt` sub-partitions.
    * `probeSaltBy` picks the columns that scatter probe rows (default: all
    * probe columns — any per-row-distinct subset works). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salt: Int,
                 probeSaltBy: Seq[String] = Seq.empty): DataFrame = {
    val scatter = if (probeSaltBy.nonEmpty) probeSaltBy else probe.columns.toSeq
    val p = probe.withColumn("_salt", saltCol(salt, scatter.map(col): _*))
    val b = build.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }
}
