package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's API lacks natively.
  *
  * Semantics: for each left row, attach the single right row with the
  * greatest `rightTs <= leftTs` within the same key (DuckDB/kdb ASOF JOIN,
  * pandas merge_asof backward); nulls when no prior right row exists.
  *
  * Implementation is the scalable union trick, NOT a range self-join:
  * tag both inputs, union them, and carry the latest right payload forward
  * with last(ignoreNulls) over (key ORDER BY ts, side). One shuffle on the
  * key, linear scan within partitions — survives a 100x scale-up where an
  * inequality join would explode. Right rows sort before left rows at
  * equal ts, so `<=` holds on ties.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach, as (srcCol, outputName);
    *                right rows must be unique per (keys, rightTs).
    * @param toleranceSeconds if set, matches older than this are nulled
    *                (pandas merge_asof `tolerance` semantics). */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[(String, String)],
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val keyCols = keys.map(col)
    val carryCols = left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq

    val taggedRight = right.select(
      keyCols ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_side")) ++
        payload.map { case (src, dst) => col(src).as(s"_p_$dst") } ++
        carryCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keyCols ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_side")) ++
        payload.map { case (src, dst) =>
          lit(null).cast(right.schema(src).dataType).as(s"_p_$dst") } ++
        carryCols.map(col): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried0 = payload.foldLeft(taggedRight.unionByName(taggedLeft)) {
      case (df, (_, dst)) =>
        df.withColumn(s"_c_$dst", last(col(s"_p_$dst"), ignoreNulls = true).over(w))
    }
    // matched right timestamp rides along for tolerance filtering
    val carried = carried0.withColumn("_c_match_ts",
      last(when(col("_side") === 0, col("_ts")), ignoreNulls = true).over(w))

    val withTol = toleranceSeconds match {
      case None => carried
      case Some(tol) =>
        val stale = col("_ts").cast("long") - col("_c_match_ts").cast("long") > tol
        payload.foldLeft(carried) { case (df, (_, dst)) =>
          df.withColumn(s"_c_$dst", when(stale, lit(null)).otherwise(col(s"_c_$dst")))
        }
    }

    withTol.filter(col("_side") === 1)
      .select(keyCols ++ Seq(col("_ts").as(leftTs)) ++ carryCols.map(col) ++
        payload.map { case (_, dst) => col(s"_c_$dst").as(dst) }: _*)
  }
}
