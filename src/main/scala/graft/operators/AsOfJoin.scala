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

    // Carry the matched right ROW as one struct: last(ignoreNulls) then
    // never skips a right row whose payload happens to be NULL (it would
    // otherwise fall back to an older row's value), and the match
    // timestamp + payload are guaranteed to come from the same row.
    val rowStruct = when(col("_side") === 0,
      struct(col("_ts").as("mts") +: payload.map { case (_, dst) =>
        col(s"_p_$dst").as(dst) }: _*))
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("_c_row", last(rowStruct, ignoreNulls = true).over(w))

    val fresh = toleranceSeconds match {
      case None => col("_c_row").isNotNull
      case Some(tol) =>
        col("_c_row").isNotNull &&
          col("_ts").cast("long") - col("_c_row.mts").cast("long") <= tol
    }

    carried.filter(col("_side") === 1)
      .select(keyCols ++ Seq(col("_ts").as(leftTs)) ++ carryCols.map(col) ++
        payload.map { case (_, dst) =>
          when(fresh, col(s"_c_row.$dst")).as(dst) }: _*)
  }
}
