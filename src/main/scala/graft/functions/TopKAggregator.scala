package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregator over (score, id) pairs — keeps the k
  * best by (score desc, id asc) with O(k) state per group, so a
  * streaming groupBy can rank candidates without a window (non-time
  * windows are unsupported on streams) and without unbounded
  * collect_list state. The buffer stays a sorted Vector: insert is
  * O(k) — fine for retrieval-sized k. Input is (qId, score, id); the
  * qId rides only because typed agg inputs see the full row. */
/** [[TopKAggregator]] over (key1, key2, score, id) rows — for typed
  * aggregations keyed by a PAIR (groupByKey on (_1, _2)), e.g. the
  * per-(vector, group) cell cut of the hierarchical incremental
  * router. Same bounded buffer, same (score desc, id asc) order. */
class GroupTopKAggregator(k: Int)
    extends Aggregator[(Long, Long, Double, Long), Vector[(Double, Long)], Seq[(Double, Long)]] {
  private val inner = new TopKAggregator(k)
  override def zero: Vector[(Double, Long)] = inner.zero
  override def reduce(b: Vector[(Double, Long)], a: (Long, Long, Double, Long)): Vector[(Double, Long)] =
    inner.reduce(b, (a._1, a._3, a._4))
  override def merge(b1: Vector[(Double, Long)], b2: Vector[(Double, Long)]): Vector[(Double, Long)] =
    inner.merge(b1, b2)
  override def finish(b: Vector[(Double, Long)]): Seq[(Double, Long)] = inner.finish(b)
  override def bufferEncoder: Encoder[Vector[(Double, Long)]] = inner.bufferEncoder
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = inner.outputEncoder
}

class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double, Long), Vector[(Double, Long)], Seq[(Double, Long)]] {

  // java Double.compare (not primitive >): NaN sorts as the LARGEST score,
  // matching Spark SQL's ordering — so the aggregator ranks identically to
  // the batch window even on degenerate (zero-vector) cosines
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: Vector[(Double, Long)], x: (Double, Long)): Vector[(Double, Long)] = {
    if (buf.length >= k && !better(x, buf.last)) buf
    else {
      val i = buf.indexWhere(e => better(x, e))
      val grown = if (i < 0) buf :+ x else (buf.take(i) :+ x) ++ buf.drop(i)
      if (grown.length > k) grown.take(k) else grown
    }
  }

  override def zero: Vector[(Double, Long)] = Vector.empty
  override def reduce(b: Vector[(Double, Long)], a: (Long, Double, Long)): Vector[(Double, Long)] =
    insert(b, (a._2, a._3))
  override def merge(b1: Vector[(Double, Long)], b2: Vector[(Double, Long)]): Vector[(Double, Long)] =
    b2.foldLeft(b1)(insert)
  override def finish(b: Vector[(Double, Long)]): Seq[(Double, Long)] = b
  override def bufferEncoder: Encoder[Vector[(Double, Long)]] =
    ExpressionEncoder[Vector[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
