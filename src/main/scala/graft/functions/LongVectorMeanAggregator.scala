package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Integer twin of [[VectorMeanAggregator]] for the hash-gated k-means
  * path: accumulates (elementwise BIGINT sum, count) and emits the
  * per-dimension integer mean s / n with Long division — which truncates
  * toward zero exactly like Spark's `DIV` and DuckDB's `//` (negatives
  * included), so the typed fast path is bit-identical to the
  * posexplode → sum DIV count → reassemble spec formulation it replaces.
  * Algebraic: map-side partials shuffle one dim-length buffer per
  * (partition, group) instead of dim rows per vector. */
class LongVectorMeanAggregator
    extends Aggregator[Seq[Long], (Array[Long], Long), Seq[Long]] {

  override def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)

  override def reduce(buf: (Array[Long], Long), v: Seq[Long]): (Array[Long], Long) = {
    val (sums, n) = buf
    val acc = if (sums.length == 0) new Array[Long](v.length) else sums
    require(v.length == acc.length,
      s"LongVectorMeanAggregator: ragged input dims ${v.length} vs ${acc.length}")
    var i = 0
    while (i < acc.length) { acc(i) += v(i); i += 1 }
    (acc, n + 1)
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    if (a._1.length == 0) b
    else if (b._1.length == 0) a
    else {
      require(a._1.length == b._1.length,
        s"LongVectorMeanAggregator: ragged partial dims ${a._1.length} vs ${b._1.length}")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(buf: (Array[Long], Long)): Seq[Long] = {
    val (sums, n) = buf
    if (n == 0) Seq.empty
    else {
      val out = new Array[Long](sums.length)
      var i = 0
      while (i < sums.length) { out(i) = sums(i) / n; i += 1 }
      out.toSeq
    }
  }

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
