package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed elementwise vector-mean aggregator (§2.8 custom-UDAF surface):
  * accumulates (elementwise sum, count) per group and emits the mean
  * vector — the centroid-recompute primitive of k-means. Algebraic, so
  * Spark runs it with map-side partial aggregation: ONE shuffle of
  * dim-length buffers per group, versus the posexplode → per-dimension
  * avg → collect_list/re-sort reassembly (two shuffles and a row
  * explosion of x dim).
  *
  * The first reduced row fixes the dimensionality; empty groups finish
  * to an empty vector. */
class VectorMeanAggregator
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(buf: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val (sums, n) = buf
    val acc = if (sums.length == 0) new Array[Double](v.length) else sums
    require(v.length == acc.length,
      s"VectorMeanAggregator: ragged input dims ${v.length} vs ${acc.length}")
    var i = 0
    while (i < acc.length) { acc(i) += v(i); i += 1 }
    (acc, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.length == 0) b
    else if (b._1.length == 0) a
    else {
      require(a._1.length == b._1.length,
        s"VectorMeanAggregator: ragged partial dims ${a._1.length} vs ${b._1.length}")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(buf: (Array[Double], Long)): Seq[Double] = {
    val (sums, n) = buf
    if (n == 0) Seq.empty
    else {
      val out = new Array[Double](sums.length)
      var i = 0
      while (i < sums.length) { out(i) = sums(i) / n; i += 1 }
      out.toSeq
    }
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
