package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY §2.8's reserved custom
  * `Aggregator` slot): merges per-row MinHash signatures into the
  * signature of the UNION of the rows' shingle sets, using the MinHash
  * algebra — elementwise min is exactly union semantics, which is what
  * makes the sketch mergeable across partitions (map-side partial
  * aggregation for free, like any algebraic agg).
  *
  * Input rows are signatures from NativeExprs.MinHashSig; the group
  * result estimates Jaccard between whole groups (e.g. per-source corpus
  * overlap) without materializing the union. */
class MinHashAggregator(nPerms: Int = 128)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(nPerms)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < nPerms && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nPerms) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAggregator {
  /** Jaccard estimate from two equal-length signatures: fraction of
    * agreeing minima. */
  def estimate(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length && a.nonEmpty)
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.length
  }
}
