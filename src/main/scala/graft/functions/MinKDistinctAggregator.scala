package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum-values sketch builder — keeps the k SMALLEST
  * DISTINCT Long hashes per group with O(k) state, the algebraic form of
  * KMV sketch construction: partial aggregation ships at most k values
  * per map partition instead of the full distinct hash set, which is the
  * difference between a sketch build that scales and a distinct+window
  * that shuffles the whole hash universe. Buffer is a sorted distinct
  * Vector; insert is O(log k) search + O(k) splice — fine for sketch-
  * sized k. Deterministic: the result is exactly the k smallest distinct
  * values, so it hash-gates against the declarative distinct+row_number
  * formulation (equality spec'd). */
class MinKDistinctAggregator(k: Int)
    extends Aggregator[Long, Vector[Long], Seq[Long]] {

  private def insert(buf: Vector[Long], x: Long): Vector[Long] = {
    if (buf.length >= k && x >= buf.last) buf
    else {
      val i = buf.search(x) match {
        case scala.collection.Searching.Found(_) => return buf // distinct
        case scala.collection.Searching.InsertionPoint(p) => p
      }
      val grown = (buf.take(i) :+ x) ++ buf.drop(i)
      if (grown.length > k) grown.take(k) else grown
    }
  }

  override def zero: Vector[Long] = Vector.empty
  override def reduce(b: Vector[Long], a: Long): Vector[Long] = insert(b, a)
  override def merge(b1: Vector[Long], b2: Vector[Long]): Vector[Long] =
    b2.foldLeft(b1)(insert)
  override def finish(b: Vector[Long]): Seq[Long] = b
  override def bufferEncoder: Encoder[Vector[Long]] =
    ExpressionEncoder[Vector[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
