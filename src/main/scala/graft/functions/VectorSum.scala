package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate: element-wise SUM of fixed-width long vectors —
  * the mergeable buffer behind per-group embedding centroids
  * (`q_embedding_centroids`). Same contract as [[MinHashSketch]]: `merge`
  * is associative and commutative, so Spark applies partial aggregation
  * and each executor ships ONE dim-length long array per group to the
  * shuffle regardless of group size — the property that makes a centroid
  * over a 100 TB embedding corpus a single linear pass instead of a
  * posexplode into corpus×dim rows.
  *
  * Inputs are integer-scaled embedding elements (`floor(x · 1e7)` longs),
  * not doubles: long addition is exact and order-independent, so the
  * result is bit-identical however partitions combine — double sums
  * would wobble in the low bits with partition order and break the
  * cross-engine hash oracle. Overflow headroom: 1e7-scaled unit-range
  * elements leave ~10^11 safe group cardinality in a signed 64-bit sum.
  */
class VectorSum(dim: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(dim)(0L)

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    // same convention as CodeDot: a silent min-length truncation would
    // mask a dimension bug upstream (the row would still be COUNTED while
    // contributing only a prefix of its elements)
    require(v.length == dim,
      s"VectorSum(dim=$dim) got a ${v.length}-element vector")
    var i = 0
    while (i < dim) {
      buf(i) += v(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) {
      a(i) += b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object VectorSum {
  /** Column function: `VectorSum.udaf(dim)(col("scaled"))` sums
    * dim-length long arrays element-wise. */
  def udaf(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new VectorSum(dim))
}
