package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY §2 UDF/UDAF surface): element-wise MIN
  * union of MinHash signatures. A MinHash sketch of a set union is the
  * element-wise minimum of the members' sketches, so grouping documents by
  * any key and folding their signatures through this aggregator yields the
  * group's near-duplicate signature in ONE pass — the mergeable-sketch
  * property that makes MinHash work at 100 TB: partial aggregation
  * (map-side combine) applies because `merge` is associative and
  * commutative, so each executor ships only K longs per group to the
  * shuffle regardless of group size.
  *
  * Registered with `functions.udaf(...)` — the public, Encoder-checked
  * path for custom aggregates (vs TypedImperativeAggregate, which buys
  * nothing here since the buffer is a fixed-width array).
  */
class MinHashSketch(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < k && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
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

object MinHashSketch {
  /** Column function: `minhashUnion(col("mh"))` aggregates signature
    * arrays; k must match the signature width. */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinHashSketch(k))
}
