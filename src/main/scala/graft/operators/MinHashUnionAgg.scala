package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator unioning MinHash signatures by element-wise min — the
  * signature of a SET of documents equals the min-union of member
  * signatures, so per-partition partial aggregation composes exactly
  * (classic MinHash mergeability; reserved in SURVEY.md §2.9 for streaming/
  * hierarchical dedup). Buffer is a plain long array; Catalyst runs this as
  * partial+final like any built-in agg.
  */
class MinHashUnionAgg(numHashes: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashUnionAgg {
  def column(numHashes: Int): TypedColumn[Seq[Long], Seq[Long]] =
    new MinHashUnionAgg(numHashes).toColumn
}
