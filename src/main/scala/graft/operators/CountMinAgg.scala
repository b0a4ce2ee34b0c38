package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * mergeable typed Aggregator: `depth` hash rows × `width` counters, point
  * estimate = min over rows, one-sided error (never an underestimate,
  * overestimate bounded by ε·N with ε = e/width at the standard depth).
  * The third mergeable sketch in the suite, covering FREQUENCY alongside
  * distinct-count (KMV, q73) and set-signature (MinHash union, q42).
  *
  * Scale shape: the sketch ingests the raw token STREAM — no groupBy, no
  * vocabulary materialization — and Catalyst runs the Aggregator
  * partial+final like any built-in agg, so each partition reduces to one
  * depth×width long array (4 KB at 4×128) and the merge tree ships
  * sketches, never tokens. That is the whole point at 100 TB: heavy-hitter
  * frequency estimates with bounded memory and a shuffle of
  * O(partitions · sketch), vs the exact count's corpus-wide shuffle.
  *
  * Bucket hashing lives OUTSIDE the Aggregator ([[bucketsCol]], the
  * engine's md5-based [[HashFunctions.stableHash64]]) so the hash family
  * is engine-reproducible: an oracle can rebuild the identical counter
  * table relationally (sum of word counts per bucket) and the estimates
  * match bit-for-bit.
  */
class CountMinAgg(val depth: Int, val width: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(depth * width)(0L)

  override def reduce(buf: Array[Long], buckets: Seq[Int]): Array[Long] = {
    var j = 0
    while (j < depth && j < buckets.length) {
      buf(j * width + buckets(j)) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMinAgg {

  /** Per-row bucket ids `array<int>` of length `depth` for `key`:
    * row j's bucket = stableHash64("cms<j>:" ++ key) mod width.
    */
  def bucketsCol(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { j =>
      pmod(HashFunctions.stableHash64(concat(lit(s"cms$j:"), key)),
        lit(width.toLong)).cast("int")
    }: _*)

  /** Point-estimate column for `key` against a materialized sketch array
    * (1-based `element_at`): min over the depth rows.
    */
  def estimateCol(key: Column, sketch: Column, depth: Int, width: Int): Column =
    (0 until depth).map { j =>
      element_at(sketch,
        pmod(HashFunctions.stableHash64(concat(lit(s"cms$j:"), key)),
          lit(width.toLong)).cast("int") + j * width + 1)
    }.reduce(least(_, _))
}
