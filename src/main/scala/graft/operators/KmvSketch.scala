package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable k-minimum-values (KMV) distinct-count sketch over the
  * engine's deterministic 60-bit stable hash
  * ([[graft.functions.HashFunctions.stableHash64]]). The sketch of a set
  * is its k smallest DISTINCT hash values; union = merge-and-trim, so
  * per-partition partial aggregation composes exactly (same mergeability
  * class as [[MinHashUnionAgg]]) and a shuffle carries at most k longs per
  * group instead of the group's distinct stream. The estimator is the
  * classic (k-1)·M / h_k (Beyer et al., "On synopses for distinct-value
  * estimation"), M = 2^60 — and because the hash is deterministic, the
  * ESTIMATE is deterministic too: the oracle reproduces it bit-for-bit
  * from row_number() over the same md5-derived hashes (no other engine's
  * approx_count_distinct can be oracle-checked this way).
  *
  * Buffer is a sorted, deduplicated ascending array of ≤ k hashes.
  */
class KmvSketchAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -(pos + 1)
      if (ins >= k) buf // larger than the current k minima
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted deduped arrays, keep the k smallest distinct
    val out = new Array[Long](math.min(a.length + b.length, k))
    var (i, j, n) = (0, 0, 0)
    var last = Long.MinValue
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || v != last) { out(n) = v; last = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object KmvSketch {
  /** 2^60 — the stable hash's range is [0, 2^60). */
  val Modulus: Double = 1152921504606846976.0

  def column(k: Int): TypedColumn[Long, Seq[Long]] = new KmvSketchAgg(k).toColumn

  /** Plain-Scala estimate from a finished sketch: exact size below k,
    * (k-1)·M / h_k at capacity.
    */
  def estimate(sketch: Seq[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble * Modulus / sketch.last.toDouble
}
