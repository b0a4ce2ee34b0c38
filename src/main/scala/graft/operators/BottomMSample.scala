package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable deterministic bottom-m sample: of all (hash, value)
  * observations in a group, keep the m with the smallest (hash, value)
  * pairs and surface their VALUES sorted ascending — a uniform sample of
  * the group (the hash is
  * [[graft.functions.HashFunctions.stableHash64]] of a salted row key, so
  * "smallest hashes" is a uniform draw) whose membership is a pure
  * function of the data. Exact order statistics of the sample then stand
  * in for the group's quantiles.
  *
  * Same mergeability class as [[KmvSketchAgg]]: union = merge-and-trim,
  * so per-partition partial aggregation composes exactly and a shuffle
  * carries at most m pairs per group instead of the group's rows — the
  * scale path for quantile profiling a 100 TB corpus, with none of the
  * cross-engine irreproducibility of rank-error sketches (t-digest, GK):
  * the deterministic hash makes the sample — and therefore every reported
  * quantile — bit-for-bit checkable by any engine that can sort.
  *
  * The buffer is a (hash, value)-sorted multiset of ≤ m pairs; equal
  * pairs (a 60-bit hash collision between equal values) are kept as
  * duplicates, matching a rank-based oracle.
  */
class BottomMSampleAgg(m: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Seq[Long]] {

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(buf: Array[(Long, Long)], x: (Long, Long)): Array[(Long, Long)] = {
    if (buf.length >= m && !lt(x, buf(m - 1))) buf
    else {
      // insertion point in the sorted buffer (first element greater than x)
      var lo = 0
      var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(x, buf(mid))) hi = mid else lo = mid + 1
      }
      val n = math.min(buf.length + 1, m)
      val out = new Array[(Long, Long)](n)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = x
      System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
      out
    }
  }

  override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](math.min(a.length + b.length, m))
    var (i, j, n) = (0, 0, 0)
    while (n < out.length) {
      val takeA = j >= b.length || (i < a.length && !lt(b(j), a(i)))
      if (takeA) { out(n) = a(i); i += 1 } else { out(n) = b(j); j += 1 }
      n += 1
    }
    out
  }

  override def finish(buf: Array[(Long, Long)]): Seq[Long] =
    buf.map(_._2).sorted.toSeq

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    Encoders.kryo[Array[(Long, Long)]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
