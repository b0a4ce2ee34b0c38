package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a mergeable typed Aggregator: each input is
  * a (key, id) pair, the state is the k best pairs seen so far, ordered by
  * key DESC then id ASC (the id tiebreak makes the result a deterministic
  * total order — the same contract every ranked query in the suite uses).
  *
  * This is the scale answer to `row_number() OVER (PARTITION BY g ORDER BY
  * …) <= k`: the window form shuffles EVERY row of every group and sorts
  * each group in full, while the Aggregator form reduces each map-side
  * partition to ≤ k pairs per group before the exchange — the shuffle
  * carries O(groups · k · partitions) bounded state, never the corpus, and
  * the merge tree is a k-way sorted-list merge (associative + commutative,
  * so Catalyst's partial+final placement is free to reorder it). At 100 TB
  * with k = 3 that is the difference between shuffling 100 TB of rows and
  * shuffling kilobytes per group.
  *
  * State is a sorted immutable List (k is small by contract — a top-k with
  * k in the thousands should use the window form, where the sort amortizes).
  */
class TopKAgg(val k: Int)
    extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {

  require(k > 0, "k must be positive")

  // (key DESC, id ASC) — "better" sorts first
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Long, Long)] = Nil

  override def reduce(buf: List[(Long, Long)], in: (Long, Long)): List[(Long, Long)] = {
    // fast reject: buffer full and the new pair doesn't beat the worst
    if (buf.lengthCompare(k) >= 0 && !beats(in, buf.last)) buf
    else {
      val (better, worse) = buf.span(beats(_, in))
      (better ::: in :: worse).take(k)
    }
  }

  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] = {
    // merge of two sorted lists, truncated at k
    val out = List.newBuilder[(Long, Long)]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && beats(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: List[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    Encoders.kryo[List[(Long, Long)]]

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
