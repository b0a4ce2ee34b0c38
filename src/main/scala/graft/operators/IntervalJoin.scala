package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join as a bucketed EQUI-join — the scale answer to
  * `ON pt BETWEEN lo AND hi`, which Catalyst can only execute as a
  * (broadcast) nested-loop: O(|points|·|intervals|) comparisons even when
  * the match density is tiny.
  *
  * Shape: each interval explodes into the time buckets it covers
  * (⌈len/bucketSize⌉ + 1 rows — bounded when interval length is bounded),
  * each point maps to exactly ONE bucket (`pt div bucketSize` — so no
  * post-join dedup is ever needed), and the join runs on the bucket id
  * with the exact range predicate as a cheap refine. Cost becomes
  * O(points + intervals·spread + matches) through one hash shuffle (or a
  * broadcast when the exploded interval side is small), and AQE handles a
  * skewed bucket like any other hot key. Pick `bucketSize` near the
  * typical interval length: much smaller multiplies the interval
  * replication, much larger piles unrelated points into each bucket.
  */
object IntervalJoin {

  /** The bucket size the scaladoc above tells callers to pick, computed:
    * the MEDIAN valid-interval length via a single-pass approximate
    * quantile (1% relative error — a map-combinable aggregate, one scan of
    * the interval side, no collect of data rows). The median is the right
    * robust center here: a mean would let one year-long outlier interval
    * inflate the bucket and pile unrelated points together, while the
    * median keeps replication ≤ ~2× for half the intervals by
    * construction. Inverted/empty intervals are excluded (they produce no
    * cover rows either); a corpus with NO valid interval returns 1 (any
    * size is vacuously fine — the join is empty). The double cast loses
    * precision only past 2^53 — irrelevant for an ESTIMATE that only
    * steers replication, never correctness.
    */
  def estimateBucketSize(
      intervals: DataFrame, loCol: String, hiCol: String): Long = {
    val q = intervals
      .filter(col(hiCol) > col(loCol))
      .select((col(hiCol) - col(loCol)).cast("double").as("__graft_len"))
      .stat.approxQuantile("__graft_len", Array(0.5), 0.01)
    if (q.isEmpty) 1L else math.max(1L, q(0).toLong)
  }

  /** Join `points` to half-open `[lo, hi)` `intervals`. All three columns
    * must be integral (same unit); every matching (point, interval) pair
    * appears exactly once. Negative domains are safe: `div` truncates
    * toward zero rather than flooring, but it is monotone and applied
    * identically to both sides, so the bucket cover stays consistent
    * (property-tested over zero-straddling corpora). Empty or inverted
    * intervals (`hi <= lo`) produce no output AND no bucket rows: an
    * unguarded `sequence(loBkt, hiBkt)` with start > stop would generate
    * a DESCENDING cover — up to (lo-hi)/bucketSize spurious rows per bad
    * interval, all discarded by the refine but paid for in the shuffle —
    * so the cover is null (explode drops it) unless `hi > lo`.
    *
    * Pass `bucketSize = 0` to have [[estimateBucketSize]] pick the size
    * from the data (one extra aggregate pass over the interval side; the
    * output is bucket-size-invariant, so auto vs any explicit choice is
    * purely a performance decision).
    */
  def joinPointsToIntervals(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketSize: Long): DataFrame =
    joinPointsToIntervals(points, ptCol, intervals, loCol, hiCol, bucketSize, Nil)

  /** As above, with additional equi-join `keyCols` (present on BOTH
    * inputs): the per-key point-in-interval join — "this user's events
    * against this user's validity windows". The keys simply join the
    * bucket key, so the shuffle co-partitions on (keys, bucket) and a hot
    * key's buckets still spread across partitions.
    */
  def joinPointsToIntervals(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketSize: Long, keyCols: Seq[String]): DataFrame = {
    require(bucketSize >= 0, "bucketSize must be positive (or 0 for auto)")
    val bs =
      if (bucketSize == 0L) estimateBucketSize(intervals, loCol, hiCol)
      else bucketSize
    // internal helper column: collision-proof, never visible in the output
    val bkt = "__graft_bkt"
    require(!points.columns.contains(bkt) && !intervals.columns.contains(bkt),
      s"inputs must not already carry a `$bkt` column")
    keyCols.foreach { k =>
      require(points.columns.contains(k) && intervals.columns.contains(k),
        s"key column `$k` must exist on both inputs")
    }
    // integer `div`, not `/`: Column./ is DOUBLE division and epoch-scale
    // longs past 2^53 would silently lose low bits
    val iv = intervals.withColumn(bkt,
      explode(when(col(hiCol) > col(loCol),
        sequence(expr(s"$loCol div $bs"),
          expr(s"($hiCol - 1) div $bs")))))
    points.withColumn(bkt, expr(s"$ptCol div $bs"))
      .join(iv, bkt +: keyCols)
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop(bkt)
  }
}
