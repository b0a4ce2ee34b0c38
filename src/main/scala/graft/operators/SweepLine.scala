package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweep-line: peak concurrency per time bucket from a relation of
  * intervals — the capacity-planning read ("how many sessions were open at
  * once?") that raw event counts cannot answer. The reference serves one
  * user at a time and never asks this; it is the first question a deployed
  * version of its chat service would ask of its own logs.
  *
  * The classic sweep-line is a GLOBAL running sum over ±1 endpoint deltas —
  * a single total order, which is exactly what a distributed engine must
  * not do. This implementation decomposes it into two exact levels:
  *
  *   1. per-bucket local prefix sums (a window PARTITIONED by time bucket —
  *      parallel, one shuffle on the bucket key);
  *   2. a carry-in per bucket = the running total of all earlier buckets'
  *      delta sums — a window over the BUCKET AGGREGATE, whose row count is
  *      the number of time buckets (bounded by calendar time, not data
  *      volume: 10 years of hourly buckets is 87 600 rows).
  *
  * peak(bucket) = carry_in(bucket) + max(local prefix) — identical to the
  * global sweep because prefix sums are associative. Both windows use the
  * default peer-inclusive RANGE frame, so equal (ts, delta) rows sum as one
  * group and the result is independent of their relative order — the whole
  * computation is deterministic without a total tie-break. Ends sort before
  * starts at the same instant (delta −1 < +1): an interval beginning
  * exactly when another ends does not double-count, and a zero-length
  * interval never registers.
  */
object SweepLine {

  /** Endpoint deltas for `[stCol, enCol]` intervals: (+1 at start, −1 at
    * end), bucketed by `bucketWidth` in the columns' own time units.
    */
  def endpoints(
      intervals: DataFrame, stCol: String, enCol: String,
      bucketWidth: Long): DataFrame =
    intervals.select(col(stCol).as("ts"), lit(1L).as("delta"))
      .unionByName(intervals.select(col(enCol).as("ts"), lit(-1L).as("delta")))
      // integral div, not floor(double /): epoch-nano timestamps exceed
      // 2^53 and would misbucket near boundaries through a double
      .withColumn("bucket", expr(s"ts div ${bucketWidth}L"))

  /** Per-bucket peak concurrency: (bucket, n_starts, n_ends, peak).
    * Buckets with no endpoints do not appear (their concurrency is the
    * previous bucket's carry-out — densify with [[graft.operators]] range
    * fill if a gapless series is needed).
    */
  def peakPerBucket(
      intervals: DataFrame, stCol: String, enCol: String,
      bucketWidth: Long): DataFrame = {
    val pts = endpoints(intervals, stCol, enCol, bucketWidth)
    // level 1: local prefix sums within each bucket (peer-inclusive RANGE
    // frame — deterministic under ties)
    val wLocal = Window.partitionBy(col("bucket")).orderBy(col("ts"), col("delta"))
    val local = pts
      .withColumn("pfx", sum(col("delta")).over(wLocal))
      .groupBy(col("bucket"))
      .agg(
        max(col("pfx")).as("local_peak"),
        sum(col("delta")).as("bucket_delta"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_ends"))
    // level 2: carry-in over the tiny bucket aggregate (rows = #buckets)
    val wCarry = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    local
      .withColumn("carry_in",
        coalesce(sum(col("bucket_delta")).over(wCarry), lit(0L)))
      .select(col("bucket"), col("n_starts"), col("n_ends"),
        (col("carry_in") + col("local_peak")).as("peak"))
  }
}
