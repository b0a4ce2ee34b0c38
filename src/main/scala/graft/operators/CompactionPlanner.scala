package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planner — the table-maintenance operator every
  * 100 TB lakehouse runs nightly: files below a size threshold are packed
  * into target-sized rewrite groups; files already at or above the
  * threshold are left untouched (rewriting them would burn IO for no
  * layout gain). The reference materializes per-run CSV drops with no
  * maintenance story (`pipeline1.py` writes one file per stage run); this
  * is the operator that keeps that layout from decaying into a
  * million-file scan problem.
  *
  * The packing is cumulative-sum bucketing, not bin-packing search: small
  * files sort by (bytes desc, file id) within their partition group, a
  * running byte total assigns bin = (cumsum − 1) div target, and every bin
  * lands within one file of `targetBytes` — the greedy guarantee compaction
  * jobs actually rely on (Spark's own `SizeBasedFileRewriter` and Iceberg's
  * binpack strategy make the same tradeoff: near-optimal groups for one
  * window pass, no NP-hard search).
  *
  * Scale shape: the input is a MANIFEST — file-level metadata, ~10⁻⁶ the
  * data bytes — so the window runs over thousands of rows per partition
  * group, not the data. The window partitions by the table's partition
  * column (each partition group plans independently — exactly how a real
  * compactor parallelizes), so there is no global sort; one manifest-sized
  * shuffle total.
  */
object CompactionPlanner {

  /** Assigns `bin` (0-based, per group) to every small file; large files
    * get bin = null. Adds `is_small` (1/0) and keeps input columns.
    */
  def assignBins(
      manifest: DataFrame, groupCol: String, fileCol: String,
      bytesCol: String, targetBytes: Long, smallThreshold: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(bytesCol).desc, col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val small = col(bytesCol) < smallThreshold
    manifest
      .withColumn("is_small", small.cast("int"))
      .withColumn("_csum",
        sum(when(small, col(bytesCol)).otherwise(lit(0L))).over(w))
      // integral div, not floor(double /): a partition group whose small-
      // file bytes exceed 2^53 would misbucket through a double (the
      // SweepLine policy; the oracle's `//` is integer too)
      .withColumn("bin",
        when(small, expr(s"(_csum - 1) div ${targetBytes}L")))
      .drop("_csum")
  }

  /** Per-group compaction summary: file counts and bytes before/after, and
    * the planned rewrite-group count. `files_after` = untouched large files
    * plus one output file per bin.
    */
  def planSummary(
      manifest: DataFrame, groupCol: String, fileCol: String,
      bytesCol: String, targetBytes: Long, smallThreshold: Long): DataFrame =
    assignBins(manifest, groupCol, fileCol, bytesCol, targetBytes, smallThreshold)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("files_before"),
        sum(col("is_small")).cast("long").as("n_small"),
        sum(when(col("is_small") === 1, col(bytesCol)).otherwise(lit(0L)))
          .as("small_bytes"),
        countDistinct(col("bin")).as("n_bins"),
        sum(col(bytesCol)).as("total_bytes"))
      .withColumn("files_after",
        col("files_before") - col("n_small") + col("n_bins"))
}
