package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the WRITE-side layout operator behind
  * multi-dimensional file skipping (Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * Hudi space-filling curves; Morton 1966). Interleaving the bits of two
  * sort dimensions makes lexicographic order on the key a space-filling
  * curve: rows that land in the same output file span a NARROW range of
  * BOTH dimensions, so per-file min/max statistics prune scans filtered on
  * either column — a plain `ORDER BY (x, y)` clusters only the leading
  * column and a filter on `y` alone reads every file.
  *
  * At 100 TB this is how a fact table serves point-ish queries on two
  * independent keys without a second copy: one range shuffle on the
  * z-value at write time (`Batching.globalRowNumber`'s range-partitioned
  * shape — never a single-partition ORDER BY window), then file-sized
  * splits of the curve. The key itself is a pure scan-side expression —
  * 2·bits literal-shift terms, codegen-friendly, no UDF — and integer
  * end-to-end, so layouts are reproducible across engines.
  */
object ZOrder {

  /** Morton-interleave of the low `bits` bits of non-negative `x` and `y`
    * (x takes even positions, y odd). `bits <= 31` keeps the result in a
    * positive long.
    */
  def zKey(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    (0 until bits).flatMap { i =>
      Seq(
        when(x.bitwiseAND(lit(1L << i)) =!= 0L, lit(1L << (2 * i))).otherwise(0L),
        when(y.bitwiseAND(lit(1L << i)) =!= 0L, lit(1L << (2 * i + 1))).otherwise(0L))
    }.reduce(_ + _)
  }

  /** Cluster `df` by the z-order of (`xCol`, `yCol`) into `files` output
    * groups of near-equal row count: z-value rank via the range-shuffle
    * global row number, then `file_id = (rank-1)·files div n`. Returns the
    * input columns + `zval` + `file_id`. The per-file min/max of BOTH
    * dimensions (what a format's column statistics would store) is what
    * [[SparkEntry]]'s q106 report aggregates.
    */
  def layout(df: DataFrame, xCol: String, yCol: String, bits: Int,
      files: Int, tieBreak: String): DataFrame =
    fileAssign(df.withColumn("zval", zKey(col(xCol), col(yCol), bits)),
      struct(col("zval"), col(tieBreak)), files)

  /** The comparison baseline a layout decision needs: the same equal-count
    * file split under a plain linear `ORDER BY (orderCol, tieBreak)` — the
    * default clustering every table starts with. Same range-shuffle rank,
    * same `file_id` arithmetic, no z-value.
    */
  def linearLayout(df: DataFrame, orderCol: String, files: Int,
      tieBreak: String): DataFrame =
    fileAssign(df, struct(col(orderCol), col(tieBreak)), files)

  private def fileAssign(df: DataFrame, orderKey: Column, files: Int): DataFrame = {
    val ranked = Batching.globalRowNumber(
      df, orderKey, numPartitions = 8, out = "__rk")
    val n = ranked.agg(max(col("__rk")).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("file_id", expr(s"((__rk - 1) * $files) div __n"))
      .drop("__rk", "__n")
  }

  /** Zone-map scan estimate — the READ-side payoff the layout operators
    * exist for, measured instead of asserted: given a laid-out corpus
    * (any DataFrame with `file_id`) and a conjunctive rectangle predicate
    * `xlo <= x <= xhi AND ylo <= y <= yhi` (`bounds` is a 1-row frame with
    * those four columns — typically derived scalars, attached via the
    * suite's broadcast scalar-attach shape), compute what a format's
    * file-level min/max statistics would prune: a file is SKIPPED iff its
    * [min, max] envelope is disjoint from the predicate in either
    * dimension — exactly the decision Delta/Iceberg data skipping makes
    * from the manifest, no row data consulted.
    *
    * Returns ONE row: (n_files, n_skipped, rows_scanned, rows_matched).
    * `rows_scanned` is the I/O actually paid (rows in surviving files);
    * `rows_matched` the true predicate hits — layout-invariant, so two
    * layouts' reports differ only in the skip columns, making the report
    * an A/B harness for layout choices (q134 runs linear vs z-order).
    * Cost: one groupBy(file_id) aggregate — file-count-sized output —
    * plus a file-count-sized final fold. Nothing leaves the executors
    * until the file-stat rollup, which IS the manifest at 100 TB.
    */
  def skipEstimate(laid: DataFrame, xCol: String, yCol: String,
      bounds: DataFrame): DataFrame = {
    val perFile = laid.crossJoin(broadcast(bounds))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col(xCol)).as("x_lo"), max(col(xCol)).as("x_hi"),
        min(col(yCol)).as("y_lo"), max(col(yCol)).as("y_hi"),
        sum(when(col(xCol).between(col("xlo"), col("xhi")) &&
          col(yCol).between(col("ylo"), col("yhi")), 1L).otherwise(0L))
          .as("n_match"),
        first(col("xlo")).as("xlo"), first(col("xhi")).as("xhi"),
        first(col("ylo")).as("ylo"), first(col("yhi")).as("yhi"))
      .withColumn("skip",
        col("x_hi") < col("xlo") || col("x_lo") > col("xhi") ||
          col("y_hi") < col("ylo") || col("y_lo") > col("yhi"))
    perFile.agg(
      count(lit(1)).as("n_files"),
      sum(when(col("skip"), 1L).otherwise(0L)).as("n_skipped"),
      sum(when(!col("skip"), col("n")).otherwise(0L)).as("rows_scanned"),
      sum(col("n_match")).as("rows_matched"))
  }
}
