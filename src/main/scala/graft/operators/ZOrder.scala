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
      files: Int, tieBreak: String): DataFrame = {
    val withZ = df.withColumn("zval", zKey(col(xCol), col(yCol), bits))
    val ranked = Batching.globalRowNumber(
      withZ, struct(col("zval"), col(tieBreak)), numPartitions = 8, out = "__rk")
    val n = ranked.agg(max(col("__rk")).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("file_id", expr(s"((__rk - 1) * $files) div __n"))
      .drop("__rk", "__n")
  }
}
