package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Range-partition planning — boundaries from a deterministic sample, then
  * an assignment balance report. This is the write-side answer to "how do I
  * split a 100 TB table into N value-contiguous shards of near-equal size"
  * (time-range table layouts, sorted-bucket handoff to trainers, range
  * shuffles whose reducer sizes must be predictable): Spark's own
  * `repartitionByRange` samples non-deterministically per run, so its
  * shard contents are not reproducible run-to-run — this planner derives
  * the SAME boundaries every run (hash-sampled rows, rank-based cut
  * points), making layouts auditable and the whole decision replayable by
  * a relational oracle.
  *
  * Scale shape: the sample is a scan-side hash filter (no shuffle, same
  * stable-md5 the split/sharding family uses); ranking the sample is the
  * range-shuffle global row number over sample-sized data; boundaries are
  * a (parts−1)-row broadcast join against the ranked sample. Assignment
  * back on the full corpus is a pure codegen'd scan expression over the
  * collected (parts−1)-value boundary literal — a k-row driver scalar, the
  * suite's accepted collect class — so the corpus pays ZERO extra
  * shuffles to be assigned; the report is one groupBy over parts buckets.
  */
object RangePlanner {

  /** Cut points for `parts` value-contiguous buckets of `df`, computed
    * from a deterministic 1/`sampleMod` sample: rows whose stable hash of
    * `keyCol` lands on 0 are ranked by (`valCol`, `keyCol`) and the sample
    * values at ranks `max(1, (i·m) div parts)`, i = 1..parts−1, become
    * boundaries. Returns (boundary_idx, boundary), ascending. A sample
    * smaller than `parts−1` repeats cut values — assignment stays
    * well-defined (buckets just come out empty), identically on both
    * engines.
    */
  def boundaries(df: DataFrame, valCol: String, keyCol: String,
      parts: Int, sampleMod: Int): DataFrame = {
    require(parts >= 2, "parts must be at least 2")
    require(sampleMod >= 1, "sampleMod must be at least 1")
    val samp = df
      .filter(pmod(HashFunctions.stableHash64(
        concat(lit("rp:"), col(keyCol).cast("string"))),
        lit(sampleMod.toLong)) === 0L)
      .select(col(valCol).as("__v"), col(keyCol).as("__k"))
    val ranked = Batching.globalRowNumber(
      samp, struct(col("__v"), col("__k")), numPartitions = 8, out = "__rn")
    val spine = ranked.agg(max(col("__rn")).as("__m"))
      .select(explode(sequence(lit(1), lit(parts - 1))).as("__i"), col("__m"))
    broadcast(spine)
      .join(ranked,
        col("__rn") === greatest(expr(s"(__i * __m) div $parts"), lit(1L)))
      .select(col("__i").cast("long").as("boundary_idx"),
        col("__v").as("boundary"))
  }

  /** Bucket id for `v` under sorted cut points: the count of boundaries
    * ≤ v — a scan-side array expression, no join, no shuffle. */
  def assign(v: Column, bnds: Seq[Long]): Column =
    size(filter(lit(bnds.sorted.toArray), b => v >= b)).cast("long")

  /** The planner's feedback loop: assign every row of `df` and report per
    * bucket (n_rows, share in basis points of the total, value min/max) —
    * the skew a range shuffle with these boundaries would actually see.
    * One groupBy over `parts` buckets plus a bucket-count-sized total
    * fold.
    */
  def balanceReport(df: DataFrame, valCol: String, bnds: Seq[Long]): DataFrame = {
    val perBucket = df
      .withColumn("bucket", assign(col(valCol), bnds))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valCol)).as("v_lo"), max(col(valCol)).as("v_hi"))
    val total = perBucket.agg(sum(col("n_rows")).as("__t"))
    perBucket.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_rows"),
        expr("n_rows * 10000 div __t").as("share_bp"),
        col("v_lo"), col("v_hi"))
  }
}
