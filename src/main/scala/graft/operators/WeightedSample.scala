package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deterministic weighted without-replacement sampling — sequential
  * Poisson sampling (Ohlsson 1998): each row draws a hash-uniform
  * `u ∈ [0, 2⁴⁸)` and the k rows with the smallest `u / weight` win, so
  * inclusion probability is approximately proportional to weight (πps).
  * The training-data use: size-weighted corpus subsampling where every
  * engine (and the oracle) can replay the exact sample membership — no
  * RNG state, no seed drift.
  *
  * Determinism across engines: `u` is the salted 60-bit md5 hash reduced
  * mod 2⁴⁸ (exactly representable as a double), and the priority is ONE
  * IEEE double division — identical bit pattern on any IEEE-754 engine —
  * with the row id as total tie-break.
  *
  * Scale: the only shuffle is the per-stratum top-k election, and because
  * the rank filter sits directly on the `row_number` window Spark plans
  * it as WindowGroupLimit — each map task forwards at most k rows per
  * stratum, so a billion-row stratum costs k·partitions shuffled rows,
  * never the stratum (same pin as the W7 top-k family).
  */
object WeightedSample {

  /** u48 hash-uniform for a salted id column. */
  def u48(salt: String, idCol: Column): Column =
    pmod(HashFunctions.stableHash64(concat(lit(s"$salt:"), idCol.cast("string"))),
      lit(281474976710656L))

  /** k rows per stratum with smallest u48/weight: (stratum, rank, id,
    * weight, pri4). Weights must be positive.
    */
  def perStratum(df: DataFrame, stratumCol: String, idCol: String,
      weightCol: String, k: Int, salt: String = "wps"): DataFrame = {
    val pri = u48(salt, col(idCol)).cast("double") / col(weightCol)
    df.select(col(stratumCol).as("stratum"), col(idCol).as("id"),
        col(weightCol).cast("long").as("weight"), pri.as("__pri"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(col("__pri"), col("id"))))
      .filter(col("rank") <= k)
      .select(col("stratum"), col("rank").cast("long").as("rank"), col("id"),
        col("weight"), floor(col("__pri") * 10000).cast("long").as("pri4"))
  }
}
