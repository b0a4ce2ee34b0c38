package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4.3 / the 100 TB bullet list): when a join
  * key is hot, one reducer drowns. Salting splits each hot key into
  * `saltFactor` sub-keys: the big side salts DETERMINISTICALLY from a
  * unique column (no rand() — replays and retries stay stable); the small
  * side replicates each row `saltFactor` times. Result is row-identical to
  * the unsalted join. AQE's skew-join handles moderate skew at runtime;
  * explicit salting is for the pathological keys you know about.
  */
object Salting {

  /** Equi-join `big ⋈ small` on `key`, salted. `saltSource` must be a
    * unique-ish column of `big` (ids, offsets).
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(saltSource, lit(saltFactor)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial agg on (key, salt), final on
    * key. `aggs` maps output column -> (partialAgg(inputCol), finalAgg).
    * Counts/sums compose; see q43 for the query form.
    */
  def saltedCountSum(
      df: DataFrame, key: String, valueCol: String,
      saltSource: Column, saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(saltSource, lit(saltFactor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__pc"), sum(col(valueCol)).as("__ps"))
      .groupBy(col(key))
      .agg(sum(col("__pc")).as("n"), sum(col("__ps")).as("total"))
}
