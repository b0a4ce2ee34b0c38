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

  /** The q129 diagnostic as a reusable probe: xxhash64 fingerprints of the
    * ≤ `topK` heaviest keys of `df` (any key type) whose row count exceeds
    * `hotKeyThreshold`, heaviest first. Per-key counts partial-aggregate
    * map-side (the shuffle carries one row per distinct key, never the
    * corpus) and [[TopKAgg]] bounds the final collect to k pairs — a k-row
    * driver scalar, same as q129. Hashing keeps the probe type-agnostic;
    * a 2^-64 collision can only route a cold key through the salted branch
    * of [[autoSaltedJoin]], never change a result (both branches are
    * correct joins).
    */
  def hotKeyHashes(
      df: DataFrame, key: String, hotKeyThreshold: Long,
      topK: Int = 32): Seq[Long] = {
    val topk = org.apache.spark.sql.functions.udaf(new TopKAgg(topK),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
    df.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .agg(topk(col("__c"), xxhash64(col(key))).as("__top"))
      .select(explode(col("__top")).as("p"))
      .select(col("p._1").as("c"), col("p._2").as("kh"))
      .filter(col("c") > hotKeyThreshold)
      .collect().map(_.getLong(1)).toSeq
  }

  /** [[saltedJoin]] wired to the diagnostic (the round-7 gap: report and
    * remedy were disconnected): probe the big side with [[hotKeyHashes]],
    * then join in two branches — rows whose key is FLAGGED go through the
    * salted join (small side replicated `saltFactor`×, but ONLY its hot
    * rows — the hot list is a ≤ topK literal IN-list over xxhash64(key),
    * codegen'd scan-side on both branches, so cold keys never replicate
    * and the cold branch stays the plain one-shuffle join), unioned with
    * the plain join of the rest. Row-identical to
    * `big.join(small, Seq(key))`: whichever branch a null-keyed row lands
    * in (xxhash64 hashes a null input to its seed, so the predicate stays
    * defined), the inner join's null-rejecting equality drops it — exactly
    * as the plain join does.
    *
    * At 100 TB: the diagnostic costs one map-combined key-count shuffle
    * (distinct-key-sized) — run it once and reuse the list across a
    * pipeline's joins when the key distribution is stable. AQE's skew join
    * handles moderate runtime skew; this is for the pathological keys
    * (hot_at_32 in q129's report) where even one AQE-split reducer drowns
    * — including the low-cardinality-key join (20 sources → 20 reducers,
    * 31 idle cores) AQE cannot split without salting.
    */
  def autoSaltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, saltFactor: Int,
      hotKeyThreshold: Long, topK: Int = 32): DataFrame = {
    val hot = hotKeyHashes(big, key, hotKeyThreshold, topK)
    if (hot.isEmpty) big.join(small, Seq(key))
    else {
      val isHot = xxhash64(col(key)).isin(hot: _*)
      val salted = saltedJoin(
        big.filter(isHot), small.filter(isHot), key, saltSource, saltFactor)
      salted.unionByName(big.filter(!isHot).join(small.filter(!isHot), Seq(key)))
    }
  }
}
