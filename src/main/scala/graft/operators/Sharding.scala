package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Output-shard assignment for corpus writes — the layout step between a
  * curated corpus and its training-ready files.
  *
  * Two complementary policies:
  *
  *  - [[tokenBudgetShards]]: contiguous shards of ~equal TOKEN budget (a
  *    training job reads shards, not documents — equal-token shards keep
  *    data-parallel readers in step). Built on
  *    [[Batching.globalRunningSum]]: one range shuffle, a ladder of
  *    per-partition offsets, no window — the 100 TB shape for any
  *    cumulative layout decision.
  *  - [[rendezvousCol]]: rendezvous (highest-random-weight) hashing — the
  *    shard of a key is `argmax_s hash(key, s)`. Stateless, scan-side,
  *    and MINIMALLY DISRUPTIVE under resharding: growing K→K+1 moves only
  *    the keys whose new shard wins the argmax, ~1/(K+1) of the corpus
  *    (spec-pinned), vs `hash % K` which moves ~K/(K+1). This is how an
  *    incremental ingest keeps shard assignments stable across capacity
  *    changes without a lookup table.
  */
object Sharding {

  /** Assigns `shard_id` so each shard holds ~`tokenBudget` tokens of
    * consecutive (by `ord`) documents: a document starts a new shard when
    * the running total BEFORE it crosses the next budget boundary.
    * Deterministic for any total `ord` order; documents straddling a
    * boundary land in the shard they started in (shard size varies by at
    * most one document — inherent to contiguous packing).
    */
  def tokenBudgetShards(
      df: DataFrame, ord: Column, tcCol: String, tokenBudget: Long,
      numPartitions: Int): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(!df.columns.contains("shard_id"),
      "input already carries a `shard_id` column")
    // integer `div`, not `/`: Column./ is DOUBLE division and a 100 TB
    // corpus's cumulative token count exceeds 2^53
    Batching.globalRunningSum(df, Seq(ord), tcCol, numPartitions,
        outPos = "__pos", outCum = "__cum")
      .withColumn("shard_id", expr(s"(__cum - $tcCol) div $tokenBudget"))
      .drop("__pos", "__cum")
  }

  /** Rendezvous shard of `key` among `k` shards: argmax over shard ids of
    * the 64-bit [[HashFunctions.stableHash64]] of "key:shard" (ties by
    * hash value are broken toward the LOWER shard id; with a 64-bit hash
    * they do not occur in practice). Pure scan-side expression.
    */
  def rendezvousCol(key: Column, k: Int): Column = {
    require(k > 0, "k must be positive")
    val scored = transform(sequence(lit(0), lit(k - 1)), s =>
      struct(
        HashFunctions.stableHash64(concat(key.cast("string"), lit(":"), s)).as("h"),
        (-s).as("neg_sid")))
    (-array_max(scored).getField("neg_sid")).cast("long")
  }
}
