package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Length-bucketed training batches — the padding-efficiency step between
  * tokenization and the training loop: sequences are grouped into
  * power-of-two length buckets and batched WITHIN a bucket, so every batch
  * pads to its bucket's cap instead of the corpus max (the difference
  * between ~50% and ~95% non-pad tokens on real length distributions).
  * Static power-of-two caps (not per-batch max) are deliberate: fixed
  * tensor shapes are what compiled training stacks (XLA-style) want, and
  * they make the layout reproducible under any partitioning.
  *
  * Scale shape: the cap is a scan-side CASE ladder; the only shuffle is
  * [[Batching.globalRowNumber]]'s single range exchange on (cap, id) —
  * no window over the corpus, no single-partition stage. Per-bucket rank
  * is recovered from the global rank by subtracting the bucket's minimum
  * global rank (a ladder-sized aggregate, broadcast back). Batch identity
  * is then pure arithmetic: `(rank_in_bucket - 1) / batchSize`.
  */
object PaddedBatching {

  /** Power-of-two cap ladder: 16 .. 1024. Sequences above the top cap
    * clamp into it (a real pipeline truncates or splits them upstream —
    * [[SequencePacker]] / sliding windows own that).
    */
  val CapLadder: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024)

  /** Scan-side bucket cap for a token count: smallest ladder cap >= n. */
  def bucketCap(tc: Column): Column =
    CapLadder.init.reverse.foldLeft(lit(CapLadder.last): Column) {
      case (acc, cap) => when(tc <= cap, cap).otherwise(acc)
    }

  /** Assigns (cap, rank_in_bucket, batch_id) to every row. `tcCol` is the
    * sequence's token count; `idCol` breaks ties so the layout is total.
    */
  def batches(
      df: DataFrame, idCol: String, tcCol: String, batchSize: Int,
      numPartitions: Int): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    // output columns must not silently clobber caller columns
    Seq("cap", "rank_in_bucket", "batch_id").foreach { c =>
      require(!df.columns.contains(c), s"input already carries a `$c` column")
    }
    val capped = df.withColumn("cap", bucketCap(col(tcCol)))
    // one range shuffle for the whole layout: global rank on (cap, id) …
    val ranked = Batching.globalRowNumber(
      capped, struct(col("cap"), col(idCol)), numPartitions, out = "__grn")
    // … re-based to a per-bucket rank via the ladder-sized offset relation
    val base = ranked.groupBy(col("cap")).agg(min(col("__grn")).as("__base"))
    ranked.join(broadcast(base), Seq("cap"))
      .withColumn("rank_in_bucket", (col("__grn") - col("__base") + 1).cast("long"))
      .withColumn("batch_id", ((col("rank_in_bucket") - 1) / batchSize).cast("long"))
      .drop("__grn", "__base")
  }
}
