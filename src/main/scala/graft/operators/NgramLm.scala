package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-based bigram language-model scoring — the perplexity-style fluency
  * filter every LLM data pipeline runs (CCNet/Gopher-style quality gates),
  * made INTEGER-EXACT so a DuckDB oracle reproduces every score bit-for-bit:
  * instead of summing log-probs (transcendental, order-dependent), each
  * token's conditional probability is quantized to basis points with
  * integral division the moment it is computed, and documents aggregate
  * BIGINT sums — the bm25Micro policy applied to LM scoring. Monotone
  * enough for filtering: fluent text hits high-count bigrams (high bps),
  * gibberish falls to backoff/OOV (near-zero bps).
  *
  * Model: stupid backoff (Brants et al. 2007) with α = 0.4 —
  *   P(w2|w1) = c(w1,w2)/c(w1)              if the bigram was seen,
  *              0.4 · c(w2)/N               else if w2 was seen,
  *              0                           else (OOV),
  * all in basis points via integral div: `c2·10⁴ div c1`,
  * `c1(w2)·4000 div N`.
  *
  * Scale: the model is two count tables (bigram-vocab- and vocab-sized,
  * Heaps-sublinear in the corpus); scoring shuffles the eval token stream
  * keyed by bigram then by unigram — linear passes, no corpus² anywhere.
  * The adjacent-pair extraction is a per-document window (documents are
  * bounded; the corpus is not).
  */
object NgramLm {

  private def pairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      posexplode(regexp_extract_all(lower(col(textCol)), lit("\\w+"), lit(0)))
        .as(Seq("pos", "w")))
    toks
      .withColumn("w2",
        lead(col("w"), 1).over(Window.partitionBy(col("id")).orderBy(col("pos"))))
      .filter(col("w2").isNotNull)
      .select(col("id"), col("pos"), col("w").as("w1"), col("w2"))
  }

  /** Per-eval-document fluency scores against a bigram LM counted from
    * `train`: (id, n_pairs, n_hit, n_backoff, n_oov, sum_bps, mean_bps).
    * Documents with fewer than two tokens emit nothing.
    */
  def bigramScore(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val trainPairs = pairs(train, idCol, textCol)
    // unigram counts come from the full token stream (NOT the pair stream —
    // each doc's last token never appears as w1)
    val trainToks = train.select(col(idCol).as("id"),
      explode(regexp_extract_all(lower(col(textCol)), lit("\\w+"), lit(0))).as("w"))
    val c1 = trainToks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val nTot = trainToks.agg(count(lit(1)).as("n_tot"))
    val c2 = trainPairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val scored = pairs(eval, idCol, textCol)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1.select(col("w").as("w1"), col("c1").as("c1w1")), Seq("w1"), "left")
      .join(c1.select(col("w").as("w2"), col("c1").as("c1w2")), Seq("w2"), "left")
      .crossJoin(broadcast(nTot))
      .select(col("id"),
        when(col("c2").isNotNull, lit(1L)).otherwise(lit(0L)).as("hit"),
        when(col("c2").isNull && col("c1w2").isNotNull, lit(1L))
          .otherwise(lit(0L)).as("backoff"),
        when(col("c2").isNull && col("c1w2").isNull, lit(1L))
          .otherwise(lit(0L)).as("oov"),
        when(col("c2").isNotNull, expr("c2 * 10000 div c1w1"))
          .when(col("c1w2").isNotNull, expr("c1w2 * 4000 div n_tot"))
          .otherwise(lit(0L)).as("bps"))
    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("hit")).as("n_hit"),
        sum(col("backoff")).as("n_backoff"), sum(col("oov")).as("n_oov"),
        sum(col("bps")).as("sum_bps"))
      .select(col("id"), col("n_pairs"), col("n_hit"), col("n_backoff"),
        col("n_oov"), col("sum_bps"),
        expr("sum_bps div n_pairs").as("mean_bps"))
  }
}
