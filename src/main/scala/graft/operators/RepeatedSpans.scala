package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Repeated-span census — the memorization audit run before training (the
  * Lee et al. 2022 "Deduplicating Training Data" concern, measured): for a
  * ladder of span lengths L, how many token windows of length L occur more
  * than once ACROSS the corpus, and how hot is the hottest one? Rising
  * repeat mass at large L is the signature of boilerplate/template
  * contamination that per-document dedup misses (two docs 5% similar can
  * still share a 64-token license block — exactly what a model memorizes).
  *
  * Differs from [[SpanDedup]] (which REMOVES covered spans at one fixed
  * k): this is the read-only diagnostic across a LENGTH LADDER, the
  * instrument that picks SpanDedup's k.
  *
  * Scale (the SpanDedup discipline): window text is hashed AT THE SCAN
  * (md5 → 60-bit int) and only (L, hash) pairs shuffle — never token
  * text; the aggregate is histogram-shaped (distinct spans, Heaps-
  * sublinear). Window extraction is an array slice per position — the
  * token stream explodes |lengths|×, each row carrying one long.
  */
object RepeatedSpans {

  /** One row per length L: (span_len, n_repeat_spans, n_repeat_positions,
    * max_occ, top_h). A "repeat span" is a distinct window value with
    * ≥ 2 occurrences; `n_repeat_positions` counts all its occurrences;
    * `top_h` is the lowest hash among the hottest spans (deterministic
    * argmax). Lengths with no repeats report zeros and a NULL top_h.
    */
  def census(docs: DataFrame, idCol: String, textCol: String,
      lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ >= 1))
    // spread the window-hash pass (one md5 per window × |lengths| — the
    // suite's heaviest per-row loop after the PDF codecs): a one-split
    // corpus otherwise runs it single-threaded (q90 lesson, adaptive N)
    val toks = Tuning.spread(
      docs.select(col(idCol).as("id"),
        regexp_extract_all(lower(col(textCol)), lit("\\w+"), lit(0)).as("tk")),
      col("id"))
    // sequence(1, stop) DESCENDS when stop < 1 — short docs must yield an
    // empty window list, not [1, 0]
    val starts = when(size(col("tk")) >= col("span_len"),
      sequence(lit(1), size(col("tk")) - col("span_len") + 1))
      .otherwise(array().cast("array<int>"))
    val spans = toks
      .select(col("id"), col("tk"),
        explode(lit(lengths.toArray)).as("span_len"))
      .select(col("span_len"),
        explode(transform(starts,
          p => HashFunctions.stableHash64(
            concat_ws(" ", slice(col("tk"), p, col("span_len")))))).as("h"))
    val rep = spans.groupBy(col("span_len"), col("h"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
    val perL = rep.groupBy(col("span_len"))
      .agg(count(lit(1)).as("n_repeat_spans"),
        sum(col("n_occ")).as("n_repeat_positions"),
        max(col("n_occ")).as("max_occ"))
    val tops = rep.join(perL.select(col("span_len"), col("max_occ")),
        Seq("span_len"))
      .filter(col("n_occ") === col("max_occ"))
      .groupBy(col("span_len")).agg(min(col("h")).as("top_h"))
    val s = docs.sparkSession
    import s.implicits._
    lengths.map(_.toLong).toDF("span_len")
      .join(perL.select(col("span_len").cast("long").as("span_len"),
        col("n_repeat_spans"), col("n_repeat_positions"), col("max_occ")),
        Seq("span_len"), "left")
      .join(tops.select(col("span_len").cast("long").as("span_len"),
        col("top_h")), Seq("span_len"), "left")
      .select(col("span_len"),
        coalesce(col("n_repeat_spans"), lit(0L)).as("n_repeat_spans"),
        coalesce(col("n_repeat_positions"), lit(0L)).as("n_repeat_positions"),
        coalesce(col("max_occ"), lit(0L)).as("max_occ"),
        col("top_h"))
  }
}
