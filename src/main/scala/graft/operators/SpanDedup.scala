package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level EXACT substring deduplication — the "repeated 50-token span"
  * profile of Lee et al., *Deduplicating Training Data Makes Language
  * Models Better* (arXiv:2107.06499), reduced to its distributable core:
  * every k-token window that occurs ≥ `minCount` times anywhere in the
  * corpus marks its covered token positions as duplicated, and per
  * document the marked windows are merged into maximal runs. Document- and
  * paragraph-level dedup (q22, q39, q68) miss exactly this — boilerplate
  * spans embedded inside otherwise-unique documents.
  *
  * Scale shape: tokens are windowed AT THE SCAN into (doc, pos, gram-hash)
  * triples — the corpus-sized shuffle that decides duplication carries an
  * 8-byte xxhash64 per window, never gram text (at k=50 the text would be
  * ~300 bytes/row; the hash is 97% shuffle reduction). Duplication is
  * decided IN PLACE by a count window over the hash (the ParagraphDedup
  * move: a window, not a groupBy + join-back, so the expensive hashing
  * pass runs exactly once and there is no second gram-stream shuffle);
  * the run merge is a per-document window over surviving positions whose
  * state is one lag — with fixed-length windows sorted by start, interval
  * union is closed-form: a window contributes min(k, start − prev_start)
  * covered tokens and opens a run iff the gap > k. No self-join, no
  * corpus² — cost is O(tokens) rows through two hash shuffles (gh, doc).
  * The only other corpus touch is a tokenize-and-count scan for each
  * document's n_tok (needed to report zero-profile docs) — cheap relative
  * to the per-position hashing, and far cheaper at 100 TB than
  * materializing the O(tokens) gram stream to avoid it.
  *
  * Hashing trades a 2^-64 per-pair collision chance for the 40× shuffle
  * compression — the standard large-corpus choice (a collision merely
  * marks one extra span duplicated). Pass the gram text itself as the key
  * only if exactness matters more than the shuffle (swap `xxhash64(g)` for
  * `g` below).
  */
object SpanDedup {

  /** (doc, pos, gh) for every k-token window; `pos` is 1-based. */
  def gramPositions(
      docs: DataFrame, docCol: String, tokens: Column, k: Int): DataFrame = {
    val w = tokens
    docs
      .select(col(docCol), w.as("w"))
      .filter(size(col("w")) >= k)
      .select(col(docCol),
        posexplode(transform(
          sequence(lit(1), size(col("w")) - (k - 1)),
          i => xxhash64(concat_ws(" ", slice(col("w"), i, lit(k)))))))
      .select(col(docCol), (col("pos") + 1).as("pos"), col("col").as("gh"))
  }

  /** Per-document duplication profile: `n_tok`, `n_dup_grams` (windows
    * whose content repeats ≥ `minCount` times corpus-wide), `n_runs`
    * (maximal merged spans), `n_dup_tokens` (tokens covered by any
    * duplicated window) and `dup_frac4` (covered fraction, floor-quantized
    * to 4 decimals). Documents with no duplicated span (or fewer than k
    * tokens) appear with zeros — the profile is a total function of the
    * corpus, so a downstream `filter(dup_frac4 < θ)` is a complete pass.
    */
  def spanProfile(
      docs: DataFrame, docCol: String, tokens: Column,
      k: Int = 5, minCount: Int = 2): DataFrame = {
    val toks = docs.select(col(docCol), tokens.as("w"))
    val grams = gramPositions(docs, docCol, tokens, k)
    // duplication decided in place: ONE shuffle of the gram stream on the
    // 8-byte hash, no join-back — so the scan-side hashing runs once
    val dpos = grams
      .withColumn("n_occ",
        count(lit(1)).over(Window.partitionBy(col("gh"))))
      .filter(col("n_occ") >= minCount)
      .select(col(docCol), col("pos"))
    val byDoc = Window.partitionBy(col(docCol)).orderBy(col("pos"))
    val marked = dpos
      .withColumn("lg", lag(col("pos"), 1).over(byDoc))
      .select(col(docCol),
        when(col("lg").isNull, k)
          .otherwise(least(lit(k), col("pos") - col("lg"))).as("contrib"),
        // a window at gap == k touches the previous one end-to-start (the
        // covered positions are contiguous), so a NEW run needs gap > k
        when(col("lg").isNull || col("pos") - col("lg") > k, 1)
          .otherwise(0).as("new_run"))
    val perDoc = marked.groupBy(col(docCol))
      .agg(count(lit(1)).as("n_dup_grams"),
        sum(col("new_run")).as("n_runs"),
        sum(col("contrib")).as("n_dup_tokens"))
    toks.select(col(docCol), size(col("w")).cast("long").as("n_tok"))
      .join(perDoc, Seq(docCol), "left")
      .select(col(docCol), col("n_tok"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        (floor(coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
          greatest(col("n_tok"), lit(1L)) * 10000.0) / 10000.0).as("dup_frac4"))
  }

  /** The APPLY step [[spanProfile]] only reports: rewrite the corpus with
    * duplicated spans REMOVED, keeping the corpus-wide FIRST occurrence of
    * each repeated k-gram (Lee et al. §4's "keep one copy" semantics,
    * first-by-(doc, pos) as the deterministic survivor order). Every later
    * occurrence marks its k covered positions for deletion; marked
    * positions merge into maximal runs per document and the surviving
    * tokens reassemble into `text_clean` (whitespace-joined — the token
    * stream, not the raw text, is the unit of this operator, exactly as in
    * the paper's suffix-array cut). A first occurrence can still lose
    * tokens when ANOTHER gram's repeat overlaps it — inherent to span-cut
    * semantics and matched by the relational oracle.
    *
    * Scale shape: the duplication decision is the same single
    * (doc, pos, 8-byte-hash) shuffle as [[spanProfile]] — one window pass
    * over `gh` yields both the occurrence count and the corpus-wide rank,
    * no join-back, no second gram scan. Dropped windows collapse to runs
    * BEFORE position explosion, so the covered-position stream is
    * O(dropped tokens) exactly (never n_windows × k); the rebuild is one
    * anti-join plus one per-doc sort-aggregate, both partitioned by doc.
    *
    * Output: (docCol, n_tok, n_kept, n_dropped, text_clean) for EVERY
    * input document — short docs (< k tokens) pass through whole, so
    * `n_kept + n_dropped == n_tok` is a total invariant (spec-checked).
    */
  def applySpanDedup(
      docs: DataFrame, docCol: String, tokens: Column,
      k: Int = 5, minCount: Int = 2): DataFrame = {
    val toks = docs.select(col(docCol), tokens.as("w"))
    val grams = gramPositions(docs, docCol, tokens, k)
    val byGram = Window.partitionBy(col("gh"))
    val byGramOrd = byGram.orderBy(col(docCol), col("pos"))
    // both window functions share the one gh-hash shuffle
    val drops = grams
      .withColumn("n_occ", count(lit(1)).over(byGram))
      .withColumn("rn", row_number().over(byGramOrd))
      .filter(col("n_occ") >= minCount && col("rn") >= 2)
      .select(col(docCol), col("pos"))
    rebuildFromDrops(toks, drops, docCol, k)
  }

  /** Runs → covered positions → anti-join rebuild, shared by the
    * full-corpus and incremental apply paths.
    */
  private def rebuildFromDrops(
      toks: DataFrame, drops: DataFrame, docCol: String, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(docCol)).orderBy(col("pos"))
    // windows at gap <= k overlap-or-touch: same run (positions contiguous)
    val runs = drops
      .withColumn("new_run",
        when(lag(col("pos"), 1).over(byDoc).isNull ||
          col("pos") - lag(col("pos"), 1).over(byDoc) > k, 1).otherwise(0))
      .withColumn("run_id", sum(col("new_run")).over(byDoc))
      .groupBy(col(docCol), col("run_id"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
    val covered = runs.select(col(docCol).as("__cov_doc"),
      explode(sequence(col("s"), col("e"))).as("p"))
    val toki = toks
      .select(col(docCol), posexplode(col("w")))
      .select(col(docCol), (col("pos") + 1).as("idx"), col("col").as("tk"))
    val kept = toki.join(covered,
      col(docCol) === col("__cov_doc") && col("idx") === col("p"), "left_anti")
    val keptByDoc = kept.groupBy(col(docCol))
      .agg(count(lit(1)).as("n_kept_raw"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("tk")))),
          s => s.getField("tk")), " ").as("clean_raw"))
    toks.select(col(docCol), size(col("w")).cast("long").as("n_tok"))
      .join(keptByDoc, Seq(docCol), "left")
      .select(col(docCol), col("n_tok"),
        coalesce(col("n_kept_raw"), lit(0L)).as("n_kept"),
        (col("n_tok") - coalesce(col("n_kept_raw"), lit(0L))).as("n_dropped"),
        coalesce(col("clean_raw"), lit("")).as("text_clean"))
  }

  /** The persisted gram index incremental span-dedup probes: one row per
    * distinct k-gram hash with its corpus-wide occurrence count. Written
    * once at ingest (parquet, bucketed by `gh` at scale so the nightly
    * probe join co-locates); the nightly delta then pays its own gram
    * stream plus one probe of this table — never a re-scan of the base
    * corpus (q78's incremental shape, applied to spans).
    */
  def spanIndex(
      docs: DataFrame, docCol: String, tokens: Column, k: Int = 5): DataFrame =
    gramPositions(docs, docCol, tokens, k)
      .groupBy(col("gh")).agg(count(lit(1)).as("n_occ"))

  /** [[applySpanDedup]] for a DELTA batch against a stored [[spanIndex]] of
    * the base corpus. A delta window drops iff the combined corpus has seen
    * its gram before it: any base occurrence (base ids sort before delta
    * ids — the append-only ingest order this operator assumes, exactly
    * q78's), or an earlier delta occurrence, provided the combined count
    * reaches `minCount`. PARITY-exact with running [[applySpanDedup]] on
    * base ∪ delta and keeping the delta rows (spec-checked): the combined
    * rank of a delta occurrence is `n_base + rn_delta`, so `rn >= 2` is
    * precisely `n_base >= 1 ∨ rn_delta >= 2`.
    *
    * Cost: the delta's own (doc, pos, 8-byte-hash) stream through one gh
    * shuffle + one equi-join probe of the index — O(delta grams + index
    * probe), never O(base corpus tokens).
    */
  def applySpanDedupIncremental(
      index: DataFrame, delta: DataFrame, docCol: String, tokens: Column,
      k: Int = 5, minCount: Int = 2): DataFrame = {
    val toks = delta.select(col(docCol), tokens.as("w"))
    val grams = gramPositions(delta, docCol, tokens, k)
    val byGram = Window.partitionBy(col("gh"))
    val byGramOrd = byGram.orderBy(col(docCol), col("pos"))
    val drops = grams
      .withColumn("n_delta", count(lit(1)).over(byGram))
      .withColumn("rn_delta", row_number().over(byGramOrd))
      .join(index.select(col("gh"), col("n_occ").as("n_base")), Seq("gh"), "left")
      .filter(coalesce(col("n_base"), lit(0L)) + col("n_delta") >= minCount &&
        (coalesce(col("n_base"), lit(0L)) >= 1L || col("rn_delta") >= 2))
      .select(col(docCol), col("pos"))
    rebuildFromDrops(toks, drops, docCol, k)
  }
}
