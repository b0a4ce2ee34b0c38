package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 — the
  * MOSS algorithm): per document, hash every character k-gram and keep the
  * MINIMUM hash of every w-gram window; the distinct minima are the
  * document's fingerprints. The selection guarantee is what the rest of
  * the dedup wing lacks: any substring of length ≥ w + k − 1 shared
  * between two documents — at ANY offsets — contributes at least one
  * IDENTICAL fingerprint to both (the shared stretch contains a full
  * window of identical gram hashes, so both documents select its minimum),
  * while the fingerprint density is bounded by ~2/(w+1) of the gram
  * stream. MinHash (q25/q39) trades recall for density globally; span
  * dedup (q85) needs aligned gram positions; winnowing detects LOCAL
  * overlap position-independently with a provable floor.
  *
  * Hashes are [[HashFunctions.stableHash64]] (md5-derived) so the DuckDB
  * oracle replays fingerprint selection bit-for-bit. The per-document
  * window partitions by doc and spans w ROWS — the inherently-small-group
  * window class (like the q17/q24 per-document sectionizers), never a
  * corpus-scaled sort. Pair generation is fingerprint-bucketed with a
  * document-frequency cap (`maxDf`) so boilerplate fingerprints shared by
  * half the corpus never build a quadratic bucket — the same guard shape
  * as q193's template census.
  */
object Winnowing {

  /** Distinct winnowed fingerprints: (id, fp). Documents shorter than
    * k + w − 1 chars yield their single short-text gram's hash (the
    * [[Dedup.shinglesCol]] short-text contract carried through one
    * trivially-full window).
    *
    * The per-document window is bounded by document LENGTH, which is fine
    * for any sane corpus but lets one pathological "document" (a
    * concatenated dump that slipped past the length screens) funnel its
    * whole gram stream into a single task — so the stream is explicitly
    * truncated at `maxGramsPerDoc` (default 2²² grams ≈ 4 MB of text,
    * far above every real document; the quality wing screens length
    * upstream). Fingerprints past the cap are dropped for that document
    * only; detection within the first 4 MB is unaffected.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, maxGramsPerDoc: Long = 1L << 22): DataFrame = {
    require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
    val grams = docs.select(col(idCol).as("id"),
      posexplode(Dedup.shinglesCol(col(textCol), k)).as(Seq("pos", "g")))
      .filter(col("pos") < maxGramsPerDoc)
      .select(col("id"), col("pos"),
        HashFunctions.stableHash64(concat(lit("win:"), col("g"))).as("h"))
    val ws = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    grams.withColumn("fp", min(col("h")).over(ws))
      // full windows only, EXCEPT the short-doc case (fewer grams than w:
      // keep its final — maximal — window so no document fingerprints empty)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))
      .filter(col("pos") >= least(lit(w.toLong - 1), col("n") - 1))
      .select(col("id"), col("fp")).distinct()
  }

  /** Document pairs sharing ≥ `minShared` fingerprints, with hot
    * fingerprints (document frequency > `maxDf`) excluded before the
    * bucket join (the boilerplate guard — disclosed, like LSH banding's
    * replayable-heuristic contract). Output: (id_a < id_b, n_shared).
    */
  def overlapPairs(fps: DataFrame, minShared: Long, maxDf: Long): DataFrame = {
    val dfc = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
    val rare = fps.join(dfc.filter(col("__df") <= maxDf), Seq("fp"))
      .select(col("fp"), col("id"))
    rare.as("a").join(rare.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
