package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase query — the sparse-retrieval
  * structure under every lexical search deployment (the reference's
  * retrieval is dense-only — `QA_using_pinecone.py:31-50`; a production
  * stack keeps a positional index next to the vector index for exact
  * phrase/keyword constraints, which embeddings cannot guarantee).
  *
  * Scale shape: [[postings]] is ONE scan + one `posexplode` — the relation
  * a deployment writes once, bucketed by `term`, so a phrase query never
  * touches the corpus again. [[phraseMatches]] evaluates a k-term phrase as
  * k−1 equi-joins on (doc, adjusted position); each join side is first
  * filtered to ONE term (`term = phrase(i)` — pushed to the postings scan,
  * so only the phrase's postings lists are ever read), and all sides share
  * the (doc_id, pos) join key, so one co-partitioning serves the whole
  * chain. Matches of "A B C" are rows where A sits at `pos`, B at `pos+1`,
  * C at `pos+2` — each side aligns by subtracting its offset, the classic
  * positional-intersection evaluation.
  */
object InvertedIndex {

  /** Positional postings (doc_id, pos, term), `pos` 1-based over
    * whitespace tokens. Write this bucketed by `term` at ingest; at query
    * time only the probed terms' buckets are read.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(graft.operators.TextAnalysis.tokensCol(col(textCol))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("term"))

  /** Start positions of exact `phrase` occurrences: (doc_id, pos) with
    * `pos` the 1-based position of the phrase's first token. Overlapping
    * occurrences are all reported (each start is its own row).
    */
  def phraseMatches(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseMatches: empty phrase")
    // each term's postings, re-keyed to the phrase START position: term i
    // at position p witnesses a start at p - i
    val aligned = phrase.zipWithIndex.map { case (term, i) =>
      postings.filter(col("term") === term)
        .select(col("doc_id"), (col("pos") - i).as("pos"))
    }
    // k-1 equi-joins on the shared (doc_id, pos) key — positional intersect
    aligned.reduce((a, b) => a.join(b, Seq("doc_id", "pos")))
  }
}
