package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical and hybrid retrieval over a document table — the
  * sparse-ranking complement of [[Retriever]]'s dense cosine path (the
  * reference retrieves by embedding only — `QA_using_pinecone.py:31-50`;
  * BM25 + reciprocal-rank fusion is what a production RAG stack layers on
  * top, so it ships as library API).
  *
  * Scale shape: the query's term list is a LITERAL, so per-term tf and the
  * document length are scan-side array ops — no explode, no (doc, term)
  * shuffle anywhere; the corpus-global stats (N, avgdl, per-term df) are
  * one single-row aggregate cross-joined back as a broadcast. Two corpus
  * scans total (idf is corpus-global — inherent), then a pure scan-side
  * score; a caller's top-k plans as TakeOrderedAndProject.
  *
  * Cross-engine float policy (the q66/q67 oracles reproduce scores
  * bit-for-bit): the only transcendental (ln) is floor-quantized at 1e-4
  * the moment it is computed, and every constant is a plain literal (2.2,
  * not k1+1.0 — Scala's `1.2+1.0` and DuckDB's DECIMAL `1.2+1.0` round to
  * DIFFERENT doubles, while the literal `2.2` parses identically). k1/b
  * are therefore fixed at the standard 1.2/0.75 rather than parameterized.
  */
object LexicalRetriever {

  /** BM25 (k1=1.2, b=0.75) scores for `terms` over `docs`; documents
    * matching no term are excluded. Output: (`idCol`, score).
    */
  def bm25Scores(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String]): DataFrame = {
    val base = docs
      .select(col(idCol), graft.operators.TextAnalysis.tokensCol(col(textCol)).as("tk"))
      .select(col(idCol) +: size(col("tk")).cast("double").as("dl") +:
        terms.map(tm => size(filter(col("tk"), x => x === tm)).cast("double").as(s"tf_$tm")): _*)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl") +:
        terms.map(tm => sum((col(s"tf_$tm") > 0).cast("long")).cast("double").as(s"df_$tm")): _*)
    base.crossJoin(broadcast(stats))
      .withColumn("score", terms.map { tm =>
        val tf = col(s"tf_$tm")
        val df = col(s"df_$tm")
        val idf = floor(log(((col("n_docs") - df + 0.5) / (df + 0.5)) + 1.0) * 10000.0) / 10000.0
        idf * (tf * 2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      }.reduce(_ + _))
      .filter(terms.map(tm => col(s"tf_$tm")).reduce(_ + _) > 0)
      .select(col(idCol), col("score"))
  }

  /** BM25 with per-term contributions floor-quantized to integer
    * MICRO-units (1e-6) before the sum — the dynamic-term variant: when
    * the term list is data-derived (RM3 expansion, q197), the score must
    * be an order-independent sum, because a relational oracle aggregates
    * per-(doc, term) rows in whatever order the scan yields while
    * [[bm25Scores]]' fixed `reduce` chain adds doubles in term order.
    * Integer micro-contributions make both exact. Output:
    * (`idCol`, score_u: BIGINT); no-term-matching docs are excluded.
    */
  def bm25MicroScores(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String]): DataFrame = {
    // POSITIONAL tf/df column names, never the term text: data-derived
    // terms can contain '.', backticks, or duplicates, any of which would
    // make `col("tf_$term")` unresolvable or ambiguous (a '.' parses as a
    // struct-field access). Duplicate terms are dropped — scoring a term
    // twice would double-count its contribution.
    val ts = terms.distinct
    val idx = ts.indices
    val base = docs
      .select(col(idCol), graft.operators.TextAnalysis.tokensCol(col(textCol)).as("tk"))
      .select(col(idCol) +: size(col("tk")).cast("double").as("dl") +:
        idx.map(i => size(filter(col("tk"), x => x === ts(i))).cast("double").as(s"tf_$i")): _*)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl") +:
        idx.map(i => sum((col(s"tf_$i") > 0).cast("long")).cast("double").as(s"df_$i")): _*)
    base.crossJoin(broadcast(stats))
      .withColumn("score_u", idx.map { i =>
        val tf = col(s"tf_$i")
        val df = col(s"df_$i")
        val idf = floor(log(((col("n_docs") - df + 0.5) / (df + 0.5)) + 1.0) * 10000.0) / 10000.0
        floor(idf * (tf * 2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
          * 1000000.0).cast("long")
      }.reduce(_ + _))
      .filter(idx.map(i => col(s"tf_$i")).reduce(_ + _) > 0)
      .select(col(idCol), col("score_u"))
  }

  /** Reciprocal-rank fusion (Cormack et al.): two (id, rank) lists full-
    * outer-joined, each contributing 1/(rank + `k`) and 0 where absent,
    * fused score floor-quantized at 1e-6. Rank the k-row TOP-N lists of
    * each ranker first (TakeOrderedAndProject + a window over k rows) —
    * never rank the corpus. Output: (`idCol`, rankACol, rankBCol, rrf).
    */
  def rrfFuse(
      a: DataFrame, b: DataFrame, idCol: String,
      rankACol: String, rankBCol: String, k: Int = 60): DataFrame =
    a.join(b, Seq(idCol), "full_outer")
      .withColumn("rrf", floor(
        (coalesce(lit(1.0) / (col(rankACol) + k.toDouble), lit(0.0)) +
         coalesce(lit(1.0) / (col(rankBCol) + k.toDouble), lit(0.0))) * 1000000.0) / 1000000.0)
}
