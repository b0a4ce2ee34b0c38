package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document paragraph-level exact dedup (the CCNet move): every
  * repeated paragraph is dropped except its FIRST occurrence in the
  * corpus-wide (doc, position) order, and documents are rebuilt from what
  * survives. The reference corpus has no paragraph structure (its chunking
  * is token-budget-driven — `pipeline1.py`), so this is a north-star
  * pipeline operator, not a parity one.
  *
  * Scale shape: ONE shuffle keyed by paragraph content decides keep/drop
  * in place (a window, not a groupBy + join-back — no second pass over the
  * paragraph stream), then the rebuild groups on the doc key using the
  * ordered-collect idiom (`array_sort(collect_list(struct(idx, p)))`), the
  * engine's standard order-explicit aggregation. Never a self-join, never
  * corpus²; the content exchange carries (doc, idx, paragraph) rows once.
  * At 100 TB hash the paragraph to a fixed-width key column first if
  * paragraph text dominates the shuffle (the window only needs equality).
  */
object ParagraphDedup {

  /** Adds `keep`: 1 on the first corpus-wide occurrence of `parCol` in
    * (`docCol`, `idxCol`) order, else 0.
    */
  def markFirstOccurrence(
      pars: DataFrame, docCol: String, idxCol: String, parCol: String): DataFrame =
    pars.withColumn("keep",
      (row_number().over(
        Window.partitionBy(col(parCol)).orderBy(col(docCol), col(idxCol))) === 1)
        .cast("int"))

  /** Per-document rollup: paragraph count, surviving count, and the md5 of
    * the document rebuilt from surviving paragraphs in `idxCol` order
    * joined with `sep` (md5 of "" when nothing survives — a document whose
    * every paragraph occurred earlier elsewhere).
    */
  def dedupSummary(
      pars: DataFrame, docCol: String, idxCol: String, parCol: String,
      sep: String = " "): DataFrame =
    markFirstOccurrence(pars, docCol, idxCol, parCol)
      .groupBy(col(docCol))
      .agg(
        count(lit(1)).as("n_pars"),
        sum(col("keep")).cast("long").as("n_kept"),
        md5(concat_ws(sep, transform(
          array_sort(collect_list(when(col("keep") === 1,
            struct(col(idxCol).as("idx"), col(parCol).as("p"))))),
          kv => kv.getField("p")))).as("kept_md5"))
}
