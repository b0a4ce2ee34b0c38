package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source boilerplate stripping — the RefinedWeb/CCNet pass that
  * [[ParagraphDedup]] does not cover: paragraph dedup keeps the FIRST
  * occurrence of a repeated paragraph, but template boilerplate (nav bars,
  * cookie banners, license footers emitted by one crawler source) should
  * be removed from EVERY document, first occurrence included. The decision
  * rule is frequency within the source: a paragraph present in at least
  * `minFrac` of a source's documents (and at least `minDocs` of them) is
  * template, not content.
  *
  * Scale shape: paragraph text never enters a shuffle — the document
  * frequency is computed on an 8-byte content hash
  * ([[graft.functions.HashFunctions.stableHash64]]), so both shuffles
  * (per-(source, hash) doc frequency; join of the flagged hash set back
  * onto the paragraph stream) carry fixed-width keys. Within-document
  * repeats count ONCE toward document frequency (a distinct (doc, hash)
  * stream feeds the counter) but every instance is stripped. The flagged
  * set is per-source template paragraphs — orders of magnitude smaller
  * than the corpus — yet joins as a plain shuffle-hash join on (source,
  * hash) because at 100 TB "small" is not broadcastable-by-assumption;
  * AQE may still elect broadcast from runtime stats.
  */
object Boilerplate {

  /** Per-source template paragraph hashes: (source, ph, df_docs) where
    * `df_docs` ≥ max(`minDocs`, ceil(`minFrac` · docs-in-source)). Input is
    * a paragraph stream (docCol, srcCol, parCol).
    */
  def templateHashes(
      pars: DataFrame, docCol: String, srcCol: String, parCol: String,
      minFrac: Double, minDocs: Long): DataFrame = {
    val ph = graft.functions.HashFunctions.stableHash64(col(parCol))
    val perDoc = pars
      .select(col(srcCol).as("source"), col(docCol).as("doc"), ph.as("ph"))
      .distinct()
    val srcSizes = perDoc.select(col("source"), col("doc")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs_src"))
    perDoc
      .groupBy(col("source"), col("ph"))
      .agg(count(lit(1)).as("df_docs"))
      .join(srcSizes, Seq("source"))
      // integer form of df/n ≥ minFrac: df · 10000 ≥ n · round(minFrac·1e4)
      .filter(col("df_docs") >= minDocs &&
        col("df_docs") * lit(10000L) >=
          col("n_docs_src") * lit(math.round(minFrac * 10000.0)))
      .select(col("source"), col("ph"), col("df_docs"))
  }

  /** Per-source strip report: template paragraph count, affected documents,
    * removed instances and tokens. `tokCol` is the per-instance token count
    * (computed scan-side by the caller so this operator never re-splits).
    */
  def stripSummary(
      pars: DataFrame, docCol: String, srcCol: String, parCol: String,
      tokCol: String, minFrac: Double, minDocs: Long): DataFrame = {
    val tmpl = templateHashes(pars, docCol, srcCol, parCol, minFrac, minDocs)
    val ph = graft.functions.HashFunctions.stableHash64(col(parCol))
    pars
      .select(col(srcCol).as("source"), col(docCol).as("doc"),
        col(tokCol).as("n_tok"), ph.as("ph"))
      .join(tmpl, Seq("source", "ph"))
      .groupBy(col("source"))
      .agg(
        countDistinct(col("ph")).as("n_template_pars"),
        countDistinct(col("doc")).as("n_docs_affected"),
        count(lit(1)).as("n_instances_removed"),
        sum(col("n_tok")).as("n_tokens_removed"))
  }
}
