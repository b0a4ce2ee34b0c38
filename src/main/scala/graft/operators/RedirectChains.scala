package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution — the step between a crawl's capture index
  * and its canonical-URL view: archived 3xx responses carry `Location`
  * headers (surfaced by [[graft.sources.WarcReader.records]] as
  * `http_location`), and a URL's identity is wherever its chain LANDS,
  * not where it starts (the reference follows redirects implicitly
  * inside `requests.get`, `pipeline1.py:371` — an archive has to replay
  * them relationally). Duplicate collapse, link-graph edges, and
  * recrawl planning all key on the final URL.
  *
  * Shape for 100 TB: the edge relation is the 3xx SUBSET of captures
  * (single-digit percent of a real crawl) with ONE edge per source URL
  * (callers elect the latest capture per URL first — q285's job), so
  * resolution is `maxHops` bounded equi self-joins of an id-sized
  * relation; the corpus-sized start set joins the edges by hash, and
  * AQE broadcasts the edge side when it fits. No iteration-to-fixpoint:
  * real fetchers cap hops (curl 50, browsers ~20, crawlers 3-8), and a
  * bounded cap is what keeps the plan a fixed-depth DAG.
  *
  * Cycle handling: each hop checks the stepped-to URL against the
  * accumulated chain (`array_contains` over a ≤ maxHops+1 array);
  * a closing hop flags `loop` and freezes the walk. After the last
  * hop, a final probe join marks chains that still have an outgoing
  * edge as `truncated`. Everything is `org.apache.spark.sql.functions`
  * — the DuckDB oracle replays the joins generically.
  */
object RedirectChains {

  /** Resolve every `urlCol` row of `starts` through the (srcCol →
    * dstCol) redirect edges, at most `maxHops` hops. Output: the input
    * columns plus `final_url`, `n_hops`, `chain_status`
    * (`resolved` | `loop` | `truncated`).
    */
  def resolve(starts: DataFrame, edges: DataFrame, urlCol: String,
      srcCol: String, dstCol: String, maxHops: Int = 3): DataFrame = {
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    var cur = starts
      .withColumn("__cur", col(urlCol))
      .withColumn("n_hops", lit(0L))
      .withColumn("__chain", array(col(urlCol)))
      .withColumn("__loop", lit(false))
    for (_ <- 1 to maxHops) {
      val stepped = col("__dst").isNotNull && !col("__loop")
      cur = cur.join(e, cur("__cur") === col("__src"), "left")
        .withColumn("__hit", stepped)
        .withColumn("__loop", col("__loop") ||
          (col("__hit") && array_contains(col("__chain"), col("__dst"))))
        .withColumn("n_hops",
          when(col("__hit"), col("n_hops") + 1L).otherwise(col("n_hops")))
        .withColumn("__chain", when(col("__hit"),
          array_union(col("__chain"), array(col("__dst"))))
          .otherwise(col("__chain")))
        .withColumn("__cur",
          when(col("__hit"), col("__dst")).otherwise(col("__cur")))
        .drop("__src", "__dst", "__hit")
    }
    // one probe join: an outgoing edge left after the cap = truncated
    val probe = e.withColumnRenamed("__src", "__psrc")
      .withColumnRenamed("__dst", "__pdst")
    cur.join(probe, cur("__cur") === col("__psrc"), "left")
      .withColumn("chain_status",
        when(col("__loop"), "loop")
          .when(col("__pdst").isNotNull, "truncated")
          .otherwise("resolved"))
      .withColumn("final_url", col("__cur"))
      .drop("__cur", "__chain", "__loop", "__psrc", "__pdst")
  }
}
