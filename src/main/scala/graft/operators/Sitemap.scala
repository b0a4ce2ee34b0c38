package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org protocol) — the crawl-frontier
  * DISCOVERY operator next to [[RobotsTxt]]'s politeness gate: sites
  * publish `<urlset>` documents (per-URL `<loc>`/`<lastmod>`/
  * `<priority>`) and, above ~50k URLs, a `<sitemapindex>` of child
  * sitemaps. Both layers are fully relational (regexp block explode +
  * per-block extracts + one join for the index indirection), so the
  * DuckDB oracle replays the entire resolution. XML entity decoding
  * reuses [[HtmlOps]]'s named-entity chain — `&amp;` is REQUIRED in any
  * sitemap URL with a query string, the classic interop detail.
  *
  * Scope (disclosed): one index level (the protocol's own limit is one
  * — index-of-index is non-conforming), no gzip transport here (that is
  * [[graft.sources.CompressedText]]'s layer), no `<changefreq>`.
  */
object Sitemap {

  /** `<sitemapindex>` rows → (parent keyed by `urlCol`, child_url). */
  def childLocs(df: DataFrame, urlCol: String, xmlCol: String): DataFrame =
    df.filter(col(xmlCol).contains("<sitemapindex"))
      .select(col(urlCol).as("parent_url"),
        explode(expr(
          s"regexp_extract_all($xmlCol, '(?s)<sitemap>(.*?)</sitemap>', 1)"))
          .as("__b"))
      .select(col("parent_url"),
        HtmlOps.decodeEntities(
          trim(regexp_extract(col("__b"), "(?s)<loc>(.*?)</loc>", 1)))
          .as("child_url"))
      .filter(col("child_url") =!= "")

  /** `<urlset>` rows → one row per `<url>` entry:
    * (sitemap_url, loc, lastmod, priority) — loc entity-decoded,
    * lastmod/priority "" when absent.
    */
  def urlEntries(df: DataFrame, urlCol: String, xmlCol: String): DataFrame =
    df.filter(col(xmlCol).contains("<urlset"))
      .select(col(urlCol).as("sitemap_url"),
        explode(expr(
          s"regexp_extract_all($xmlCol, '(?s)<url>(.*?)</url>', 1)")).as("__b"))
      .select(col("sitemap_url"),
        HtmlOps.decodeEntities(
          trim(regexp_extract(col("__b"), "(?s)<loc>(.*?)</loc>", 1))).as("loc"),
        trim(regexp_extract(col("__b"), "(?s)<lastmod>(.*?)</lastmod>", 1))
          .as("lastmod"),
        trim(regexp_extract(col("__b"), "(?s)<priority>(.*?)</priority>", 1))
          .as("priority"))
      .filter(col("loc") =!= "")

}
