package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step between [[UrlOps]]'s crawl curation
  * and every text operator in this engine: a web corpus arrives as markup,
  * and the training pipeline needs the VISIBLE text (and the title) out of
  * it before quality filters, dedup or chunking can run (the reference
  * sidesteps this by ingesting PDFs, `pipeline1.py:605`; a 100 TB crawl
  * cannot).
  *
  * [[visibleText]] is the boilerplate-free core as scan-side Column
  * expressions (regex chains — whole-stage codegen, no UDF, markup never
  * leaves its scan task):
  *
  *   1. drop `<script>`/`<style>`/`<noscript>` ELEMENTS wholesale (their
  *      content is never visible text) and comments (`<!-- … -->`);
  *   2. turn the block-level closers/voids that imply line structure
  *      (`</p> </div> </li> </h1..6> </tr> … <br>`) into newlines so
  *      paragraph boundaries survive the strip;
  *   3. strip every remaining tag;
  *   4. decode the named entities that dominate real corpora
  *      (`&nbsp; &lt; &gt; &quot; &#39;/&apos;`, then `&amp;` LAST so
  *      `&amp;lt;` yields the literal `&lt;` — the standard single-pass,
  *      non-recursive contract);
  *   5. collapse runs of spaces/tabs, trim each line, collapse blank runs.
  *
  * Scope (disclosed): no JS rendering, no CSS visibility, and numeric
  * character references beyond `&#39;` pass through unchanged — Spark's
  * `char()` is mod-256 where DuckDB's `chr()` is full-codepoint, so a
  * general numeric decode belongs in a native Expression if a corpus
  * needs it. Every step here has an exact DuckDB twin, so the q271
  * oracle re-derives the text independently from the same markup.
  */
object HtmlOps {

  /** Title element's decoded text ("" when absent). */
  def htmlTitle(html: Column): Column =
    decodeEntities(trim(regexp_replace(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1),
      "\\s+", " ")))

  /** Visible text, newline-separated blocks (see object doc). The hidden-
    * element pattern is an explicit per-tag alternation, NOT a
    * backreference — RE2 (DuckDB's engine) has no backreferences, and the
    * oracle must run the semantically identical pattern.
    */
  def visibleText(html: Column): Column = {
    val noHidden = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>|<style\\b[^>]*>.*?</style\\s*>" +
        "|<noscript\\b[^>]*>.*?</noscript\\s*>|<!--.*?-->", "")
    val blocks = regexp_replace(noHidden,
      "(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article)\\s*>|<br\\s*/?>",
      "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", "")
    val decoded = decodeEntities(noTags)
    // collapse intra-line whitespace, trim line edges, collapse blank runs
    val squashed = regexp_replace(decoded, "[ \\t\\x0B\\f\\r]+", " ")
    val trimmed = regexp_replace(squashed, "(?m)^ +| +$", "")
    trim(regexp_replace(trimmed, "\\n{2,}", "\n"), " \n")
  }

  /** Named-entity decode (see object doc for order and scope). */
  private[operators] def decodeEntities(c: Column): Column = {
    val nbsp = regexp_replace(c, "&nbsp;", " ")
    val lt = regexp_replace(nbsp, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&#39;|&apos;", "'")
    regexp_replace(apos, "&amp;", "&")
  }
}
