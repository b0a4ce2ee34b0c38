package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Outlink extraction + RFC 3986 §5.2 reference resolution — the WAT step
  * of a crawl pipeline (Common Crawl publishes exactly this as `.wat.gz`):
  * every page's `<a href>` targets, resolved against the page's own URL,
  * are what build the web graph that ranks hosts, discovers the frontier,
  * and weights dedup survivors. The reference never links (it ingests a
  * hand-typed URL list, `pipeline1.py:922`); a 100 TB crawl derives its
  * NEXT 100 TB from these edges.
  *
  * Both operators are pure `Column` expressions (whole-stage codegen, no
  * UDF; markup never leaves its scan task) with exact DuckDB twins, so the
  * q283 oracle replays extraction AND resolution generically:
  *
  *   - [[extractHrefs]] / [[extractAnchorTexts]]: the href values (and
  *     their anchor texts) of `<a>` elements, in document order, HTML
  *     attribute entities decoded (`&lt; &gt; &quot; &#39;`, then `&amp;`
  *     LAST — the same single-pass, non-recursive contract as
  *     [[HtmlOps.decodeEntities]]; `&amp;` is REQUIRED in any conformant
  *     href with a multi-param query string, so skipping this step breaks
  *     every such link). All three HTML attribute-value forms match —
  *     double-quoted, single-quoted, and unquoted (value runs to the
  *     first whitespace or `>`, the WHATWG unquoted-value rule) — as ONE
  *     alternation group, quotes stripped in a follow-up expression, so
  *     the oracle pattern stays one RE2 literal. Real HTML is messy;
  *     every missed attribute form was a missing edge in the host graph.
  *   - [[resolveReference]]: RFC 3986 §5.2.2's transform-references
  *     algorithm for hierarchical http(s) bases — absolute refs pass
  *     through, `//authority` takes the base scheme, `/path` replaces the
  *     path, `?query` keeps the base path, `#frag`/empty return the base
  *     (sans fragment), and relative paths MERGE onto the base directory
  *     (§5.2.3). Dot segments introduced by the merge are NOT popped here:
  *     §5.2.4 is [[UrlOps.canonicalizeUrlFull]]'s `RemoveDotSegments` step,
  *     and resolution composes with canonicalization in exactly that
  *     order — resolve → canonicalize, each step a one-pass expression.
  *
  * Non-hierarchical schemes (`mailto:`, `javascript:`, `tel:`, `data:`)
  * resolve to themselves per the RFC; the link queries filter them with
  * one `rlike("^https?://")` after resolution, which is also where
  * protocol-relative refs against a non-http base would fall out.
  */
object LinkOps {

  private val HrefPattern =
    "(?is)<a\\s[^>]*?href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)[^>]*>(.*?)</a\\s*>"

  /** Attribute-value entity decode — same order contract as
    * [[HtmlOps.decodeEntities]] (amp LAST, non-recursive).
    */
  private def decodeAttr(c: Column): Column = {
    val lt = regexp_replace(c, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&#39;", "'")
    regexp_replace(apos, "&amp;", "&")
  }

  /** Strip one matching pair of surrounding quotes off a captured
    * attribute value (the alternation group keeps them so the pattern
    * stays a single RE2 literal the oracle replays); unquoted values
    * pass through verbatim. The two strips are MUTUALLY EXCLUSIVE —
    * chained, a double-quoted value that itself begins and ends with a
    * single quote (`href="'x'"`) would be stripped twice, yielding `x`
    * instead of `'x'`.
    */
  private def stripQuotes(c: Column): Column =
    when(c.startsWith("\""), regexp_replace(c, "^\"((?s).*)\"$", "$1"))
      .otherwise(regexp_replace(c, "^'((?s).*)'$", "$1"))

  private val BaseHrefPattern =
    "(?is)<base\\s[^>]*?href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)"

  /** href of the FIRST `<base>` element that carries one — WHATWG HTML
    * §4.2.3: "there must be no more than one base element per document"
    * and only the first href is honored — entity-decoded, quotes
    * stripped; empty string when the page declares none. Same three
    * attribute-value forms and the same single-RE2-literal contract as
    * [[extractHrefs]], so the oracle replays the extraction.
    */
  def extractBaseHref(html: Column): Column =
    decodeAttr(stripQuotes(regexp_extract(html, BaseHrefPattern, 1)))

  /** The page's EFFECTIVE base URL (WHATWG "fallback base URL" order):
    * the first `<base href>` resolved against the page's own URL —
    * `<base>` values may themselves be relative — or the page URL when
    * none is declared. Every link on a base-carrying page must resolve
    * against THIS, not the page URL: templated/proxy-served sites use
    * `<base>` routinely, and ignoring it mis-resolves every relative
    * link they serve (wrong host-graph edges, wrong frontier URLs,
    * wrong anchor targets).
    */
  def effectiveBase(pageUrl: Column, html: Column): Column = {
    val b = extractBaseHref(html)
    when(b === "", pageUrl).otherwise(resolveReference(pageUrl, b))
  }

  /** href values of `<a>` elements in document order, entity-decoded. */
  def extractHrefs(html: Column): Column =
    transform(regexp_extract_all(html, lit(HrefPattern), lit(1)),
      h => decodeAttr(stripQuotes(h)))

  /** Anchor texts of the SAME matches, position-aligned with
    * [[extractHrefs]] (one pattern, two groups — zip them with
    * `arrays_zip` for (href, text) pairs), tags inside stripped,
    * entities decoded, whitespace squashed.
    */
  def extractAnchorTexts(html: Column): Column =
    transform(regexp_extract_all(html, lit(HrefPattern), lit(2)),
      t => trim(regexp_replace(
        decodeAttr(regexp_replace(t, "(?s)<[^>]*>", "")), "\\s+", " ")))

  /** RFC 3986 §5.2.2 reference resolution against an absolute http(s)
    * base URL (see object doc; dot segments left for §5.2.4 =
    * [[UrlOps.canonicalizeUrlFull]]).
    */
  def resolveReference(base: Column, ref: Column): Column = {
    val r = regexp_replace(ref, "#.*$", "") // fragments never leave the page
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    // scheme://authority, with any path/query/fragment tail cut
    val root = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val basePath0 = regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val basePath = when(basePath0 === "", "/").otherwise(basePath0)
    // base directory: everything up to and including the last slash (§5.2.3)
    val baseDir = regexp_replace(basePath, "[^/]*$", "")
    when(r.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), r) // has scheme → itself
      .when(r.startsWith("//"), concat(scheme, lit(":"), r))
      .when(r.startsWith("/"), concat(root, r))
      .when(r === "", concat(root, basePath,
        when(base.contains("?"), regexp_extract(base, "(\\?[^#]*)", 1))
          .otherwise("")))
      .when(r.startsWith("?"), concat(root, basePath, r))
      .otherwise(concat(root, baseDir, r))
  }
}
