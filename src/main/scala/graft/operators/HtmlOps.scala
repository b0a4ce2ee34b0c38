package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.graft.expressions.{CharsetDecode, DecodeNumericRefs, SniffHtmlCharset}

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
  * Scope: no JS rendering, no CSS visibility. Numeric character
  * references decode FULL-codepoint through the native
  * [[org.apache.spark.sql.graft.expressions.DecodeNumericRefs]]
  * Expression in [[visibleTextDecoded]] (round 13; [[visibleText]] keeps
  * the round-12 named-entities-only contract so the q271 oracle stays
  * byte-identical) — positioned between the apostrophe step and the
  * amp-LAST step, so `&amp;#60;` still yields the literal `&#60;` (the
  * single-pass, non-recursive contract extended). Non-UTF-8 payloads
  * decode ahead of extraction via [[charsetDecode]]/[[sniffCharset]]
  * (HTTP charset param → meta prescan → BOM → strict-UTF-8-else-
  * windows-1252, the WHATWG order). Every step here has an exact DuckDB
  * twin, so the q271/q274 oracles re-derive the text independently from
  * the same markup.
  */
object HtmlOps {

  /** Title element's decoded text ("" when absent). */
  def htmlTitle(html: Column): Column =
    decodeEntities(trim(regexp_replace(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1),
      "\\s+", " ")))

  // `<meta http-equiv=refresh>`: the content attribute value, both
  // attribute orders (http-equiv-first is the overwhelming real form;
  // content-first is legal and appears in generated markup), the three
  // attribute-value quoting forms
  private val MetaRefreshHEFirst =
    "(?is)<meta\\s[^>]*?http-equiv\\s*=\\s*[\"']?refresh[\"']?[^>]*?" +
      "content\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)"
  private val MetaRefreshContentFirst =
    "(?is)<meta\\s[^>]*?content\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)" +
      "[^>]*?http-equiv\\s*=\\s*[\"']?refresh[\"']?"

  /** Redirect target of a `<meta http-equiv=refresh content="N;
    * url=TARGET">` element — the second-most-common real redirect form
    * after HTTP `Location`, and invisible to a Location-only edge
    * relation. Returns the RAW target ("" when the page has none or the
    * content is a bare delay with no `url=`): entity-decoded, the
    * optional inner quotes around the target stripped (WHATWG allows
    * `url='…'` inside a double-quoted content), but NOT resolved —
    * resolution against the page URL is [[LinkOps.resolveReference]]'s
    * job, exactly like an href. One scan-side regexp pass per attribute
    * order, oracle-replayable.
    */
  def metaRefreshUrl(html: Column): Column = {
    val a = regexp_extract(html, MetaRefreshHEFirst, 1)
    val raw = when(a =!= "", a)
      .otherwise(regexp_extract(html, MetaRefreshContentFirst, 1))
    // strip the attribute quotes, decode entities (amp LAST, the
    // attribute contract), then pull the url= part of "N; url=..."
    val unq = when(raw.startsWith("\""), regexp_replace(raw, "^\"((?s).*)\"$", "$1"))
      .otherwise(regexp_replace(raw, "^'((?s).*)'$", "$1"))
    val dec = decodeEntities(unq)
    val target = regexp_extract(dec,
      "(?is)^\\s*[0-9]+(?:\\.[0-9]*)?\\s*[;,]\\s*url\\s*=\\s*(.*)$", 1)
    // inner quotes around the target value, then surrounding whitespace
    trim(when(target.startsWith("\""), regexp_extract(target, "^\"([^\"]*)", 1))
      .when(target.startsWith("'"), regexp_extract(target, "^'([^']*)", 1))
      .otherwise(target))
  }

  /** Visible text, newline-separated blocks (see object doc). The hidden-
    * element pattern is an explicit per-tag alternation, NOT a
    * backreference — RE2 (DuckDB's engine) has no backreferences, and the
    * oracle must run the semantically identical pattern.
    */
  def visibleText(html: Column): Column = visibleTextImpl(html, numRefs = false)

  /** [[visibleText]] with the general numeric-character-reference decode
    * in the entity pass (full-codepoint, invalid refs verbatim).
    */
  def visibleTextDecoded(html: Column): Column = visibleTextImpl(html, numRefs = true)

  private def visibleTextImpl(html: Column, numRefs: Boolean): Column = {
    val noHidden = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>|<style\\b[^>]*>.*?</style\\s*>" +
        "|<noscript\\b[^>]*>.*?</noscript\\s*>|<!--.*?-->", "")
    val blocks = regexp_replace(noHidden,
      "(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article)\\s*>|<br\\s*/?>",
      "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", "")
    val decoded = decodeEntities(noTags, numRefs)
    // collapse intra-line whitespace, trim line edges, collapse blank runs
    val squashed = regexp_replace(decoded, "[ \\t\\x0B\\f\\r]+", " ")
    val trimmed = regexp_replace(squashed, "(?m)^ +| +$", "")
    trim(regexp_replace(trimmed, "\\n{2,}", "\n"), " \n")
  }

  /** Named-entity decode (see object doc for order and scope); with
    * `numRefs`, the general numeric decode runs BETWEEN the apostrophe
    * step and the amp-last step — a ref whose `&` came from `&amp;` is
    * never decoded (non-recursive).
    */
  private[operators] def decodeEntities(c: Column, numRefs: Boolean = false): Column = {
    val nbsp = regexp_replace(c, "&nbsp;", " ")
    val lt = regexp_replace(nbsp, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&#39;|&apos;", "'")
    val refs = if (numRefs) decodeNumericRefs(apos) else apos
    regexp_replace(refs, "&amp;", "&")
  }

  /** Full-codepoint `&#NNN;`/`&#xHH;` decode (native Expression). */
  def decodeNumericRefs(c: Column): Column =
    Bridge.toColumn(DecodeNumericRefs(Bridge.toExpr(c)))

  /** Charset label the sniff chain resolves for (payload bytes, HTTP
    * content-type) — see the object doc for the WHATWG order.
    */
  def sniffCharset(bin: Column, httpCt: Column): Column =
    Bridge.toColumn(SniffHtmlCharset(Bridge.toExpr(bin), Bridge.toExpr(httpCt)))

  /** Payload bytes → text through the same sniff chain. */
  def charsetDecode(bin: Column, httpCt: Column): Column =
    Bridge.toColumn(CharsetDecode(Bridge.toExpr(bin), Bridge.toExpr(httpCt)))

  // ---------------------------------------------------------------------
  // q274 fixture: per-doc pages ENCODED in three charsets (real bytes —
  // windows-1252 via meta prescan, iso-8859-1 via HTTP header, unlabeled
  // UTF-8 via the strict-decode fallback), each carrying numeric refs
  // incl. an astral, an invalid surrogate ref (stays verbatim) and the
  // &amp;#60; non-recursion probe. The oracle rebuilds the DECODED page
  // string closed-form and re-extracts with DuckDB's RE2 + chr().
  // ---------------------------------------------------------------------

  private def escHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** (http content-type, page bytes) for doc `id` — mode `id % 3`. Text
    * is ASCII-sanitized for the two single-byte charsets (both sides of
    * the oracle strip `[^ -~]`), full for UTF-8.
    */
  private[graft] def charsetFixturePage(id: Long, text: String): (String, Array[Byte]) = {
    val head = s"<title>Doc $id</title></head><body><h1>Doc $id</h1>"
    val ascii = escHtml(text.replaceAll("[^ -~]", ""))
    (id % 3) match {
      case 0 =>
        val page = "<html><head><meta charset=\"windows-1252\">" + head +
          "<p>“quoted” — dash</p><p>" + ascii +
          " &#xA9; tail</p></body></html>"
        ("text/html", page.getBytes(java.nio.charset.Charset.forName("windows-1252")))
      case 1 =>
        val page = "<html><head>" + head +
          "<p>café ® mark</p><p>" + ascii +
          " &#169; &#8212; tail</p></body></html>"
        ("text/html; charset=ISO-8859-1",
          page.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      case _ =>
        val page = "<html><head>" + head +
          "<p>café — 😀</p><p>" + escHtml(text) +
          s" &#${65 + id % 26}; &#x1F600; &#xD800; &amp;#60; tail</p></body></html>"
        ("text/html", page.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** (doc_id, http_ct, body) fixture frame over the documents table. */
  def charsetFixture(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val (ct, bytes) = charsetFixturePage(id, text)
        (id, ct, bytes)
      }.toDF("doc_id", "http_ct", "body")
  }
}
