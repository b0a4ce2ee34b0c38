package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{LinkOps, UrlOps}

/** Unit goldens for the WAT-side link operators behind q283/q284:
  * `<a href>` extraction (scope, order, attribute-entity decode) and
  * RFC 3986 §5.2.2 reference resolution — the resolution cases cross-
  * checked against `java.net.URI.resolve`, an INDEPENDENT implementation
  * of the same RFC algorithm, on the class where their contracts coincide
  * (http(s) bases, non-empty hierarchical refs; URI.resolve follows the
  * older RFC 2396 for empty refs, so that case is pinned by golden only).
  */
class LinkOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def hrefs(html: String): Seq[String] = {
    import spark.implicits._
    Seq(html).toDF("h").select(LinkOps.extractHrefs(col("h")))
      .head.getSeq[String](0)
  }

  private def anchors(html: String): Seq[String] = {
    import spark.implicits._
    Seq(html).toDF("h").select(LinkOps.extractAnchorTexts(col("h")))
      .head.getSeq[String](0)
  }

  private def resolve(base: String, ref: String): String = {
    import spark.implicits._
    Seq((base, ref)).toDF("b", "r")
      .select(LinkOps.resolveReference(col("b"), col("r"))).head.getString(0)
  }

  test("extractHrefs: document order, entity decode amp-LAST, all three attribute-value forms") {
    val html =
      """<html><body>
        |<a href="/a?x=1&amp;y=2">first</a>
        |<A HREF="/B">upper</A>
        |<a class="c" href="/c" rel="nofollow">attrs</a>
        |<a href='/single?a=1&amp;b=2'>single-quoted</a>
        |<a href=/unquoted/p.html rel=nofollow>unquoted</a>
        |<a href = '/spaced' >spaced equals</a>
        |<a href="/amp?q=&amp;lt;">amp-last: yields literal &lt;</a>
        |</body></html>""".stripMargin
    assert(hrefs(html) == Seq("/a?x=1&y=2", "/B", "/c", "/single?a=1&b=2",
      "/unquoted/p.html", "/spaced", "/amp?q=&lt;"))
  }

  test("extractHrefs: quote-form edge cases — embedded other-quote chars, anchors align") {
    // a double-quoted value may carry single quotes and vice versa; the
    // strip removes only ONE matching surrounding pair
    val html = """<a href="/it's/fine">dq</a><a href='/say/"hi"'>sq</a><a href=bare>u</a>"""
    assert(hrefs(html) == Seq("/it's/fine", "/say/\"hi\"", "bare"))
    assert(anchors(html) == Seq("dq", "sq", "u"))
    // the strips are MUTUALLY EXCLUSIVE: a double-quoted value that is
    // itself single-quoted keeps its inner quotes (one strip, not two)
    val nested = """<a href="'x'">dq-wrapping-sq</a><a href='"y"'>sq-wrapping-dq</a>"""
    assert(hrefs(nested) == Seq("'x'", "\"y\""))
  }

  test("extractAnchorTexts: position-aligned, inner tags stripped, whitespace squashed") {
    val html = """<a href="/a">read <b>the</b>
                 | doc</a><a href="/b"><img src="i.png"/></a>""".stripMargin
    assert(anchors(html) == Seq("read the doc", ""))
    assert(hrefs(html) == Seq("/a", "/b"))
  }

  test("resolveReference: RFC 3986 §5.2.2 golden cases") {
    val base = "https://h.example.com/a/b/page.html?v=1"
    assert(resolve(base, "https://x.org/p") == "https://x.org/p")
    assert(resolve(base, "//cdn.net/lib.js") == "https://cdn.net/lib.js")
    assert(resolve(base, "/rooted?z=1") == "https://h.example.com/rooted?z=1")
    assert(resolve(base, "rel/p.html") == "https://h.example.com/a/b/rel/p.html")
    assert(resolve(base, "../up") == "https://h.example.com/a/b/../up")
    assert(resolve(base, "?q=2") == "https://h.example.com/a/b/page.html?q=2")
    // empty and fragment-only: the base sans fragment, base query kept
    assert(resolve(base, "") == "https://h.example.com/a/b/page.html?v=1")
    assert(resolve(base, "#sec") == "https://h.example.com/a/b/page.html?v=1")
    // non-hierarchical schemes resolve to themselves
    assert(resolve(base, "mailto:u@e.com") == "mailto:u@e.com")
    // colon in the first segment IS a scheme per the RFC (authors write ./x:y)
    assert(resolve(base, "x:y") == "x:y")
    // authority-only base: path defaults to /
    assert(resolve("https://h.com", "p") == "https://h.com/p")
    assert(resolve("https://h.com", "?a=1") == "https://h.com/?a=1")
  }

  test("extractBaseHref/effectiveBase: WHATWG first-wins, absolute and relative base forms") {
    import spark.implicits._
    def eb(page: String, html: String): String =
      Seq((page, html)).toDF("p", "h")
        .select(LinkOps.effectiveBase(col("p"), col("h"))).head.getString(0)
    val page = "https://site1.com/a/b/page.html"
    // no base → the page URL itself
    assert(eb(page, "<html><body><a href=\"/x\">l</a></body></html>") == page)
    // absolute base; the SECOND <base> is ignored (first-wins)
    assert(eb(page, "<head><base href=\"https://other.org/bb/\">" +
      "<base href=\"https://ignored.example/\"></head>") == "https://other.org/bb/")
    // relative base resolves against the page URL first (path-absolute)
    assert(eb(page, "<head><base href=\"/alt/dir/\"></head>") ==
      "https://site1.com/alt/dir/")
    // relative-path base merges onto the page's directory
    assert(eb(page, "<head><base href=\"sub/\"></head>") ==
      "https://site1.com/a/b/sub/")
    // single-quoted and unquoted attribute forms both extract
    assert(eb(page, "<base href='/sq/'>") == "https://site1.com/sq/")
    assert(eb(page, "<base href=/uq/ target=_blank>") == "https://site1.com/uq/")
    // links on a base-carrying page resolve against the EFFECTIVE base
    val html = "<head><base href=\"https://other.org/bb/\"></head>" +
      "<body><a href=\"rel.html\">r</a></body>"
    val resolved = Seq((page, html)).toDF("p", "h")
      .select(LinkOps.resolveReference(
        LinkOps.effectiveBase(col("p"), col("h")),
        element_at(LinkOps.extractHrefs(col("h")), 1))).head.getString(0)
    assert(resolved == "https://other.org/bb/rel.html")
  }

  test("resolveReference + canonicalizeUrlFull cross-checks java.net.URI.resolve") {
    import spark.implicits._
    val base = "https://h.example.com/a/b/page.html"
    // the coinciding class: hierarchical refs without dup slashes (URI
    // keeps empty segments), without pops past root and without
    // query-only refs (URI.resolve follows RFC 2396 for both)
    val refs = Seq("https://x.org/p", "//cdn.net/l", "/r/./s", "rel/p.html",
      "../up", "sub/../x", "d/")
    val got = refs.map { r =>
      Seq((base, r)).toDF("b", "r")
        .select(UrlOps.canonicalizeUrlFull(
          LinkOps.resolveReference(col("b"), col("r")))).head.getString(0)
    }
    val want = refs.map { r =>
      val u = java.net.URI.create(base).resolve(r).normalize()
      // canonical form trims the trailing slash (root keeps it)
      val full = u.toString
      if (full.endsWith("/") && u.getPath != "/") full.dropRight(1) else full
    }
    assert(got == want)
  }
}
