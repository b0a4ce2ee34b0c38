package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.expressions.{PercentNormalize, RegistrableDomainPsl, RemoveDotSegments}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Unit goldens for the RFC 3986 expressions behind q275: §6.2.2
  * percent-normalization, §5.2.4 remove_dot_segments (the RFC's own
  * examples verbatim), and the PSL-pluggable registrable domain.
  */
class UrlOpsSpec extends AnyFunSuite {

  private def ev(e: org.apache.spark.sql.catalyst.expressions.Expression): String =
    e.eval(null).asInstanceOf[UTF8String].toString
  private def lit(s: String) = Literal(UTF8String.fromString(s), StringType)

  test("PercentNormalize: unreserved escapes decode, reserved escapes uppercase, malformed % verbatim") {
    def pn(s: String) = ev(PercentNormalize(lit(s)))
    assert(pn("%41%61%30%2D%2e%5F%7e") == "Aa0-._~") // all unreserved classes
    assert(pn("%2f%3F%26%3d%23") == "%2F%3F%26%3D%23") // reserved: keep, uppercase
    assert(pn("%C3%A9") == "%C3%A9") // non-ASCII octets stay encoded
    assert(pn("100%3x%") == "100%3x%") // not-two-hex-digits: verbatim
    assert(pn("plain") == "plain")
    assert(pn("a%2Eb") == "a.b") // %2E decodes — feeds dot-segment removal
  }

  test("RemoveDotSegments: RFC 3986 §5.2.4 examples and pop edge cases") {
    def rd(s: String) = ev(RemoveDotSegments(lit(s)))
    assert(rd("/a/b/c/./../../g") == "/a/g") // §5.2.4 example 1
    assert(rd("mid/content=5/../6") == "mid/6") // §5.2.4 example 2
    assert(rd("/a/b/../../../c") == "/c") // pops past root stay rooted
    assert(rd("/./x/.") == "/x/")
    assert(rd("/..") == "/")
    assert(rd("..") == "")
    assert(rd("/a/./b/") == "/a/b/")
    assert(rd("/no/dots/here") == "/no/dots/here")
  }

  test("RegistrableDomainPsl: longest listed suffix wins; empty list reproduces the ccTLD heuristic") {
    val psl = Set("github.io", "compute.example.net")
    def rdp(h: String, s: Set[String]) = ev(RegistrableDomainPsl(lit(h), s))
    assert(rdp("a.b.github.io", psl) == "b.github.io")
    assert(rdp("x.y.compute.example.net", psl) == "y.compute.example.net")
    // no listed suffix → heuristic: ccTLD behind a common SLD takes 3 labels
    assert(rdp("www.ex.co.uk", psl) == "ex.co.uk")
    assert(rdp("deep.sub.example.com", psl) == "example.com")
    assert(rdp("example.com", Set.empty) == "example.com")
    assert(rdp("host", Set.empty) == "host")
  }

  test("vendored PSL snapshot: loads, carries the multi-label staples, resolves subdomained hosts") {
    val psl = graft.operators.UrlOps.pslSnapshot
    assert(psl.size > 300, s"snapshot suspiciously small: ${psl.size}")
    // the staples the round-14 queries key on
    for (s <- Seq("co.jp", "com.au", "co.uk", "co.kr", "com.br", "github.io"))
      assert(psl.contains(s), s"missing $s")
    assert(!psl.exists(_.startsWith("//")), "comment line leaked into the set")
    def rdp(h: String) = ev(RegistrableDomainPsl(lit(h), psl))
    assert(rdp("www.site5.co.jp") == "site5.co.jp")
    assert(rdp("a.b.site9.com.au") == "site9.com.au")
    assert(rdp("blog.site1.com") == "site1.com") // plain TLD via heuristic
    assert(rdp("user.github.io") == "user.github.io") // private section
    assert(rdp("deep.user.github.io") == "user.github.io")
    // the heuristic alone would mis-key this one to ne.jp
    assert(rdp("x.shop.ne.jp") == "shop.ne.jp")
  }

  test("PSL wildcard and exception rules: *.ck one-label wildcard, !www.ck beats it") {
    def rdp(h: String, s: Set[String]) = ev(RegistrableDomainPsl(lit(h), s))
    val psl = Set("*.ck", "!www.ck", "*.kawasaki.jp", "!city.kawasaki.jp", "co.uk")
    // wildcard: every <label>.ck is its own public suffix
    assert(rdp("www.foo.ck", psl) == "www.foo.ck")
    assert(rdp("a.b.foo.ck", psl) == "b.foo.ck")
    // a host that IS a public suffix returns itself (the sentinel)
    assert(rdp("foo.ck", psl) == "foo.ck")
    // exception beats the wildcard: the rule's own span is registrable
    assert(rdp("www.ck", psl) == "www.ck")
    assert(rdp("a.www.ck", psl) == "www.ck")
    assert(rdp("x.a.www.ck", psl) == "www.ck")
    // multi-label wildcard base + its exception
    assert(rdp("b.x.kawasaki.jp", psl) == "b.x.kawasaki.jp")
    assert(rdp("a.city.kawasaki.jp", psl) == "city.kawasaki.jp")
    assert(rdp("city.kawasaki.jp", psl) == "city.kawasaki.jp")
    // plain rules still win by most labels, unrelated hosts untouched
    assert(rdp("www.ex.co.uk", psl) == "ex.co.uk")
    // the SNAPSHOT carries the rule-syntax blocks
    val snap = graft.operators.UrlOps.pslSnapshot
    assert(snap.contains("*.ck") && snap.contains("!www.ck"))
    assert(ev(RegistrableDomainPsl(lit("sub0.www.ck"), snap)) == "www.ck")
    assert(ev(RegistrableDomainPsl(lit("www.site9.ck"), snap)) == "www.site9.ck")
  }

  test("urlSpamClassLarge: one alternation pass, boundary contract matches the fold variant") {
    import org.apache.spark.sql.functions.{col, lit => flit}
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val lex = Seq("casino", "viagra", "xxx", "poker")
    def run(u: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
      Seq(u).toDF("u").select(c(col("u"))).head.getString(0)
    def large(u: String) = run(u, graft.operators.UrlOps.urlSpamClassLarge(_, lex))
    def fold(u: String) = run(u, graft.operators.UrlOps.urlSpamClass(_, lex))
    val cases = Seq(
      "https://site.com/article/1", // clean
      "https://site.com/casino/win", // path segment fires
      "https://site.com/shop/viagra-2", // dash boundary fires
      "https://site.com/blog/maxxx", // token inside a word must NOT fire
      "https://poker.site.com/t/3", // host label fires
      "https://site.com/?q=xxx") // query value fires
    for (u <- cases) assert(large(u) == fold(u), u)
    assert(large("https://site.com/blog/maxxx") == "clean")
    // tie-break DIFFERS by design: leftmost-in-URL vs lexicon order
    assert(large("https://xxx.site.com/casino/") == "xxx") // leftmost
    assert(fold("https://xxx.site.com/casino/") == "casino") // lexicon order
    // the fold variant refuses UT1-scale lexicons; the large one takes them
    intercept[IllegalArgumentException] {
      graft.operators.UrlOps.urlSpamClass(flit("x"), (1 to 65).map("t" + _))
    }
    val big = (1 to 500).map("tok" + _) :+ "casino"
    assert(run("https://a.com/casino/x",
      graft.operators.UrlOps.urlSpamClassLarge(_, big)) == "casino")
  }
}
