package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

import graft.sources.WarcReader

/** Goldens for redirect-chain resolution: the hop walk (resolved /
  * loop / truncated), the hop cap, and the Location header's extraction
  * from real WARC bytes (the q301 edge source).
  */
class RedirectChainsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("resolve: resolved, loop, and truncated chains with the hop cap") {
    val s = spark
    import s.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), // 4-hop chain
      ("p", "q"), // one hop
      ("x", "y"), ("y", "x"), // 2-cycle
      ("z", "z")) // self-loop
      .toDF("src", "dst")
    val starts = Seq("a", "b", "p", "q", "x", "z", "free").toDF("url")
    val got = graft.operators.RedirectChains
      .resolve(starts, edges, "url", "src", "dst", maxHops = 3)
      .select($"url", $"final_url", $"n_hops", $"chain_status")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getString(3))).toMap
    assert(got("a") == (("d", 3L, "truncated"))) // cap hit with an edge left
    assert(got("b") == (("e", 3L, "resolved"))) // exactly at the cap
    assert(got("p") == (("q", 1L, "resolved")))
    assert(got("q") == (("q", 0L, "resolved")))
    assert(got("x") == (("x", 2L, "loop"))) // x→y→x closes the cycle
    assert(got("z") == (("z", 1L, "loop"))) // self-loop flags on hop 1
    assert(got("free") == (("free", 0L, "resolved")))
  }

  test("Location header rides the WARC walk: real bytes through build→gzip→walk→HTTP split") {
    val s = spark
    import s.implicits._
    val docs = (0L until 8L).map(i => (i, s"body $i")).toDF("doc_id", "text")
    val recs = WarcReader.records(
      WarcReader.buildRedirectFixture(docs, nShards = 2), "warc")
      .filter($"warc_type" === "response")
      .select($"target_uri", $"http_status", $"http_location")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    // doc 1 (k=1): /a 301 → /p via a RELATIVE Location (surfaced
    // verbatim — resolution is the consumer's §5.2.2 job); doc 2
    // (k=2): /b 302 → /a2 301 → /p; doc 3 (k=3): /x ↔ /y 302 loop;
    // 200 pages carry no Location
    assert(recs("https://site1.com/a/1") == ((301, "/p/1")))
    assert(recs("https://site2.com/b/2") ==
      ((302, "https://site2.com/a2/2")))
    assert(recs("https://site2.com/a2/2") ==
      ((301, "https://site2.com/p/2")))
    assert(recs("https://site3.com/x/3") ==
      ((302, "https://site3.com/y/3")))
    assert(recs("https://site3.com/y/3") ==
      ((302, "https://site3.com/x/3")))
    assert(recs("https://site0.com/p/0") == ((200, "")))
  }

  test("metaRefreshUrl: attribute orders, quoting forms, bare delay, comma separator") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    def m(html: String): String =
      Seq(html).toDF("h")
        .select(graft.operators.HtmlOps.metaRefreshUrl(col("h")))
        .head.getString(0)
    // canonical double-quoted form
    assert(m("""<meta http-equiv="refresh" content="5; url=/next">""") == "/next")
    // single-quoted content, uppercase URL=, zero delay (the fixture form)
    assert(m("""<meta http-equiv="refresh" content='0; URL=/p/7'>""") == "/p/7")
    // content-first attribute order
    assert(m("""<meta content="3;url=https://x.org/t" http-equiv=refresh>""") ==
      "https://x.org/t")
    // inner-quoted url value, entity-decoded query
    assert(m("""<meta http-equiv=refresh content="1; url='/q?a=1&amp;b=2'">""") ==
      "/q?a=1&b=2")
    // comma separator (a common real-world variant), fractional delay
    assert(m("""<meta http-equiv="refresh" content="2.5, url=/frac">""") == "/frac")
    // bare delay = reload, NOT a redirect; and pages with no meta at all
    assert(m("""<meta http-equiv="refresh" content="30">""") == "")
    assert(m("<html><body>plain</body></html>") == "")
  }

  test("meta edges ride the WARC walk: /mm one-hop meta, /m meta->http mixed chain") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, decode, when, lit}
    val docs = (0L until 8L).map(i => (i, s"body $i")).toDF("doc_id", "text")
    val recs = WarcReader.records(
      WarcReader.buildRedirectFixture(docs, nShards = 2), "warc")
      .filter($"warc_type" === "response" && $"http_status" === 200)
      .select($"target_uri",
        graft.operators.HtmlOps.metaRefreshUrl(decode($"payload", "UTF-8"))
          .as("mt"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(recs("https://site0.com/mm/0") == "/p/0") // k=0 one-hop meta
    assert(recs("https://site4.com/mm/4") == "/p/4")
    assert(recs("https://site1.com/m/1") == "/a/1")  // k=1 meta→301 chain head
    assert(recs("https://site0.com/p/0") == "")      // content pages: none
  }
}
