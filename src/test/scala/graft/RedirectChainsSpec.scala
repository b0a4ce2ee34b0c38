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
    // doc 1 (k=1): /a 301 → /p; doc 2 (k=2): /b 302 → /a2 301 → /p;
    // doc 3 (k=3): /x ↔ /y 302 loop; 200 pages carry no Location
    assert(recs("https://site1.com/a/1") ==
      ((301, "https://site1.com/p/1")))
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
}
