package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** RFC 9309 goldens for [[graft.operators.RobotsTxt]]: group runs,
  * specific-agent suppression of `*`, longest-match, allow-tiebreak,
  * the no-rule default, and multi-UA group sharing.
  */
class RobotsTxtSpec extends AnyFunSuite {

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

  test("parse + evaluate: RFC semantics end-to-end") {
    val s = spark
    import s.implicits._
    val robots = Seq(
      ("a.com",
        "User-agent: *\nDisallow: /x\nAllow: /x/ok\nDisallow: /t\nAllow: /t\n" +
          "\nUser-agent: graftbot\nUser-agent: otherbot\nDisallow: /g\n"),
      ("b.com", "User-agent: *\nDisallow: /\n"),
      ("c.com", "# comments only\n")).toDF("domain", "txt")
    val rules = graft.operators.RobotsTxt.ruleRows(robots, "domain", "txt")
    // multi-UA run shares its rules across both agents
    assert(rules.filter($"domain" === "a.com" && $"rpath" === "/g")
      .select($"agent").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("graftbot", "otherbot"))
    val urls = Seq(
      ("a.com", "/x/deep"), // '*' blocked… but a.com names graftbot → allowed
      ("a.com", "/g/sub"),  // graftbot group: blocked
      ("a.com", "/t"),      // would be the tie case under '*', but suppressed
      ("b.com", "/any"),    // '*' Disallow: / → blocked
      ("c.com", "/free"))   // no rules at all → allowed
      .toDF("domain", "path")
    val got = graft.operators.RobotsTxt
      .allowed(urls, rules, "domain", "path", "graftbot")
      .select($"domain", $"path", $"allowed", $"rule_len")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getLong(3))).toMap
    assert(got(("a.com", "/x/deep")) == (1, 0L)) // * group suppressed entirely
    assert(got(("a.com", "/g/sub")) == (0, 2L))
    assert(got(("a.com", "/t")) == (1, 0L))
    assert(got(("b.com", "/any")) == (0, 1L))
    assert(got(("c.com", "/free")) == (1, 0L))
    // generic agent on a.com: longest match and the allow-tie
    val gen = graft.operators.RobotsTxt
      .allowed(Seq(("a.com", "/x/ok/1"), ("a.com", "/x/other"), ("a.com", "/t/z"))
        .toDF("domain", "path"), rules, "domain", "path", "nobody")
      .select($"path", $"allowed", $"rule_len")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(gen("/x/ok/1") == (1, 5L)) // /x/ok beats /x
    assert(gen("/x/other") == (0, 2L))
    assert(gen("/t/z") == (1, 2L)) // equal length: allow wins
  }

  test("§2.2.3 wildcards and end anchor: *, trailing $, specificity by raw octets, regex metachars literal") {
    val s = spark
    import s.implicits._
    val robots = Seq(
      ("w.com",
        "User-agent: *\nDisallow: /*.pdf$\nAllow: /cal/*/view\nDisallow: /cal/\n" +
          "Disallow: /a*b\nDisallow: /lit.x\n")).toDF("domain", "txt")
    val rules = graft.operators.RobotsTxt.ruleRows(robots, "domain", "txt")
    val urls = Seq(
      "/files/doc1.pdf",   // blocked by /*.pdf$ (anchor hits)
      "/files/doc1.pdfx",  // anchor misses → allowed
      "/x.pdf",            // blocked (wildcard matches the empty middle too? no — '/' then anything then '.pdf': 'x' counts)
      "/cal/7/view",       // Allow /cal/*/view (11) beats Disallow /cal/ (5)
      "/cal/7/view/sub",   // prefix semantics: the allow pattern still matches
      "/cal/7/edit",       // only /cal/ matches → blocked
      "/a-anything-b/tail",// /a*b wildcard mid-pattern
      "/litYx",            // '.' must be LITERAL after escaping → no match → allowed
      "/lit.x")            // exact literal → blocked
      .map(("w.com", _)).toDF("domain", "path")
    val got = graft.operators.RobotsTxt
      .allowed(urls, rules, "domain", "path", "graftbot")
      .select($"path", $"allowed", $"rule_len")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got("/files/doc1.pdf") == (0, 7L)) // raw octets incl * and $
    assert(got("/files/doc1.pdfx") == (1, 0L))
    assert(got("/x.pdf") == (0, 7L))
    assert(got("/cal/7/view") == (1, 11L))
    assert(got("/cal/7/view/sub") == (1, 11L))
    assert(got("/cal/7/edit") == (0, 5L))
    assert(got("/a-anything-b/tail") == (0, 4L))
    assert(got("/litYx") == (1, 0L))
    assert(got("/lit.x") == (0, 6L))
  }

  test("§2.2.2 specificity is measured in OCTETS, not characters") {
    val s = spark
    import s.implicits._
    // `/n/éé*` is 6 chars / 8 octets; `/n/*xy` is 6 chars / 6 octets. By
    // characters they TIE (allow would win); by octets the disallow is
    // strictly more specific — the RFC's rule — so the path is blocked.
    val robots = Seq(
      ("o.com", "User-agent: *\nDisallow: /n/éé*\nAllow: /n/*xy\n"))
      .toDF("domain", "txt")
    val rules = graft.operators.RobotsTxt.ruleRows(robots, "domain", "txt")
    val got = graft.operators.RobotsTxt
      .allowed(Seq(("o.com", "/n/éé9xy")).toDF("domain", "path"),
        rules, "domain", "path", "graftbot")
      .select($"allowed", $"rule_len").head
    assert((got.getInt(0), got.getLong(1)) == (0, 8L))
  }

  test("group PRESENCE comes from UA runs: a rule-less graftbot group suppresses `*` wholesale") {
    val s = spark
    import s.implicits._
    val robots = Seq(
      // graftbot group holds ONLY a Crawl-delay line — zero rules — yet
      // it EXISTS, so graftbot must ignore the `*` rules entirely
      ("d.com", "User-agent: *\nDisallow: /\nCrawl-delay: 2\n" +
        "\nUser-agent: graftbot\nCrawl-delay: 3\n"),
      // control: no graftbot group → `*` applies
      ("e.com", "User-agent: *\nDisallow: /\n")).toDF("domain", "txt")
    val rules = graft.operators.RobotsTxt.ruleRows(robots, "domain", "txt")
    val groups = graft.operators.RobotsTxt.agentGroupRows(robots, "domain", "txt")
    assert(groups.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      Seq(("d.com", "*"), ("d.com", "graftbot"), ("e.com", "*")))
    val got = graft.operators.RobotsTxt
      .allowed(Seq(("d.com", "/p"), ("e.com", "/p")).toDF("domain", "path"),
        rules, "domain", "path", "graftbot", groups = Some(groups))
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(got("d.com") == 1) // our (rule-less) group wins wholesale
    assert(got("e.com") == 0)
    // without the groups frame, presence degrades to rule rows — the
    // legacy behavior this overload exists to correct
    val legacy = graft.operators.RobotsTxt
      .allowed(Seq(("d.com", "/p")).toDF("domain", "path"),
        rules, "domain", "path", "graftbot")
      .head.getInt(2)
    assert(legacy == 0)
    // and the delay selection keyed on the same presence picks 3000 ms
    val delays = graft.operators.RobotsTxt.crawlDelayRows(robots, "domain", "txt")
    assert(delays.filter($"domain" === "d.com" && $"agent" === "graftbot")
      .head.getLong(2) == 3000L)
  }

  test("crawlDelayRows: group-scoped, exact milliseconds, unparsable values drop") {
    val s = spark
    import s.implicits._
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n" +
        "User-agent: graftbot\nCrawl-delay: 0.5\nAllow: /\n"),
      ("b.com", "User-agent: *\nCrawl-delay: nonsense\nDisallow: /\n"),
      ("c.com", "User-agent: *\nDisallow: /\n")).toDF("domain", "txt")
    val got = graft.operators.RobotsTxt.crawlDelayRows(robots, "domain", "txt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    // b.com's unparsable value drops; c.com has none; a.com has one per group
    assert(got == Seq(("a.com", "*", 2000L), ("a.com", "graftbot", 500L)))
  }

  test("Sitemap: directive is group-independent and extraction preserves the URL verbatim") {
    val s = spark
    import s.implicits._
    val robots = Seq(
      ("a.com", "Sitemap: https://a.com/s.xml\nUser-agent: *\nDisallow: /x\n" +
        "User-agent: bot\nAllow: /\nSitemap: https://a.com/inside-group.xml\n"),
      ("b.com", "User-agent: *\nDisallow: /\n")).toDF("domain", "txt")
    val got = graft.operators.RobotsTxt.sitemapRows(robots, "domain", "txt")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == Seq(
      ("a.com", "https://a.com/inside-group.xml"),
      ("a.com", "https://a.com/s.xml")))
  }
}
