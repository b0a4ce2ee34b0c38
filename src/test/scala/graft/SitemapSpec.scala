package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Goldens for [[graft.operators.Sitemap]]: entity-decoded locs, absent
  * optional fields, index edges, and malformed blocks dropping cleanly.
  */
class SitemapSpec extends AnyFunSuite {

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

  test("urlEntries + childLocs: decode, optional fields, malformed tolerance") {
    val s = spark
    import s.implicits._
    val sm = Seq(
      ("https://a.com/sitemap.xml",
        "<?xml version=\"1.0\"?><urlset>" +
          "<url><loc> https://a.com/p?x=1&amp;y=2 </loc>" +
          "<lastmod>2025-01-02</lastmod><priority>0.8</priority></url>" +
          "<url><loc>https://a.com/q</loc></url>" + // optional fields absent
          "<url><lastmod>2024-01-01</lastmod></url>" + // no loc: dropped
          "</urlset>"),
      ("https://b.com/sitemap.xml",
        "<sitemapindex><sitemap><loc>https://b.com/s-0.xml</loc></sitemap>" +
          "<sitemap><loc>https://b.com/s-1.xml</loc></sitemap></sitemapindex>"),
      ("https://c.com/robots.txt", "not xml at all")).toDF("url", "xml")
    val entries = graft.operators.Sitemap.urlEntries(sm, "url", "xml")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(entries == Set(
      ("https://a.com/p?x=1&y=2", "2025-01-02", "0.8"),
      ("https://a.com/q", "", "")))
    val edges = graft.operators.Sitemap.childLocs(sm, "url", "xml")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges == Set(
      ("https://b.com/sitemap.xml", "https://b.com/s-0.xml"),
      ("https://b.com/sitemap.xml", "https://b.com/s-1.xml")))
  }
}
