package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDX(J) capture indexes — the lookup layer every web archive publishes
  * next to its WARCs (Common Crawl's `cdx-*.gz`, the Wayback Machine's
  * CDX API): one line per capture, sorted by a canonical **SURT** key so
  * all captures of one page — across hosts' `www` aliases, years, and
  * revisits — are adjacent and range-scannable. The reference has no
  * archive layer at all; at 100 TB the capture index is how a pipeline
  * finds "the latest good capture of each page" WITHOUT touching the
  * archive bytes (the index is ~1/1000th the corpus).
  *
  * All pure `Column` expressions with DuckDB twins:
  *
  *   - [[surtKey]]: Sort-friendly URI Reordering Transform of a CANONICAL
  *     http(s) URL (the output of [[UrlOps.canonicalizeUrl]]/`Full` —
  *     scheme dropped, host labels REVERSED and comma-joined, a leading
  *     `www` label dropped when one remains beneath it, any non-default
  *     port kept after the labels, then `)` + path + sorted query. Under
  *     this key `www.example.com/p` and `example.com/p` COLLIDE — the
  *     alias collapse URL-string dedup misses.
  *   - [[cdxjLine]] / [[parseCdxj]]: the CDX-J interchange form —
  *     `urlkey SP timestamp14 SP {json}` — built by concatenation
  *     (fixture fields never need JSON escaping; disclosed) and parsed
  *     back with one regexp split + a typed `from_json`, so
  *     build → parse is the identity the q285 oracle replays.
  *
  * Latest-capture selection is then one `max_by(…, ts)` aggregate per
  * urlkey (q285) — timestamp14 is lexicographically chronological by
  * construction, and the shuffle carries index rows, never payloads.
  */
object CdxOps {

  /** JSON block schema of a CDX-J line (the Common Crawl field core). */
  val CdxMetaSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", IntegerType),
    StructField("digest", StringType),
    StructField("length", LongType)))

  /** SURT key of a canonical http(s) URL (see object doc). */
  def surtKey(canonUrl: Column): Column = {
    val host = regexp_extract(canonUrl, "^[a-z]+://([^:/?]*)", 1)
    val port = regexp_extract(canonUrl, "^[a-z]+://[^/?:]*:([0-9]+)", 1)
    val tail = regexp_extract(canonUrl, "^[a-z]+://[^/?]*(.*)$", 1)
    val labels = split(host, "\\.")
    val noWww = when(element_at(labels, 1) === "www" && size(labels) > 2,
      slice(labels, 2, 1000)).otherwise(labels)
    concat(array_join(reverse(noWww), ","),
      when(port === "", "").otherwise(concat(lit(":"), port)),
      lit(")"),
      when(tail === "", "/").otherwise(tail))
  }

  /** One CDX-J line. `ts14` must be yyyyMMddHHmmss (14 digits). */
  def cdxjLine(urlkey: Column, ts14: Column, url: Column, mime: Column,
      status: Column, digest: Column, length: Column): Column =
    concat(urlkey, lit(" "), ts14,
      lit(" {\"url\":\""), url,
      lit("\",\"mime\":\""), mime,
      lit("\",\"status\":"), status.cast("string"),
      lit(",\"digest\":\""), digest,
      lit("\",\"length\":"), length.cast("string"), lit("}"))

  /** Parse a CDX-J line → struct(urlkey, ts, meta struct). */
  def parseCdxj(line: Column): Column = struct(
    regexp_extract(line, "^(\\S+) ", 1).as("urlkey"),
    regexp_extract(line, "^\\S+ ([0-9]{14}) ", 1).as("ts"),
    from_json(regexp_replace(line, "^\\S+ [0-9]{14} ", ""), CdxMetaSchema)
      .as("meta"))
}
