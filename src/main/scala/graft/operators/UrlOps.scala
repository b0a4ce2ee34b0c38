package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.graft.expressions.{PercentNormalize, RegistrableDomainPsl, RemoveDotSegments}

/** URL curation — the stage every web-crawl training pipeline runs before
  * any text ever loads (the reference ingests a hand-typed URL list,
  * `pipeline1.py:922`; a 100 TB crawl ingests billions and must dedupe /
  * cap them BY URL first, when each row is still ~100 bytes):
  *
  *   - [[canonicalizeUrl]]: scheme+host lowercased, default ports (80/443)
  *     stripped, fragments dropped, duplicate path slashes collapsed and
  *     the trailing slash trimmed (root keeps its `/`), tracking query
  *     params (`utm_*`, `fbclid`, `gclid`) removed and the survivors
  *     SORTED — the standard canonical form under which syndicated copies
  *     of one page collide. Entirely `org.apache.spark.sql.functions`
  *     (regexp + higher-order array ops — whole-stage codegen, no UDF),
  *     and every step has a DuckDB twin, so the q269 oracle re-derives
  *     the canonical form independently.
  *   - [[registrableDomain]]: the per-site cap key — last two host labels,
  *     or three when the TLD is a two-letter country code behind a common
  *     second-level suffix (`co`/`com`/`org`/`net`/`ac`/`gov`/`edu` — the
  *     public-suffix rule that matters at corpus scale; the full PSL is a
  *     data file a deployment drops in the same expression).
  *
  * Round 13 closes the round-12 scope gaps: [[canonicalizeUrlFull]] adds
  * RFC 3986 §6.2.2.2 percent-normalization (decode unreserved escapes,
  * uppercase the rest) and §5.2.4 dot-segment resolution — both
  * iterative, so native Expressions ([[org.apache.spark.sql.graft
  * .expressions.PercentNormalize]] / `RemoveDotSegments`) — and
  * [[registrableDomainPsl]] takes an explicit public-suffix list (the
  * real PSL is a data file a deployment loads into it; longest-suffix
  * hash lookups, empty list ≡ the heuristic).
  *
  * Per-domain caps (q270) then ride [[Batching.groupedRowNumber]]: rank
  * docs inside each registrable domain by salted md5 and keep the first
  * `cap` — one range exchange even when one domain owns half the crawl
  * (the q139 stratum-skew argument applied to domains, which are the
  * heaviest-skewed key in any real crawl).
  */
object UrlOps {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid)="

  /** Canonical form of an absolute http(s) URL (see object doc). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(afterScheme, "^([^/?]*)", 1)
    val tail = substring(afterScheme, length(hostPort) + 1, lit(1000000))
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val defPort = when(scheme === "http", "80")
      .when(scheme === "https", "443").otherwise("")
    val portPart = when(port === "" || port === defPort, "")
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(tail, "^([^?]*)", 1)
    val rawQuery = when(instr(tail, "?") > 0,
      regexp_replace(tail, "^[^?]*\\?", "")).otherwise(lit(""))
    // collapse duplicate slashes, trim the trailing slash (root keeps it)
    val path = regexp_replace(
      when(rawPath === "", "/").otherwise(regexp_replace(rawPath, "/{2,}", "/")),
      "(.)/$", "$1")
    val params = filter(split(rawQuery, "&"),
      p => !(p.rlike(TrackingParam) || p === ""))
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, portPart, path,
      when(query === "", "").otherwise(concat(lit("?"), query)))
  }

  /** [[canonicalizeUrl]] plus the round-13 steps: percent-normalize the
    * path and query (decode-unreserved happens BEFORE dot-segment
    * resolution, so an escaped `%2E%2E` segment resolves like a literal
    * `..` — the WHATWG path-parse order), resolve `/./`‖`/../`, then the
    * same trailing-slash trim. Query params percent-normalize as one
    * string before splitting — `&`/`=` are reserved octets the decode
    * never produces, so param boundaries cannot shift.
    */
  def canonicalizeUrlFull(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(afterScheme, "^([^/?]*)", 1)
    val tail = substring(afterScheme, length(hostPort) + 1, lit(1000000))
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val defPort = when(scheme === "http", "80")
      .when(scheme === "https", "443").otherwise("")
    val portPart = when(port === "" || port === defPort, "")
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(tail, "^([^?]*)", 1)
    val rawQuery = when(instr(tail, "?") > 0,
      regexp_replace(tail, "^[^?]*\\?", "")).otherwise(lit(""))
    val collapsed =
      when(rawPath === "", "/").otherwise(regexp_replace(rawPath, "/{2,}", "/"))
    val resolved = removeDotSegments(percentNormalize(collapsed))
    val path = regexp_replace(resolved, "(.)/$", "$1")
    val params = filter(split(percentNormalize(rawQuery), "&"),
      p => !(p.rlike(TrackingParam) || p === ""))
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, portPart, path,
      when(query === "", "").otherwise(concat(lit("?"), query)))
  }

  /** RFC 3986 §6.2.2 percent-encoding normalization (native Expression). */
  def percentNormalize(c: Column): Column =
    Bridge.toColumn(PercentNormalize(Bridge.toExpr(c)))

  /** RFC 3986 §5.2.4 remove_dot_segments (native Expression). */
  def removeDotSegments(path: Column): Column =
    Bridge.toColumn(RemoveDotSegments(Bridge.toExpr(path)))

  /** Registrable domain under an explicit public-suffix list (longest
    * listed suffix wins; empty list reproduces [[registrableDomain]]).
    */
  def registrableDomainPsl(host: Column, suffixes: Set[String]): Column =
    Bridge.toColumn(RegistrableDomainPsl(Bridge.toExpr(host), suffixes))

  /** The VENDORED public-suffix snapshot (round 14): a curated subset of
    * the PSL (publicsuffix.org, MPL-2.0) shipped as a resource data
    * file — multi-label suffixes (`co.jp`, `com.au`, `co.uk`, …) plus
    * the high-traffic private-section hosts (`github.io`,
    * `blogspot.com`). Every domain-keyed query (q270 caps, q295 priors,
    * q297 traps) routes through [[registrableDomainPsl]] with THIS set,
    * so `a.site.co.jp` and `b.site.co.jp` key to `site.co.jp` instead of
    * the heuristic's `co.jp` (which would have merged every Japanese
    * commercial host into one cap bucket). A deployment swaps the file
    * for the full current list; since round 15 the FULL PSL rule syntax
    * applies — plain suffixes, `*.` wildcards (one label: `www.foo.ck`
    * keys to itself under `*.ck`), and `!` exceptions (`a.www.ck` keys
    * to `www.ck` under `!www.ck`) — and the snapshot ships the
    * wildcard/exception TLD blocks. Loaded once per JVM; executors
    * resolve it from the application jar like any classpath resource.
    */
  lazy val pslSnapshot: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "public_suffix_snapshot.dat missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toSet
    finally in.close()
  }

  /** URL spam class under a token lexicon — the UT1-blocklist-style URL
    * filter every large-scale curation pipeline runs FIRST (RefinedWeb /
    * FineWeb stage 1): it fires before any fetch, on ~100-byte rows, and
    * removes the adult/gambling/pharma tail at near-zero cost. Returns
    * the first matching lexicon token, or "clean"; matching is
    * boundary-aware (the token must start and end at a URL delimiter
    * `/ . - _ ? = &` or a string edge in the lowercased URL), so
    * `class` never fires on `classic`. The lexicon ships as a data file
    * in deployment — the argument here, like the PSL.
    *
    * Shape bound: one `when(rlike)` per token means an O(N)-deep Catalyst
    * expression with N regex passes per row — fine for the tens-of-tokens
    * category lexicons it is built for, wrong for a full UT1 blocklist
    * (tens of thousands). Past ~64 tokens use [[urlSpamClassLarge]]: one
    * alternation regex, one pass, at the cost of the tie-break changing
    * from lexicon order to leftmost-in-URL.
    */
  def urlSpamClass(url: Column, lexicon: Seq[String]): Column = {
    require(lexicon.size <= 64,
      s"urlSpamClass chains one regex per token (${lexicon.size} given); " +
        "use urlSpamClassLarge for big lexicons")
    val lo = lower(url)
    val d = "[/.\\-_?=&]"
    lexicon.foldRight(lit("clean"): Column) { (tok, acc) =>
      when(lo.rlike("(^|" + d + ")" + java.util.regex.Pattern.quote(tok) +
        "(" + d + "|$)"), tok).otherwise(acc)
    }
  }

  /** [[urlSpamClass]] for large lexicons (UT1 scale): ALL tokens compile
    * into ONE alternation regex evaluated in a single `regexp_extract`
    * pass, so plan depth and per-row cost are O(1) in lexicon size.
    * Same boundary contract; the tie-break differs — the LEFTMOST
    * matching token in the URL wins (regex semantics), not the first in
    * lexicon order, which is the right answer anyway when the lexicon is
    * an unordered blocklist.
    */
  def urlSpamClassLarge(url: Column, lexicon: Seq[String]): Column = {
    require(lexicon.nonEmpty, "empty lexicon")
    val d = "[/.\\-_?=&]"
    val alt = lexicon.map(java.util.regex.Pattern.quote).mkString("|")
    val hit = regexp_extract(lower(url), "(?:^|" + d + ")(" + alt + ")(?:" + d + "|$)", 1)
    when(hit === "", "clean").otherwise(hit)
  }

  /** Registrable domain of a lowercase host (see object doc). */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val tld = element_at(labels, -1)
    val sld = element_at(labels, -2)
    val multiLabelSuffix = tld.rlike("^[a-z]{2}$") &&
      sld.isin("co", "com", "org", "net", "ac", "gov", "edu")
    when(n <= 2, host)
      .when(multiLabelSuffix && n >= 3,
        concat_ws(".", element_at(labels, -3), sld, tld))
      .otherwise(concat_ws(".", sld, tld))
  }
}
