package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) — crawl
  * politeness as a RELATIONAL operator: the step between [[UrlOps]]'s
  * frontier curation and any fetch a 100 TB crawl issues. Everything is
  * `org.apache.spark.sql.functions` (line explode + one per-FILE window
  * + joins), so the DuckDB oracle replays the entire parse and the
  * longest-match evaluation independently — no bespoke parser state to
  * trust.
  *
  *   - [[ruleRows]]: lines → groups → (domain, agent token, allow flag,
  *     path prefix). RFC grouping: a maximal run of `User-agent:` lines
  *     opens a group; the `Allow:`/`Disallow:` lines that follow belong
  *     to every agent in that run. The group id is a running count of
  *     non-UA→UA transitions — one window per file, and robots files
  *     are spec-bounded (≤ 500 KiB), so this is the per-document window
  *     class (q17/q24), never a corpus-scaled sort.
  *   - [[allowed]]: RFC matching — the group for OUR agent is the
  *     agent-specific one when the file has it, else `*` (an ignored
  *     `*` group in the presence of a specific group is the classic
  *     interop bug this pins); among matching rules the MOST-SPECIFIC
  *     wins (most octets in the raw rule path, §2.2.2 — for pure prefix
  *     rules this is exactly longest-prefix), allow beating disallow on
  *     a tie; no matching rule → allowed.
  *   - §2.2.3 special characters (round 14): `*` in a rule path matches
  *     any character sequence, a TRAILING `$` anchors the end of the
  *     path. A rule carrying either compiles to one anchored-prefix
  *     regex (`^` + metachar-escaped body with `*`→`.*`, plus `$` when
  *     anchored) evaluated per candidate row; plain prefix rules — the
  *     overwhelming majority of real robots lines — keep the cheap
  *     `startsWith` branch. Both branches and the regex BUILD itself are
  *     relational, so the DuckDB oracle replays the compilation and the
  *     match generically.
  *   - [[sitemapRows]]: `Sitemap:` directive extraction — RFC 9309 §2.3
  *     records it as independent of any group (a `Sitemap:` line inside
  *     an agent block still applies file-wide), which is exactly how the
  *     line filter behaves here. The URLs feed q282's discovery parse.
  *
  *   - [[crawlDelayRows]]: `Crawl-delay:` extraction — NOT in RFC 9309
  *     but honored by most major crawlers; unlike `Sitemap:` it is
  *     GROUP-SCOPED (a delay inside the graftbot block applies to
  *     graftbot only), so it rides the same group join as the rules.
  *     Values parse to exact milliseconds (crawlers publish halves like
  *     `0.5`); unparsable values drop.
  *
  * Scope (disclosed): empty-path rules dropped (the original REP
  * "Disallow:" = allow-all is the no-match default here); mid-pattern
  * `$` is literal (only the trailing position is special, matching the
  * major implementations).
  */
object RobotsTxt {

  /** Lines exploded and assigned to their RFC group: (domain, ln, line,
    * lline, is_ua, grp) — grp counts non-UA→UA transitions through one
    * per-FILE window (robots files are spec-bounded ≤ 500 KiB, the
    * per-document window class).
    */
  private def groupedLines(robots: DataFrame, domainCol: String,
      txtCol: String): DataFrame = {
    val lines = robots.select(col(domainCol).as("domain"),
      posexplode(split(col(txtCol), "\n")).as(Seq("ln", "line")))
      .withColumn("lline", lower(trim(col("line"))))
      .withColumn("is_ua", col("lline").startsWith("user-agent:"))
    val w = Window.partitionBy(col("domain")).orderBy(col("ln"))
    lines.withColumn("grp",
      sum(when(col("is_ua") &&
        !coalesce(lag(col("is_ua"), 1).over(w), lit(false)), 1L).otherwise(0L))
        .over(w))
  }

  /** Agent tokens per group (lowercase) — the `User-agent:` run that
    * opened each group, shared by rules and crawl-delays.
    */
  private def agentRows(grouped: DataFrame): DataFrame =
    grouped.filter(col("is_ua"))
      .select(col("domain"), col("grp"),
        trim(regexp_replace(col("lline"), "^user-agent:\\s*", "")).as("agent"))

  /** Which agent tokens each FILE declares a group for: (domain, agent),
    * derived from the `User-agent:` runs themselves — NOT from rule rows.
    * The distinction matters for group-PRESENCE decisions ([[allowed]]'s
    * specific-suppresses-`*` election, [[crawlDelayRows]] selection): a
    * group whose only member line is `Crawl-delay:` (or one with no
    * lines at all) still EXISTS per RFC 9309 §2.2.1, and a crawler it
    * names must use it — ignoring every `*` rule — even though it
    * contributes zero rule rows.
    */
  def agentGroupRows(robots: DataFrame, domainCol: String,
      txtCol: String): DataFrame =
    agentRows(groupedLines(robots, domainCol, txtCol))
      .select(col("domain"), col("agent")).distinct()

  /** Exploded rule rows from (domainCol, txtCol) robots files:
    * (domain, agent, allow ∈ {0,1}, rpath). Agent tokens lowercase.
    */
  def ruleRows(robots: DataFrame, domainCol: String, txtCol: String): DataFrame = {
    val grouped = groupedLines(robots, domainCol, txtCol)
    val rules = grouped.filter(
      col("lline").startsWith("allow:") || col("lline").startsWith("disallow:"))
      .select(col("domain"), col("grp"),
        when(col("lline").startsWith("allow:"), 1).otherwise(0).as("allow"),
        trim(regexp_replace(col("line"), "(?i)^\\s*(allow|disallow):\\s*", ""))
          .as("rpath"))
      .filter(col("rpath") =!= "")
    rules.join(agentRows(grouped), Seq("domain", "grp"))
      .select(col("domain"), col("agent"), col("allow"), col("rpath"))
  }

  /** Group-scoped `Crawl-delay:` rows: (domain, agent, delay_ms) — the
    * value in EXACT milliseconds (`cast(double) * 1000 → long`; halves
    * like `0.5` are the published norm and stay exact); unparsable
    * values drop (never a crash, the skip-not-corrupt stance).
    */
  def crawlDelayRows(robots: DataFrame, domainCol: String,
      txtCol: String): DataFrame = {
    val grouped = groupedLines(robots, domainCol, txtCol)
    val delays = grouped.filter(col("lline").startsWith("crawl-delay:"))
      .select(col("domain"), col("grp"),
        (trim(regexp_replace(col("lline"), "^crawl-delay:\\s*", ""))
          .try_cast("double") * 1000).try_cast("long").as("delay_ms"))
      .filter(col("delay_ms").isNotNull && col("delay_ms") >= 0)
    delays.join(agentRows(grouped), Seq("domain", "grp"))
      .select(col("domain"), col("agent"), col("delay_ms"))
  }

  /** Sitemap URLs declared in (domainCol, txtCol) robots files — one row
    * per `Sitemap:` line, group-INDEPENDENT per RFC 9309 §2.3 (a line
    * inside an agent block still applies file-wide, so this is a plain
    * line filter, no group join).
    */
  def sitemapRows(robots: DataFrame, domainCol: String, txtCol: String): DataFrame =
    robots.select(col(domainCol).as("domain"),
        explode(split(col(txtCol), "\n")).as("line"))
      .filter(lower(trim(col("line"))).startsWith("sitemap:"))
      .select(col("domain"),
        trim(regexp_replace(col("line"), "(?i)^\\s*sitemap:\\s*", ""))
          .as("sitemap_url"))

  /** RFC 9309 §2.2.3 rule-path compilation: a path carrying `*` or a
    * trailing `$` becomes one anchored-prefix regex — metachars escaped,
    * `*` → `.*`, trailing `$` → end anchor. Exposed for the spec; the
    * oracle rebuilds the same regex in SQL.
    */
  private[graft] def rulePattern(rpath: Column): Column = {
    val anchored = rpath.endsWith("$")
    val body = when(anchored, rpath.substr(lit(1), length(rpath) - 1))
      .otherwise(rpath)
    concat(lit("^"),
      regexp_replace(regexp_replace(body,
        "([.\\\\+?\\[\\](){}^$|])", "\\\\$1"), "\\*", ".*"),
      when(anchored, "$").otherwise(""))
  }

  /** Verdict per URL row: `urls` must expose `domainCol` and `pathCol`;
    * output appends `allowed` (0/1) and `rule_len` (OCTET length of the
    * winning rule's RAW path — §2.2.2 measures specificity in octets,
    * not characters, which diverges exactly for non-ASCII rule paths;
    * wildcards and anchor included; 0 when no rule matched). `agent` is
    * OUR crawler's token, lowercase.
    *
    * `groups` — when given, the (domain, agent) output of
    * [[agentGroupRows]] — decides group PRESENCE for the
    * specific-suppresses-`*` election from the UA runs themselves, so a
    * rule-less group for our agent correctly suppresses the `*` rules
    * (→ everything allowed). Without it, presence falls back to the
    * rule rows (callers that only materialized [[ruleRows]]; identical
    * whenever every group carries at least one rule).
    */
  def allowed(urls: DataFrame, rules: DataFrame, domainCol: String,
      pathCol: String, agent: String,
      groups: Option[DataFrame] = None): DataFrame = {
    val hasSpecific = groups.getOrElse(rules).filter(col("agent") === agent)
      .select(col("domain")).distinct()
      .withColumn("__spec", lit(true))
    val effective = rules.join(hasSpecific, Seq("domain"), "left")
      .filter(when(coalesce(col("__spec"), lit(false)),
        col("agent") === agent).otherwise(col("agent") === "*"))
      .select(col("domain"), col("allow"), col("rpath"))
      // §2.2.3: compile wildcard/anchored rules once, rule-side (rules
      // are file-bounded; the per-row work on the URL side is the match)
      .withColumn("__ispat",
        col("rpath").contains("*") || col("rpath").endsWith("$"))
      .withColumn("__rx", rulePattern(col("rpath")))
    val u = urls.select(col(domainCol).as("__d"), col(pathCol).as("__p"))
      .distinct()
    val verdict = u.join(effective, col("__d") === col("domain") &&
        when(col("__ispat"), regexp_like(col("__p"), col("__rx")))
          .otherwise(col("__p").startsWith(col("rpath"))))
      .groupBy(col("__d"), col("__p"))
      .agg(max(struct(octet_length(col("rpath")).as("l"), col("allow").as("a")))
        .as("__win"))
      .select(col("__d"), col("__p"),
        col("__win.a").as("__allow"), col("__win.l").cast("long").as("__len"))
    urls.join(verdict,
        col(domainCol) === col("__d") && col(pathCol) === col("__p"), "left")
      .withColumn("allowed", coalesce(col("__allow"), lit(1)))
      .withColumn("rule_len", coalesce(col("__len"), lit(0L)))
      .drop("__d", "__p", "__allow", "__len")
  }
}
