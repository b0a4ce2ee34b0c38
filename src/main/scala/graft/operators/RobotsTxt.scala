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
  *     interop bug this pins); among matching prefix rules the LONGEST
  *     path wins, allow beating disallow on a length tie; no matching
  *     rule → allowed.
  *
  * Scope (disclosed): prefix rules only — no `*` wildcards or `$`
  * anchors inside paths (RFC 9309 §2.2.3 optional forms), no
  * `Crawl-delay`/`Sitemap` extraction, empty-path rules dropped (the
  * original REP "Disallow:" = allow-all is the no-match default here).
  */
object RobotsTxt {

  /** Exploded rule rows from (domainCol, txtCol) robots files:
    * (domain, agent, allow ∈ {0,1}, rpath). Agent tokens lowercase.
    */
  def ruleRows(robots: DataFrame, domainCol: String, txtCol: String): DataFrame = {
    val lines = robots.select(col(domainCol).as("domain"),
      posexplode(split(col(txtCol), "\n")).as(Seq("ln", "line")))
      .withColumn("lline", lower(trim(col("line"))))
      .withColumn("is_ua", col("lline").startsWith("user-agent:"))
      .withColumn("is_rule",
        col("lline").startsWith("allow:") || col("lline").startsWith("disallow:"))
    val w = Window.partitionBy(col("domain")).orderBy(col("ln"))
    val grouped = lines.withColumn("grp",
      sum(when(col("is_ua") &&
        !coalesce(lag(col("is_ua"), 1).over(w), lit(false)), 1L).otherwise(0L))
        .over(w))
    val agents = grouped.filter(col("is_ua"))
      .select(col("domain"), col("grp"),
        trim(regexp_replace(col("lline"), "^user-agent:\\s*", "")).as("agent"))
    val rules = grouped.filter(col("is_rule"))
      .select(col("domain"), col("grp"),
        when(col("lline").startsWith("allow:"), 1).otherwise(0).as("allow"),
        trim(regexp_replace(col("line"), "(?i)^\\s*(allow|disallow):\\s*", ""))
          .as("rpath"))
      .filter(col("rpath") =!= "")
    rules.join(agents, Seq("domain", "grp"))
      .select(col("domain"), col("agent"), col("allow"), col("rpath"))
  }

  /** Verdict per URL row: `urls` must expose `domainCol` and `pathCol`;
    * output appends `allowed` (0/1) and `rule_len` (length of the
    * winning rule's path, 0 when no rule matched). `agent` is OUR
    * crawler's token, lowercase.
    */
  def allowed(urls: DataFrame, rules: DataFrame, domainCol: String,
      pathCol: String, agent: String): DataFrame = {
    val hasSpecific = rules.filter(col("agent") === agent)
      .select(col("domain")).distinct()
      .withColumn("__spec", lit(true))
    val effective = rules.join(hasSpecific, Seq("domain"), "left")
      .filter(when(coalesce(col("__spec"), lit(false)),
        col("agent") === agent).otherwise(col("agent") === "*"))
      .select(col("domain"), col("allow"), col("rpath"))
    val u = urls.select(col(domainCol).as("__d"), col(pathCol).as("__p"))
      .distinct()
    val verdict = u.join(effective, col("__d") === col("domain") &&
        col("__p").startsWith(col("rpath")))
      .groupBy(col("__d"), col("__p"))
      .agg(max(struct(length(col("rpath")).as("l"), col("allow").as("a")))
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
