package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6.2.2.2 percent-encoding normalization — the q269 disclosed
  * scope gap: decode exactly the escapes whose octet is UNRESERVED
  * (ALPHA / DIGIT / `-` / `.` / `_` / `~`), which never changes URL
  * semantics, and uppercase the hex of every escape that must stay
  * (§6.2.2.1) — so `%61`→`a`, `%7e`→`~`, but `%2f` (a reserved `/`)
  * becomes `%2F`, not a path separator. Iterative single pass (the
  * reason this is a native Expression, not a regex chain); a `%` not
  * followed by two hex digits passes through verbatim.
  */
case class PercentNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def unreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.indexOf('%') < 0) return input
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && hexVal(s.charAt(i + 1)) >= 0 &&
        hexVal(s.charAt(i + 2)) >= 0) {
        val b = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (unreserved(b)) sb.append(b.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): PercentNormalize =
    copy(child = newChild)

  override def prettyName: String = "percent_normalize"
}

/** RFC 3986 §5.2.4 `remove_dot_segments` — resolve `/./` and `/../`
  * inside a PATH (crawlers mostly emit resolved paths, but "mostly" at
  * 100 TB is millions of unresolved ones, and unresolved duplicates
  * defeat URL-level dedup). The spec's buffer algorithm verbatim:
  * iterative segment moves with pops, which is exactly what a regex
  * chain cannot express (each `..` pop depends on the previous state).
  */
case class RemoveDotSegments(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.indexOf('.') < 0) return input
    val out = new java.lang.StringBuilder(s.length)
    var in = s
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val cut = out.lastIndexOf("/")
        out.setLength(if (cut < 0) 0 else cut)
      } else if (in == "." || in == "..") in = ""
      else {
        // move the first segment (leading "/" plus up to the next "/")
        val from = if (in.charAt(0) == '/') 1 else 0
        val nextSlash = in.indexOf('/', from)
        val end = if (nextSlash < 0) in.length else nextSlash
        out.append(in, 0, end)
        in = in.substring(end)
      }
    }
    UTF8String.fromString(out.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): RemoveDotSegments =
    copy(child = newChild)

  override def prettyName: String = "remove_dot_segments"
}

/** Registrable domain with a PLUGGABLE public-suffix list — the
  * [[graft.operators.UrlOps.registrableDomain]] heuristic extended by the
  * FULL publicsuffix.org algorithm (a deployment loads the real PSL from
  * its data file into `suffixes`):
  *
  *   - plain rules: the LONGEST listed suffix matching the host wins
  *     (checked from most labels down — `a.b.github.io` under a list
  *     holding `github.io` yields `b.github.io`);
  *   - `*.foo` WILDCARD rules (round 15): `*` matches exactly ONE label,
  *     so under `*.ck` every `<label>.ck` is itself a public suffix and
  *     `www.foo.ck` keys to `www.foo.ck`, never pooling unrelated `.ck`
  *     sites;
  *   - `!foo.bar` EXCEPTION rules beat every other match (the PSL's
  *     step-2 precedence): under `*.ck` + `!www.ck`, `a.www.ck` keys to
  *     `www.ck` — the exception rule's own span IS the registrable
  *     domain;
  *   - a host that IS a public suffix (`foo.ck`, `x.kawasaki.jp`)
  *     returns itself — the total-function sentinel where the PSL says
  *     "no registrable domain".
  *
  * O(#labels) hash lookups per row across three pre-split sets, never a
  * per-row scan of the list. Hosts matching no listed rule fall back to
  * the built-in 2-vs-3-label ccTLD rule, so an EMPTY list reproduces the
  * q269 column expression exactly.
  */
case class RegistrableDomainPsl(child: Expression, suffixes: Set[String])
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  private val commonSld = Set("co", "com", "org", "net", "ac", "gov", "edu")

  // rule-syntax split, once per expression instance (the per-row work is
  // hash lookups only)
  private val exactSuffixes =
    suffixes.filterNot(s => s.startsWith("*.") || s.startsWith("!"))
  private val wildcardBases =
    suffixes.collect { case s if s.startsWith("*.") => s.substring(2) }
  private val exceptionRules =
    suffixes.collect { case s if s.startsWith("!") => s.substring(1) }

  override def nullSafeEval(input: Any): Any = {
    val host = input.asInstanceOf[UTF8String].toString
    val labels = host.split('.')
    val n = labels.length
    def suffix(k: Int): String = labels.takeRight(k).mkString(".")
    // 1. exception rules beat everything; the matching rule's own span
    //    is the registrable domain (PSL: "modify the rule by removing
    //    the leftmost label" → public suffix, +1 label = the rule again)
    var k = math.min(n, if (exceptionRules.isEmpty) 0 else n)
    while (k >= 1) {
      if (exceptionRules.contains(suffix(k)))
        return UTF8String.fromString(suffix(k))
      k -= 1
    }
    // 2. longest exact-or-wildcard rule; `*` consumes exactly one label
    k = n
    while (k >= 1) {
      if (exactSuffixes.contains(suffix(k)) ||
        (k >= 2 && wildcardBases.contains(suffix(k - 1)))) {
        return UTF8String.fromString(if (k == n) host else suffix(k + 1))
      }
      k -= 1
    }
    val out =
      if (n <= 2) host
      else {
        val tld = labels(n - 1)
        val sld = labels(n - 2)
        val cc = tld.length == 2 && tld.forall(c => c >= 'a' && c <= 'z')
        if (cc && commonSld.contains(sld) && n >= 3)
          s"${labels(n - 3)}.$sld.$tld"
        else s"$sld.$tld"
      }
    UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RegistrableDomainPsl =
    copy(child = newChild)

  override def prettyName: String = "registrable_domain_psl"
}
