package org.apache.spark.sql.graft.expressions

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML numeric character references (`&#NNN;` / `&#xHH;`) decoded to
  * their FULL codepoint — the disclosed q271 scope gap: Spark's `char()`
  * is mod-256 where DuckDB's `chr()` is full-codepoint, so the general
  * decode lives in a native Expression. An iterative single pass (never
  * recursive — `&#38;#60;` yields the literal `&#60;`, the q271 amp-last
  * contract extended); references that name an invalid codepoint (0,
  * surrogates D800-DFFF, > 0x10FFFF) or overflow are left verbatim, like
  * browsers leave a bare `&`. Astral codepoints append as surrogate
  * pairs via `Character.toChars`.
  */
case class DecodeNumericRefs(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.indexOf("&#") < 0) return input
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&' && i + 2 < n && s.charAt(i + 1) == '#') {
        var j = i + 2
        val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val digStart = j
        var cp = 0L
        while (j < n && cp <= 0x110000L && {
          val d = s.charAt(j)
          if (hex) (d >= '0' && d <= '9') || (d >= 'a' && d <= 'f') || (d >= 'A' && d <= 'F')
          else d >= '0' && d <= '9'
        }) {
          val d = s.charAt(j)
          val v = if (d <= '9') d - '0' else (d | 0x20) - 'a' + 10
          cp = cp * (if (hex) 16 else 10) + v
          j += 1
        }
        val valid = j > digStart && j < n && s.charAt(j) == ';' &&
          cp >= 1 && cp <= 0x10FFFFL && !(cp >= 0xD800L && cp <= 0xDFFFL)
        if (valid) { sb.append(Character.toChars(cp.toInt)); i = j + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeNumericRefs =
    copy(child = newChild)

  override def prettyName: String = "decode_numrefs"
}

/** Shared charset-resolution logic for crawl payload bytes: the HTTP
  * `Content-Type` charset parameter wins; else a `<meta charset=…>` or
  * `<meta http-equiv="Content-Type" content="…charset=…">` sniff over
  * the first 1024 bytes (the WHATWG prescan window, ASCII-superset
  * decoded); else a UTF-8 BOM; else UTF-8 — with the WHATWG-style
  * fallback that a payload which fails STRICT UTF-8 decoding re-decodes
  * as windows-1252 (the superset of ISO-8859-1 real mislabeled pages
  * actually are). Labels normalize: `latin-?1`/`iso-8859-1`/`l1` →
  * iso-8859-1, `windows-1252`/`cp1252` → windows-1252, `utf-?8` → utf-8;
  * unknown labels fall through to the sniff chain.
  */
object CharsetSniff {

  private val MetaCharsetRe =
    """(?i)<meta[^>]*\bcharset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""".r

  def normalize(label: String): Option[String] =
    label.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "utf-8" | "utf8" => Some("utf-8")
      case "iso-8859-1" | "iso8859-1" | "latin1" | "latin-1" | "l1" => Some("iso-8859-1")
      case "windows-1252" | "cp1252" | "x-cp1252" => Some("windows-1252")
      case "us-ascii" | "ascii" => Some("us-ascii")
      case _ => None
    }

  private def fromContentType(ct: String): Option[String] = {
    val i = ct.toLowerCase(java.util.Locale.ROOT).indexOf("charset=")
    if (i < 0) None
    else normalize(ct.substring(i + 8).takeWhile(c => c != ';' && c != ' ')
      .stripPrefix("\"").stripSuffix("\""))
  }

  private def fromMeta(bytes: Array[Byte]): Option[String] = {
    val head = new String(bytes, 0, math.min(1024, bytes.length),
      StandardCharsets.ISO_8859_1)
    MetaCharsetRe.findFirstMatchIn(head).flatMap(m => normalize(m.group(1)))
  }

  private def strictUtf8(bytes: Array[Byte], from: Int): Option[String] =
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(bytes, from, bytes.length - from)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => None }

  /** (resolved charset label, decoded text). */
  def decode(bytes: Array[Byte], contentType: String): (String, String) = {
    val declared = fromContentType(contentType).orElse(fromMeta(bytes))
    declared match {
      case Some(cs) =>
        val from = if (cs == "utf-8" && bytes.length >= 3 &&
          (bytes(0) & 0xFF) == 0xEF && (bytes(1) & 0xFF) == 0xBB &&
          (bytes(2) & 0xFF) == 0xBF) 3 else 0
        (cs, new String(bytes, from, bytes.length - from, Charset.forName(cs)))
      case None =>
        if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
          (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
          ("utf-8", strictUtf8(bytes, 3).getOrElse(
            new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8)))
        else strictUtf8(bytes, 0) match {
          case Some(txt) => ("utf-8", txt)
          case None => ("windows-1252",
            new String(bytes, Charset.forName("windows-1252")))
        }
    }
  }
}

/** The charset label [[CharsetSniff]] resolves for `(payload bytes,
  * http content-type)` — disclosed next to the decoded text so curation
  * can census mislabeled-encoding rates across a crawl.
  */
case class SniffHtmlCharset(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(bin: Any, ct: Any): Any =
    UTF8String.fromString(CharsetSniff.decode(
      bin.asInstanceOf[Array[Byte]], ct.asInstanceOf[UTF8String].toString)._1)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SniffHtmlCharset =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sniff_charset"
}

/** Payload bytes → text through the full [[CharsetSniff]] chain — the
  * decode step that must run AHEAD of [[graft.operators.HtmlOps]]
  * `visibleText` on a real crawl (a third of which is not UTF-8).
  */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(bin: Any, ct: Any): Any =
    UTF8String.fromString(CharsetSniff.decode(
      bin.asInstanceOf[Array[Byte]], ct.asInstanceOf[UTF8String].toString)._2)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharsetDecode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "charset_decode"
}
