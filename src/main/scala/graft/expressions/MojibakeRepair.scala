package org.apache.spark.sql.graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — undo the web's commonest encoding accident: UTF-8
  * bytes decoded as Windows-1252 somewhere upstream, so "café" arrives as
  * "cafÃ©" and "—" as "â€”". At crawl scale this is endemic (scrapers,
  * legacy CMSes, double-converting proxies), it poisons tokenization and
  * dedup (the damaged and clean copies of one page stop colliding), and
  * it is mechanically reversible: re-ENCODE the text as Windows-1252 and
  * strictly re-DECODE the bytes as UTF-8 (the ftfy heuristic,
  * https://ftfy.readthedocs.io — "encode as what it was wrongly decoded
  * as, decode as what it really was").
  *
  * The inverse only applies when it provably round-trips:
  *
  *   - every char must encode to Windows-1252 (both coders REPORT, never
  *     replace — a char outside cp1252 means the text was never a cp1252
  *     mis-decode, e.g. already-correct "日本語" or emoji);
  *   - the resulting bytes must be STRICT valid UTF-8 with at least one
  *     multi-byte sequence (pure-ASCII round-trips are the identity and
  *     return the input unchanged; genuine Latin-1 text like "café"
  *     encodes to 0xE9 which is invalid UTF-8 → unchanged).
  *
  * The accidental-valid-UTF-8 false-positive class ("Ã©" as INTENDED
  * text) is the same residual ftfy accepts: real text virtually never
  * places U+00C3 before a combining-range char. Repair iterates to a
  * fixpoint (≤3 rounds) so DOUBLE mojibake ("ÃƒÂ©") unwinds fully.
  * Cp1252's five unmapped code points (0x81 8D 8F 90 9D) pass through as
  * the matching C1 controls in Java's codec, so mixed latin-1/cp1252
  * damage still reverses.
  */
case class MojibakeRepair(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  @transient private lazy val cp1252 = Charset.forName("windows-1252")

  /** One inverse step, or null when the text is not cp1252-mojibake. */
  private def unwindOnce(s: String): String = {
    var hasHigh = false
    var i = 0
    while (i < s.length && !hasHigh) { if (s.charAt(i) >= 0x80) hasHigh = true; i += 1 }
    if (!hasHigh) return null // pure ASCII: nothing to repair
    try {
      val enc = cp1252.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val bytes = enc.encode(java.nio.CharBuffer.wrap(s))
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val out = dec.decode(bytes.duplicate()).toString
      // strict UTF-8 decode succeeded; multi-byte shrinkage is implied by
      // hasHigh (a high byte inside valid UTF-8 is part of a multi-byte
      // sequence), but an equal-length result means ASCII-only → identity
      if (out == s) null else out
    } catch {
      case _: CharacterCodingException => null
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val s0 = input.asInstanceOf[UTF8String].toString
    var s = s0
    var rounds = 0
    var next = unwindOnce(s)
    while (next != null && rounds < 3) { s = next; rounds += 1; next = unwindOnce(s) }
    if (rounds == 0) input else UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(newChild: Expression): MojibakeRepair =
    copy(child = newChild)

  override def prettyName: String = "mojibake_repair"
}
