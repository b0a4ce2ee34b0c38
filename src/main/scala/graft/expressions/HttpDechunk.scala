package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

/** HTTP/1.1 chunked transfer-coding decode (RFC 9112 §7.1) — the framing
  * a large share of archived HTTP payloads still wear INSIDE WARC
  * response records (the WARC block stores the message as sent, so
  * `Transfer-Encoding: chunked` bodies arrive as hex-size-prefixed
  * chunks, and text extraction on the raw block sees size lines spliced
  * into the middle of the markup). This is the decode step between the
  * WARC record walk's HTTP split and every payload consumer.
  *
  * Strict walker over the byte array (binary in, binary out; bytes never
  * leave their scan task):
  *
  *   chunk      = chunk-size [";" ext] CRLF chunk-data CRLF
  *   last-chunk = "0" [";" ext] CRLF trailer-lines CRLF
  *
  * Chunk extensions are skipped, trailer fields are consumed and
  * discarded (RFC 9112 §7.1.2 — a consumer that ignores trailers), and
  * any framing violation — truncated data, missing CRLF, non-hex size,
  * missing terminator — returns NULL rather than a partial body, so a
  * corpus pass can census malformed framings with one `isNull` filter
  * (the `coalesce`-and-flag contract the PDF/container walks use).
  */
case class HttpDechunk(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HttpDechunk.dechunk(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): HttpDechunk =
    copy(child = newChild)

  override def prettyName: String = "http_dechunk"
}

object HttpDechunk {

  /** The walker itself — shared with [[graft.sources.WarcReader]]'s HTTP
    * split, which dechunks `Transfer-Encoding: chunked` blocks inline.
    * Returns null on any framing violation.
    */
  def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    def crlf(): Boolean = {
      if (i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n') { i += 2; true }
      else false
    }
    while (true) {
      // chunk-size: 1*HEXDIG. RFC 9112 allows any number of leading
      // zeros ("0000000000000005" is a legal 5), so only SIGNIFICANT
      // digits count toward the overflow guard; nz tracks that at least
      // one digit (even a zero) was present at all.
      var size = 0L
      var nd = 0
      var nz = 0
      while (i < b.length && Character.digit(b(i).toChar, 16) >= 0 && nd <= 15) {
        val d = Character.digit(b(i).toChar, 16)
        if (size != 0L || d != 0) nd += 1
        size = size * 16 + d; i += 1; nz += 1
      }
      if (nz == 0 || nd > 15) return null
      // optional chunk extension: everything up to CR
      if (i < b.length && b(i) == ';') {
        while (i < b.length && b(i) != '\r') i += 1
      }
      if (!crlf()) return null
      if (size == 0) {
        // trailer lines until the empty line
        while (!crlf()) {
          if (i >= b.length) return null
          while (i < b.length && b(i) != '\r') i += 1
          if (!crlf()) return null
        }
        return out.toByteArray
      }
      if (size > Int.MaxValue || i + size > b.length) return null
      out.write(b, i, size.toInt)
      i += size.toInt
      if (!crlf()) return null
    }
    null // unreachable
  }
}
