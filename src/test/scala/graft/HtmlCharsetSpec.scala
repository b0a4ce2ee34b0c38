package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.expressions.{CharsetSniff, DecodeNumericRefs}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** Unit goldens for the q274 surface: full-codepoint numeric-reference
  * decoding (validity rules, non-recursion) and the WHATWG-order charset
  * resolution (HTTP param → meta prescan → BOM → strict-UTF-8-else-1252).
  */
class HtmlCharsetSpec extends AnyFunSuite {

  private def numrefs(s: String): String =
    DecodeNumericRefs(Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType))
      .eval(null).asInstanceOf[UTF8String].toString

  test("DecodeNumericRefs: decimal, hex, astral; invalid codepoints and malformed refs verbatim; non-recursive") {
    assert(numrefs("a&#65;b") == "aAb")
    assert(numrefs("&#233;") == "é")
    assert(numrefs("&#xA9;&#XA9;") == "©©") // case-insensitive x and hex digits
    assert(numrefs("&#x1F600;") == "😀") // astral → surrogate pair
    assert(numrefs("&#xD800;") == "&#xD800;") // surrogate cp invalid
    assert(numrefs("&#0;") == "&#0;") // NUL invalid
    assert(numrefs("&#1114112;") == "&#1114112;") // > 0x10FFFF
    assert(numrefs("&#99999999999999;") == "&#99999999999999;") // overflow-guarded
    assert(numrefs("&#65") == "&#65") // missing semicolon
    assert(numrefs("&#;&#x;") == "&#;&#x;") // no digits
    assert(numrefs("&#x41;&#66;C") == "ABC")
    // the q274 probe: an & that is itself escaped is NOT a ref start
    assert(numrefs("&amp;#60;") == "&amp;#60;")
    assert(numrefs("no refs at all") == "no refs at all")
  }

  test("CharsetSniff: HTTP param beats meta, meta beats fallback; unlabeled strict-UTF-8 else windows-1252; BOM stripped") {
    import java.nio.charset.Charset
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    val metaPage = "<html><head><meta charset=\"windows-1252\"><body>“q”"
    // HTTP header wins over the meta tag
    val (cs1, txt1) = CharsetSniff.decode(metaPage.getBytes(ISO_8859_1),
      "text/html; charset=ISO-8859-1")
    assert(cs1 == "iso-8859-1" && !txt1.contains('“'))
    // meta tag wins when the header has no charset param
    val (cs2, txt2) = CharsetSniff.decode(
      metaPage.getBytes(Charset.forName("windows-1252")), "text/html")
    assert(cs2 == "windows-1252" && txt2.contains("“q”"))
    // unlabeled valid UTF-8 → utf-8
    val (cs3, txt3) = CharsetSniff.decode("café 😀".getBytes(UTF_8), "text/html")
    assert(cs3 == "utf-8" && txt3 == "café 😀")
    // unlabeled NON-UTF-8 bytes (0x93 is a bare continuation byte) → 1252
    val (cs4, txt4) = CharsetSniff.decode(
      "“quote”".getBytes(Charset.forName("windows-1252")), "text/html")
    assert(cs4 == "windows-1252" && txt4 == "“quote”")
    // UTF-8 BOM: recognized, stripped from the text
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    val (cs5, txt5) = CharsetSniff.decode(bom ++ "hé".getBytes(UTF_8), "text/html")
    assert(cs5 == "utf-8" && txt5 == "hé")
    // unknown label falls through to the sniff chain (here: valid utf-8)
    val (cs6, _) = CharsetSniff.decode("plain".getBytes(UTF_8),
      "text/html; charset=klingon-9")
    assert(cs6 == "utf-8")
  }
}
