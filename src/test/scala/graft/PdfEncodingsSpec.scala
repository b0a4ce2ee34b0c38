package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PdfEncodings, PdfTextExtractor}

/** Simple-font (non-composite) encoding fidelity: WinAnsi's cp1252
  * punctuation block, MacRoman's high block, and `/Differences` arrays
  * resolved through glyph names — each exercised end-to-end through
  * `extract` on inline fixture PDFs, plus unit goldens for the name
  * resolver. The WinAnsi/MacRoman goldens are cross-checked against the
  * JVM's OWN charset tables (windows-1252, x-MacRoman) — an independent
  * implementation of the same published encodings.
  */
class PdfEncodingsSpec extends AnyFunSuite {

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes("ISO-8859-1")); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** One-page PDF showing `codes` (raw bytes, as a hex string) through a
    * /TrueType font whose /Encoding is given verbatim (name, inline
    * dict, or `9 0 R` with `encObj` as the referenced dictionary body).
    */
  private def simplePdf(codes: Seq[Int], encoding: String,
      encObj: Option[String] = None): Array[Byte] = {
    val hex = codes.map(c => f"$c%02X").mkString
    val content = s"BT /F1 12 Tf <$hex> Tj ET"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n")
    val enc = if (encoding.isEmpty) "" else s" /Encoding $encoding"
    w(s"4 0 obj << /Type /Font /Subtype /TrueType /BaseFont /GraftSimple$enc >> endobj\n")
    val cz = deflate(content)
    w(s"5 0 obj << /Length ${cz.length} /Filter /FlateDecode >>\nstream\n")
    out.write(cz)
    w("\nendstream\nendobj\n")
    encObj.foreach(b => w(s"9 0 obj $b endobj\n"))
    w("%%EOF\n")
    out.toByteArray
  }

  test("WinAnsi tables agree with the JVM's windows-1252 decoder byte-for-byte") {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    val table = PdfEncodings.baseTable("WinAnsiEncoding")
    (0x20 to 0xFF).foreach { b =>
      val jvm = new String(Array(b.toByte), cs)
      // cp1252's five undefined codes decode as U+FFFD in the JVM and as
      // dropped ("") here — both refuse to invent a glyph
      if (jvm != "�")
        assert(table(b) == jvm, f"0x$b%02X: ours='${table(b)}' jvm='$jvm'")
      else assert(table(b) == "", f"0x$b%02X should be undefined")
    }
  }

  test("MacRoman tables agree with the JVM's x-MacRoman decoder byte-for-byte") {
    val cs = java.nio.charset.Charset.forName("x-MacRoman")
    val table = PdfEncodings.baseTable("MacRomanEncoding")
    (0x20 to 0xFF).foreach { b =>
      val jvm = new String(Array(b.toByte), cs)
      // two documented PDF-vs-charset divergences: Annex D keeps 0xDB
      // 'currency' where Mac OS 8.5+'s revision (and the JVM charset)
      // put the euro, and maps 0xCA to plain 'space' where the charset
      // has U+00A0. Math/symbol slots Annex D omits are "" in our table
      // and skipped by the nonEmpty guard — dropped, never guessed.
      if (b == 0xDB) assert(table(b) == "¤")
      else if (b == 0xCA) assert(table(b) == " ")
      else if (table(b).nonEmpty)
        assert(table(b) == jvm, f"0x$b%02X: ours='${table(b)}' jvm='$jvm'")
    }
    // and the omissions are exactly the math/symbol block, not typos
    val omitted = (0x80 to 0xFF).filter(table(_).isEmpty)
    assert(omitted == Seq(0xAD, 0xB2, 0xB3, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA,
      0xBD, 0xC3, 0xC5, 0xC6, 0xD7, 0xF0),
      s"omitted: ${omitted.map(b => f"0x$b%02X")}")
  }

  test("glyph names: algorithmic uniXXXX/uXXXXXX, single chars, AGL subset, unknown drops") {
    assert(PdfEncodings.glyphName("uni4E2D").contains("中"))
    assert(PdfEncodings.glyphName("u1F600").contains("😀"))
    assert(PdfEncodings.glyphName("uniD800").isEmpty) // lone surrogate refused
    assert(PdfEncodings.glyphName("a").contains("a"))
    assert(PdfEncodings.glyphName("eacute").contains("é"))
    assert(PdfEncodings.glyphName("Euro").contains("€"))
    assert(PdfEncodings.glyphName("emdash").contains("—"))
    assert(PdfEncodings.glyphName("glyph00042").isEmpty) // subset name: no unicode
  }

  test("WinAnsi 0x80-0x9F block decodes through an inline /Encoding name") {
    // "€..." — the block where Latin-1 identity would be WRONG
    val codes = Seq(0x80, 0x91, 0x92, 0x97, 0x99, 0x41)
    val pdf = simplePdf(codes, "/WinAnsiEncoding")
    assert(PdfTextExtractor.extract(pdf) == "€‘’—™A")
  }

  test("MacRoman decodes through an indirect /Encoding dict with /BaseEncoding") {
    val codes = Seq(0x8E, 0xA5, 0x41, 0xD0) // é • A –
    val pdf = simplePdf(codes, "9 0 R",
      Some("<< /Type /Encoding /BaseEncoding /MacRomanEncoding >>"))
    assert(PdfTextExtractor.extract(pdf) == "é•A–")
  }

  test("/Differences override the base table; unknown names drop, never guess") {
    val codes = Seq(0x41, 0x42, 0x43, 0x44)
    val pdf = simplePdf(codes, "9 0 R",
      Some("<< /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
        "/Differences [ 65 /eacute /uni4E2D 67 /gnarlyUnknown /Euro ] >>"))
    // 65→é, 66→中 (consecutive), 67→dropped (unknown name), 68→€
    assert(PdfTextExtractor.extract(pdf) == "é中€")
  }

  test("no declared encoding keeps the full Latin-1 identity fallback") {
    val codes = Seq(0x70, 0x6C, 0x61, 0x69, 0x6E, 0xE9) // "plainé"
    assert(PdfTextExtractor.extract(simplePdf(codes, "")) == "plainé")
  }
}
