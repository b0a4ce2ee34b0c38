package graft.sources

/** TrueType `cmap` table parsing and inversion — the piece that lets
  * [[PdfTextExtractor]] decode Type0/Identity-H fonts that carry NO
  * `/ToUnicode` CMap (reference analog: the ingest boundary trusts an
  * external extractor, `pipeline1.py:76-117`; this engine extracts
  * natively).
  *
  * A CIDFontType2 descendant embeds its TrueType program as
  * `/FontFile2` (ISO 32000-2 §9.9). With `/CIDToGIDMap /Identity` —
  * the shape subset embedders overwhelmingly emit — a 2-byte CID in
  * the content stream IS the glyph id, and the font's own `cmap`
  * table (OpenType spec §5.2, "cmap — Character to Glyph Index
  * Mapping") maps Unicode code points to glyph ids. Inverting that
  * mapping recovers glyph → code point, i.e. CID → text, with no
  * ToUnicode stream at all. This is the standard fallback real
  * extractors (pdfminer, PDFBox, MuPDF) use; it is lossy only when a
  * glyph is reachable from several code points — resolved here
  * deterministically by keeping the SMALLEST code point.
  *
  * Scope: sfnt directory walk + subtable formats 0, 4, 6 and 12 (the
  * Unicode-relevant set; 8/10/13/14 are vanishingly rare in embedded
  * subsets and are skipped, never misread). Subtable election follows
  * the conventional preference order: (3,10) UCS-4 > (0,4..6) Unicode
  * full > (3,1) BMP > (0,0..3) legacy Unicode > (3,0) symbol.
  * Enumeration is budget-capped at the full Unicode range so a
  * malformed group table cannot spin a scan task.
  *
  * Nothing here verifies table checksums: real-world embedded subsets
  * frequently carry stale checksums after subsetting, and a wrong
  * checksum never changes what the bytes map to. The parser is
  * grounded against an INDEPENDENT implementation in the spec suite:
  * the JDK's own font engine (`java.awt.Font.createGlyphVector`)
  * reads the same system TrueType file and must agree glyph-by-glyph
  * (the external-vector discipline, applied to fonts).
  */
object TrueTypeCmap {

  /** Hard ceiling on enumerated (code point, glyph) pairs per font —
    * one more than the Unicode range, so a well-formed full-repertoire
    * font is never truncated but a malformed 2^32-group table is.
    */
  private val EnumBudget = 0x110000

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16(b: Array[Byte], i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  /** sfnt table directory: tag → (offset, length). Empty on anything
    * that is not a parseable TrueType/OpenType container.
    */
  private[graft] def tableDirectory(font: Array[Byte]): Map[String, (Int, Int)] = {
    if (font.length < 12) return Map.empty
    val version = u32(font, 0)
    // 0x00010000 (TrueType), 'true' (Apple), 'OTTO' (CFF outlines — the
    // cmap table is shared), 'ttcf' is NOT handled (collections never
    // appear as FontFile2 payloads, which must be a single font program)
    val ok = version == 0x00010000L || version == 0x74727565L || version == 0x4F54544FL
    if (!ok) return Map.empty
    val n = u16(font, 4)
    if (n > 512 || font.length < 12 + 16 * n) return Map.empty
    val out = Map.newBuilder[String, (Int, Int)]
    var i = 0
    while (i < n) {
      val rec = 12 + 16 * i
      val tag = new String(font, rec, 4, "ISO-8859-1")
      val off = u32(font, rec + 8)
      val len = u32(font, rec + 12)
      if (off >= 0 && len >= 0 && off + len <= font.length)
        out += tag -> (off.toInt, len.toInt)
      i += 1
    }
    out.result()
  }

  /** All (code point → glyph id) pairs of the elected Unicode subtable,
    * glyph 0 (.notdef) excluded. Empty when no Unicode subtable parses.
    */
  private[graft] def charToGlyph(font: Array[Byte]): Seq[(Int, Int)] = {
    val dir = tableDirectory(font)
    dir.get("cmap") match {
      case None => Seq.empty
      case Some((cmapOff, cmapLen)) =>
        if (cmapLen < 4 || cmapOff + 4 > font.length) return Seq.empty
        val nSub = u16(font, cmapOff + 2)
        if (cmapOff + 4 + 8 * nSub > font.length) return Seq.empty
        // elect the best Unicode subtable
        var bestScore = 0
        var bestOff = -1
        var i = 0
        while (i < nSub) {
          val rec = cmapOff + 4 + 8 * i
          val plat = u16(font, rec)
          val enc = u16(font, rec + 2)
          val off = u32(font, rec + 4)
          val score = (plat, enc) match {
            case (3, 10) => 5
            case (0, e) if e >= 4 && e <= 6 => 4
            case (3, 1) => 3
            case (0, _) => 2
            case (3, 0) => 1
            case _ => 0
          }
          if (score > bestScore && off >= 0 && cmapOff + off + 2 <= font.length) {
            bestScore = score
            bestOff = (cmapOff + off).toInt
          }
          i += 1
        }
        if (bestOff < 0) Seq.empty else parseSubtable(font, bestOff)
    }
  }

  /** Parse one cmap subtable at `off` into (code point, glyph) pairs. */
  private[graft] def parseSubtable(font: Array[Byte], off: Int): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var budget = EnumBudget
    def emit(cp: Int, gid: Int): Unit =
      if (gid != 0 && cp >= 0 && cp <= 0x10FFFF) out += cp -> gid
    try {
      u16(font, off) match {
        case 0 => // byte encoding table: 256 single-byte codes
          if (off + 6 + 256 <= font.length) {
            var c = 0
            while (c < 256) { emit(c, u8(font, off + 6 + c)); c += 1 }
          }
        case 4 => // segment mapping to delta values (BMP)
          val segX2 = u16(font, off + 6)
          val segs = segX2 / 2
          val endAt = off + 14
          val startAt = endAt + segX2 + 2 // + reservedPad
          val deltaAt = startAt + segX2
          val rangeAt = deltaAt + segX2
          if (rangeAt + segX2 <= font.length) {
            var s = 0
            while (s < segs && budget > 0) {
              val endC = u16(font, endAt + 2 * s)
              val startC = u16(font, startAt + 2 * s)
              val delta = u16(font, deltaAt + 2 * s) // mod-65536 arithmetic: keep unsigned
              val ro = u16(font, rangeAt + 2 * s)
              var c = startC
              while (c <= endC && c != 0xFFFF && budget > 0) {
                if (ro == 0) emit(c, (c + delta) & 0xFFFF)
                else {
                  // "glyphIdArray-relative" addressing, spec's pointer trick:
                  // the offset is from THIS segment's idRangeOffset slot
                  val addr = rangeAt + 2 * s + ro + 2 * (c - startC)
                  if (addr + 2 <= font.length) {
                    val raw = u16(font, addr)
                    if (raw != 0) emit(c, (raw + delta) & 0xFFFF)
                  }
                }
                budget -= 1
                c += 1
              }
              s += 1
            }
          }
        case 6 => // trimmed table mapping
          val first = u16(font, off + 6)
          val count = u16(font, off + 8)
          if (off + 10 + 2 * count <= font.length) {
            var i = 0
            while (i < count && budget > 0) {
              emit(first + i, u16(font, off + 10 + 2 * i))
              budget -= 1
              i += 1
            }
          }
        case 12 => // segmented coverage (UCS-4)
          if (off + 16 <= font.length) {
            val nGroups = u32(font, off + 12)
            var g = 0L
            while (g < nGroups && budget > 0 && off + 16 + 12 * (g + 1) <= font.length) {
              val base = off + 16 + 12 * g.toInt
              val startC = u32(font, base)
              val endC = u32(font, base + 4)
              val startG = u32(font, base + 8)
              var c = startC
              while (c <= endC && budget > 0) {
                emit(c.toInt, (startG + (c - startC)).toInt)
                budget -= 1
                c += 1
              }
              g += 1
            }
          }
        case _ => () // formats 2/8/10/13/14: skipped, never misread
      }
    } catch { case _: ArrayIndexOutOfBoundsException => () }
    out.result()
  }

  /** glyph id → text (the SMALLEST code point mapping to it, as a
    * String — astral points become surrogate pairs). Glyph 0 never
    * appears: `.notdef` must not leak a character.
    */
  def glyphToString(font: Array[Byte]): Map[Int, String] = {
    val inv = scala.collection.mutable.HashMap.empty[Int, Int]
    charToGlyph(font).foreach { case (cp, gid) =>
      inv.get(gid) match {
        case Some(prev) if prev <= cp => ()
        case _ => inv(gid) = cp
      }
    }
    inv.iterator.map { case (g, cp) => g -> new String(Character.toChars(cp)) }.toMap
  }

  // ---- fixture construction (spec + query corpora) -------------------------

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** OpenType table checksum: sum of big-endian uint32 words over the
    * zero-padded table.
    */
  private def checksum(table: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < table.length) {
      var w = 0L
      var j = 0
      while (j < 4) {
        w = (w << 8) | (if (i + j < table.length) table(i + j) & 0xFFL else 0L)
        j += 1
      }
      sum = (sum + w) & 0xFFFFFFFFL
      i += 4
    }
    sum
  }

  /** A minimal structurally-valid TrueType font whose ONLY table is a
    * `cmap` carrying `pairs` (code point → glyph, glyphs non-zero) in a
    * (3,1) format-4 subtable when every code point is BMP and
    * `forceFormat12` is unset, else a (3,10) format-12 subtable.
    * Directory checksums/searchRange fields are computed per spec. The
    * fixture has no glyph outlines — the extractor only ever reads the
    * character mapping, and its realism anchor is the system-font
    * cross-check in the spec suite, not this builder.
    */
  def buildTtf(pairs: Seq[(Int, Int)], forceFormat12: Boolean = false): Array[Byte] = {
    val sorted = pairs.sortBy(_._1)
    val bmpOnly = sorted.forall { case (cp, _) => cp <= 0xFFFD }
    val sub = new java.io.ByteArrayOutputStream()
    var platEnc = (3, 1)
    if (bmpOnly && !forceFormat12) {
      // format 4: one segment per code point + the required 0xFFFF terminator
      val segs = sorted.map { case (cp, gid) => (cp, cp, (gid - cp) & 0xFFFF, 0) } :+
        (0xFFFF, 0xFFFF, 1, 0)
      val segCount = segs.length
      val segX2 = segCount * 2
      // searchRange = 2*2^floor(log2 segCount), entrySelector = log2(searchRange/2)
      var sr = 2
      var es = 0
      while (sr * 2 <= segCount * 2) { sr *= 2; es += 1 }
      val length = 16 + 8 * segCount
      sub.write(be16(4)); sub.write(be16(length)); sub.write(be16(0))
      sub.write(be16(segX2)); sub.write(be16(sr)); sub.write(be16(es))
      sub.write(be16(segX2 - sr))
      segs.foreach { case (_, end, _, _) => sub.write(be16(end)) }
      sub.write(be16(0)) // reservedPad
      segs.foreach { case (start, _, _, _) => sub.write(be16(start)) }
      segs.foreach { case (_, _, delta, _) => sub.write(be16(delta)) }
      segs.foreach { case (_, _, _, ro) => sub.write(be16(ro)) }
    } else {
      platEnc = (3, 10)
      val length = 16 + 12 * sorted.length
      sub.write(be16(12)); sub.write(be16(0)); sub.write(be32(length))
      sub.write(be32(0)); sub.write(be32(sorted.length))
      sorted.foreach { case (cp, gid) =>
        sub.write(be32(cp)); sub.write(be32(cp)); sub.write(be32(gid))
      }
    }
    val subBytes = sub.toByteArray
    val cmap = new java.io.ByteArrayOutputStream()
    cmap.write(be16(0)) // version
    cmap.write(be16(1)) // one encoding record
    cmap.write(be16(platEnc._1)); cmap.write(be16(platEnc._2))
    cmap.write(be32(12)) // subtable offset from cmap start
    cmap.write(subBytes)
    val table = cmap.toByteArray
    val padded = table ++ Array.fill[Byte]((4 - table.length % 4) % 4)(0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(be32(0x00010000L)) // sfnt version
    out.write(be16(1)) // numTables
    out.write(be16(16)); out.write(be16(0)); out.write(be16(0)) // search fields for n=1
    out.write("cmap".getBytes("ISO-8859-1"))
    out.write(be32(checksum(table)))
    out.write(be32(12 + 16)) // offset: header + one record
    out.write(be32(table.length))
    out.write(padded)
    out.toByteArray
  }
}
