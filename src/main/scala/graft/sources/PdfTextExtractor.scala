package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.Inflater

/** Minimal pure-JVM PDF text extraction for the common PDF subset — the
  * codec the reference gets from PyPDF's `extract_text`
  * (`pipeline1.py:605-612`), rebuilt on nothing but `java.util.zip`:
  *
  *   1. locate `stream … endstream` payloads and their owning object
  *      dictionaries (a byte scan, not a full xref walk — robust to the
  *      incremental-update files a strict xref parse rejects);
  *   2. run the declared `/Filter` chain — ASCIIHexDecode, ASCII85Decode,
  *      RunLengthDecode, LZWDecode (§7.4.4 variable-width 9→12-bit codes
  *      with `/EarlyChange`), and FlateDecode through
  *      [[java.util.zip.Inflater]] (zlib header first, raw-deflate
  *      fallback) — in order;
  *   3. tokenize content streams and walk `BT … ET` text blocks, emitting
  *      `Tj` / `TJ` / `'` / `"` show-text operands (literal strings with
  *      the full escape table, hex strings) with newline heuristics on
  *      `T*` / `Td` / `TD` / `TD`-style leading.
  *
  * Predictors on Flate/LZW ARE handled: PNG (`/Predictor` ≥ 10, per-row
  * Sub/Up/Average/Paeth unfiltering over `/Columns`-sized rows) and TIFF
  * horizontal differencing (`/Predictor 2`, 8-bit components) — each is
  * ~30 lines over the decoded bytes and appears in real-world content
  * streams (TIFF 2 classically next to LZW).
  *
  * Round 12 closes the Identity-H slice of the CID/Type0 tail — the
  * single most common "my PDF extracts as garbage" case in real corpora
  * (PyPDF handles it inside `page.extract_text`, `pipeline1.py:605-612`):
  * `/Type0` fonts with `/Encoding /Identity-H` and a `/ToUnicode` CMap
  * stream now decode 2-byte CIDs through the CMap's
  * `bfchar`/`bfrange` mappings (both range forms, UTF-16BE multi-unit
  * targets incl. surrogate pairs). The content walk tracks the current
  * font through `Tf`, so mixed simple/CID pages decode each show-text
  * operand under the right font. Font resources are resolved by object
  * number from the same byte scan (no xref): `/Font << /F1 N 0 R >>`
  * spans name the font dicts, each font dict names its ToUnicode stream.
  *
  * Round 13 demotes two more stubs: ENCRYPTED documents whose empty
  * user password authenticates decrypt through [[PdfCrypt]] (RC4-40/128,
  * AES-128, and since round 14 the modern AES-256 /V 5 R6 generation —
  * the owner-restricted shape that dominates real
  * "encrypted" corpora), and `/DCTDecode` image XObjects decode as real
  * JPEGs through [[PdfImages]] (the JDK ships the codec). Stream
  * payload bounds now honor a DIRECT `/Length` exactly (binary payloads
  * — ciphertext, JPEG — legally end in CR/LF or contain `endstream`;
  * the keyword scan is only the fallback).
  *
  * Round 15 demotes two more: USER-password-protected documents decrypt
  * when the caller supplies the password ([[extract(bytes:Array[Byte],password:String)*]]),
  * and CIDFontType2 fonts WITHOUT a ToUnicode CMap decode through the
  * embedded TrueType program — `/FontFile2`'s `cmap` table inverted
  * glyph→code-point ([[TrueTypeCmap]]), composed with `/CIDToGIDMap`
  * (Identity or the stream form).
  *
  * Still out of scope (the documented fallback remains
  * [[PdfIngest.stubPdfToText]]): CIDFontType0 (CFF, `/FontFile3`)
  * without ToUnicode (gid→CID lives in the CFF charset, a different
  * container), non-Identity CID encodings (predefined CMaps ship with
  * font subsystems, not the spec), password-less protected documents
  * (a real password is a secret this engine cannot guess), and
  * the JPX image filter (no JDK codec). Object streams (`/ObjStm`,
  * §7.5.7) ARE opened since round 15: the spec forbids STREAMS inside
  * one, so content/CMap/font-program bytes never live there, but page
  * and font DICTIONARIES do in every PDF 1.5+ producer's output —
  * [[objStmSpans]] inflates each ObjStm and walks its offset header,
  * and [[fontDecoders]] resolves fonts across raw and packed spans alike.
  * A chain containing an unsupported filter yields empty
  * bytes, never garbage text; an unmapped CID contributes nothing,
  * never a wrong glyph.
  */
object PdfTextExtractor {

  /** `%PDF-` magic within the first 1 KiB (the spec allows junk before it). */
  def isPdf(bytes: Array[Byte]): Boolean = {
    val limit = math.min(bytes.length - 4, 1024)
    var i = 0
    while (i < limit) {
      if (bytes(i) == '%' && bytes(i + 1) == 'P' && bytes(i + 2) == 'D' &&
        bytes(i + 3) == 'F' && bytes(i + 4) == '-') return true
      i += 1
    }
    false
  }

  /** All pages' text, blocks newline-joined; "" when nothing decodable.
    * Encrypted documents whose EMPTY user password verifies against /U
    * ([[PdfCrypt.decryptorFor]] — the owner-restricted files that
    * dominate real "encrypted" corpora) decrypt per-object ahead of the
    * filter chain; anything else keeps the stub contract (encrypted
    * streams fail their inflate and contribute nothing, never garbage).
    */
  def extract(bytes: Array[Byte]): String = extract(bytes, "")

  /** [[extract]] with a user password (round 15): a pipeline holding
    * credentials for a protected corpus passes them per document; the
    * empty string is the round-14 behavior (owner-restricted files).
    */
  def extract(bytes: Array[Byte], password: String): String = {
    if (!isPdf(bytes)) return ""
    val raw = rawStreams(bytes)
    val pw = password.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val streams = PdfCrypt.decryptorFor(bytes, pw) match {
      case Some(dec) => raw.map { case (n, g, dict, p) =>
        (n, g, dict, if (n >= 0) dec.decryptStream(n, math.max(g, 0), p) else p) }
      case None => raw
    }
    val (fonts, simpleFonts) = fontDecoders(bytes, streams)
    val out = new StringBuilder
    for ((_, _, dict, payload) <- streams) {
      val data = decodePayload(dict, payload)
      if (containsTextBlock(data)) {
        val text = contentText(data, fonts, simpleFonts)
        if (text.nonEmpty) {
          if (out.nonEmpty && !out.endsWith("\n")) out.append('\n')
          out.append(text)
        }
      }
    }
    out.result().trim
  }

  // ---- stage 1: stream payloads ------------------------------------------

  private[sources] def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes("ISO-8859-1")
    var i = math.max(from, 0)
    val last = hay.length - n.length
    while (i <= last) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** (owning object number, generation, owning-dict text, payload bytes)
    * for each `stream…endstream`. The dict is the byte span from the
    * nearest preceding `obj` keyword — close enough to read `/Filter`
    * without resolving indirect references; number and generation are
    * parsed backwards from that keyword (−1 when malformed — filter
    * decoding never needs them, only ToUnicode lookup and decryption do).
    */
  private[sources] def rawStreams(bytes: Array[Byte]): Seq[(Int, Int, String, Array[Byte])] = {
    val found = Seq.newBuilder[(Int, Int, String, Array[Byte])]
    var pos = 0
    var lastObj = 0 // carried forward: the obj scan never re-reads the file
    var streamAt = indexOf(bytes, "stream", pos)
    while (streamAt >= 0) {
      // "endstream" also contains "stream" — require a non-letter before it
      val standalone = streamAt == 0 || !Character.isLetter((bytes(streamAt - 1) & 0xff).toChar)
      var payloadStart = streamAt + "stream".length
      if (standalone && payloadStart < bytes.length) {
        // EOL after the keyword: CRLF or LF per spec (tolerate a lone CR)
        if (payloadStart < bytes.length && bytes(payloadStart) == '\r') payloadStart += 1
        if (payloadStart < bytes.length && bytes(payloadStart) == '\n') payloadStart += 1
        lastObj = lastIndexOfObj(bytes, lastObj, streamAt)
        val dict = new String(bytes, lastObj, streamAt - lastObj, "ISO-8859-1")
        // a DIRECT /Length bounds the payload exactly — the only correct
        // answer for binary payloads (encrypted streams are pseudorandom
        // bytes that may END in CR/LF or even contain "endstream"; the
        // keyword scan would truncate them). Verified against the
        // following endstream keyword; indirect `/Length N G R` and
        // lying lengths fall back to the scan.
        val exact = directLength(dict).flatMap { n =>
          val pe = payloadStart.toLong + n
          if (pe <= bytes.length) {
            var q = pe.toInt
            if (q < bytes.length && bytes(q) == '\r') q += 1
            if (q < bytes.length && bytes(q) == '\n') q += 1
            if (indexOf(bytes, "endstream", q) == q) Some((pe.toInt, q))
            else None
          } else None
        }
        val bounds = exact.orElse {
          val end = indexOf(bytes, "endstream", payloadStart)
          if (end > payloadStart) {
            var payloadEnd = end
            // strip the EOL that precedes `endstream`
            if (payloadEnd > payloadStart && bytes(payloadEnd - 1) == '\n') payloadEnd -= 1
            if (payloadEnd > payloadStart && bytes(payloadEnd - 1) == '\r') payloadEnd -= 1
            Some((payloadEnd, end))
          } else None
        }
        bounds match {
          case Some((payloadEnd, kwAt)) =>
            val (num, gen) = objNumBefore(bytes, lastObj)
            found += ((num, gen, dict,
              java.util.Arrays.copyOfRange(bytes, payloadStart, payloadEnd)))
            pos = kwAt + "endstream".length
          case None => pos = payloadStart
        }
      } else pos = payloadStart
      streamAt = indexOf(bytes, "stream", pos)
    }
    found.result()
  }

  private val DirectLenRe = """/Length\s+(\d{1,9})(\s+\d+\s+R)?""".r

  /** The dict's `/Length` when it is a DIRECT integer (an indirect
    * `N G R` reference needs the xref this scan deliberately avoids).
    */
  private def directLength(dict: String): Option[Int] =
    DirectLenRe.findFirstMatchIn(dict).collect {
      case m if m.group(2) == null => m.group(1).toInt
    }

  /** (object number, generation) of `N G obj` whose `obj` keyword starts
    * at `objAt`: walk back over the generation number and whitespace,
    * then read the digits of N. (−1, −1) when the shape doesn't match.
    */
  private def objNumBefore(bytes: Array[Byte], objAt: Int): (Int, Int) = {
    var i = objAt - 1
    def skipWs(): Unit =
      while (i >= 0 && (bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\r' ||
        bytes(i) == '\t')) i -= 1
    def skipDigits(): Int = {
      val hi = i
      while (i >= 0 && bytes(i) >= '0' && bytes(i) <= '9') i -= 1
      hi - i
    }
    skipWs()
    val gd = skipDigits()
    if (gd == 0 || gd > 9) return (-1, -1)
    val gen = new String(bytes, i + 1, gd, "ISO-8859-1").toInt
    skipWs()
    val nd = skipDigits()
    if (nd == 0 || nd > 9) return (-1, -1)
    (new String(bytes, i + 1, nd, "ISO-8859-1").toInt, gen)
  }

  /** Last "obj" before `before`, scanning forward from `from` (the
    * previous stream's answer): across a whole file the calls sum to ONE
    * forward pass — re-scanning from byte 0 per stream made rawStreams
    * O(fileSize × numStreams) on object-dense PDFs.
    */
  private def lastIndexOfObj(bytes: Array[Byte], from: Int, before: Int): Int = {
    var best = from
    var i = indexOf(bytes, "obj", from)
    while (i >= 0 && i < before) {
      best = i
      i = indexOf(bytes, "obj", i + 3)
    }
    best
  }

  // ---- stage 2: filter chain ----------------------------------------------

  private val FilterRe = """/Filter\s*(\[[^\]]*\]|/\w+)""".r
  private val NameRe = """/(\w+)""".r

  /** Filter names in application order from the dict's `/Filter` entry —
    * a single name or an array per §7.4; empty when none is declared.
    */
  private[graft] def filterChain(dict: String): Seq[String] =
    FilterRe.findFirstMatchIn(dict) match {
      case Some(m) => NameRe.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      case None => Nil
    }

  /** Run the declared filter chain over the raw payload. Supported (all
    * pure-JVM): ASCIIHexDecode, ASCII85Decode, RunLengthDecode, LZWDecode,
    * and FlateDecode — the compressed pair both honoring PNG and TIFF-2
    * predictors. An unsupported filter anywhere in the chain
    * (DCT/JPX/Crypt — the documented out-of-scope tail) yields empty
    * bytes rather than garbage text.
    */
  private[graft] def decodePayload(dict: String, payload: Array[Byte]): Array[Byte] = {
    var data = payload
    for (f <- filterChain(dict) if data.nonEmpty) f match {
      case "FlateDecode" | "Fl" =>
        data = inflate(data).map(applyPredictor(dict, _)).getOrElse(Array.emptyByteArray)
      case "LZWDecode" | "LZW" =>
        data = applyPredictor(dict, lzwDecode(data, intParam(dict, "/EarlyChange").getOrElse(1)))
      case "ASCIIHexDecode" | "AHx" => data = asciiHexDecode(data)
      case "ASCII85Decode" | "A85" => data = ascii85Decode(data)
      case "RunLengthDecode" | "RL" => data = runLengthDecode(data)
      case _ => data = Array.emptyByteArray
    }
    data
  }

  /** §7.4.2: hex digits to bytes, whitespace skipped, `>` terminates, an
    * odd final digit is padded with 0.
    */
  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = (data(i) & 0xff).toChar
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd digit: low nibble is 0
    out.toByteArray
  }

  /** §7.4.3: base-85 groups of 5 chars `!`..`u` → 4 bytes; `z` is a
    * 4-zero-byte shorthand; `~>` terminates; a partial final group of n
    * chars (padded with `u`) yields n−1 bytes.
    */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val grp = new Array[Int](5)
    var n = 0
    var i = 0
    var done = false
    def flush(chars: Int): Unit = {
      var v = 0L
      var j = 0
      while (j < 5) { v = v * 85 + (if (j < chars) grp(j) else 84); j += 1 }
      var k = 0
      while (k < chars - 1) { out.write(((v >> (24 - 8 * k)) & 0xff).toInt); k += 1 }
    }
    while (i < data.length && !done) {
      val c = (data(i) & 0xff).toChar
      if (c == '~') done = true
      else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'
        n += 1
        if (n == 5) { flush(5); n = 0 }
      }
      i += 1
    }
    if (n > 1) flush(n)
    out.toByteArray
  }

  /** §7.4.5: length byte L — 0..127 copies the next L+1 bytes, 129..255
    * repeats the next byte 257−L times, 128 is EOD.
    */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 2)
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        val n = math.min(l + 1, data.length - i)
        out.write(data, i, n)
        i += n
      } else if (i < data.length) {
        val b = data(i)
        i += 1
        var k = 257 - l
        while (k > 0) { out.write(b); k -= 1 }
      }
    }
    out.toByteArray
  }

  /** §7.4.4 LZWDecode: MSB-first variable-width codes starting at 9 bits,
    * 256 = clear-table, 257 = EOD, new entries from 258; the width grows
    * at 511/1023/2047 entries (one code EARLY when `/EarlyChange` is 1,
    * the PDF default — TIFF's off-by-one that writers inherited). Handles
    * the KwKwK case (a code equal to the next unassigned entry is
    * prev + prev.head). Malformed input decodes up to the damage and
    * returns what it has — the extractor's fallback philosophy.
    */
  private[graft] def lzwDecode(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 3)
    // table entries 258+ as (prefixCode, appendedByte); literals implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var nextCode = 258
    var width = 9
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var i = 0
    val seq = new Array[Byte](4096) // expansion scratch, max chain length

    def expand(code: Int): Int = { // fills seq tail-first, returns start index
      var c = code
      var p = seq.length
      while (c >= 258) {
        p -= 1; seq(p) = append(c); c = prefix(c)
      }
      p -= 1; seq(p) = c.toByte
      p
    }

    var done = false
    while (!done && (i < data.length || bitCnt >= width)) {
      while (bitCnt < width && i < data.length) {
        bitBuf = (bitBuf << 8) | (data(i) & 0xffL); bitCnt += 8; i += 1
      }
      if (bitCnt < width) done = true
      else {
        val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
        bitCnt -= width
        if (code == 256) { nextCode = 258; width = 9; prev = -1 }
        else if (code == 257) done = true
        else if (code < 256 || (code < nextCode && code >= 258) || (code == nextCode && prev >= 0)) {
          val isKwK = code == nextCode
          val start = expand(if (isKwK) prev else code)
          val len = seq.length - start
          if (prev >= 0 && nextCode < 4096) {
            prefix(nextCode) = prev
            append(nextCode) = seq(start)
            nextCode += 1
          }
          out.write(seq, start, len)
          if (isKwK) out.write(seq(start))
          prev = if (isKwK) nextCode - 1 else code
          if (nextCode + earlyChange >= (1 << width) && width < 12) width += 1
        } else done = true // orphan code: stop at the damage
      }
    }
    out.toByteArray
  }

  // ---- stage 2a: FlateDecode ----------------------------------------------

  /** zlib-wrapped first (the PDF norm), then raw deflate — some writers
    * omit the wrapper. None when both fail (corrupt or predictor-coded).
    */
  private[sources] def inflate(data: Array[Byte]): Option[Array[Byte]] =
    inflateWith(data, nowrap = false).orElse(inflateWith(data, nowrap = true))

  private def inflateWith(data: Array[Byte], nowrap: Boolean): Option[Array[Byte]] =
    try {
      val inf = new Inflater(nowrap)
      inf.setInput(data)
      val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      var n = inf.inflate(buf)
      while (n > 0) {
        out.write(buf, 0, n)
        n = if (inf.finished()) 0 else inf.inflate(buf)
      }
      inf.end()
      if (out.size() > 0) Some(out.toByteArray) else None
    } catch { case _: Throwable => None }

  // ---- stage 2b: PNG predictor unfiltering -------------------------------

  private val ParamRe = """(/\w+)\s+(\d+)""".r

  private[sources] def intParam(dict: String, name: String): Option[Int] =
    ParamRe.findAllMatchIn(dict)
      .collectFirst { case m if m.group(1) == name => m.group(2).toInt }

  /** Undo PNG row filters (RFC 2083 §6) on inflated stream data when the
    * owning dict declares `/Predictor` ≥ 10: each `/Columns`-sized row is
    * prefixed by a filter-type byte (None/Sub/Up/Average/Paeth), decoded
    * against the previous DECODED row — the standard pre-compression
    * de-correlation real writers put on content and xref streams. The
    * identity predictor (≤ 1) and any layout that does not divide into
    * (rowBytes + 1)-sized rows pass through unchanged (never corrupt data
    * on a malformed declaration — the extractor's fallback philosophy).
    */
  private[graft] def applyPredictor(dict: String, data: Array[Byte]): Array[Byte] = {
    val pred = intParam(dict, "/Predictor").getOrElse(1)
    if (pred == 2) return applyTiffPredictor(dict, data)
    if (pred < 10 || data.isEmpty) return data
    val cols = intParam(dict, "/Columns").getOrElse(1)
    val colors = intParam(dict, "/Colors").getOrElse(1)
    val bpc = intParam(dict, "/BitsPerComponent").getOrElse(8)
    val rowBytes = (cols * colors * bpc + 7) / 8
    val bpp = math.max(1, colors * bpc / 8)
    if (rowBytes <= 0 || data.length % (rowBytes + 1) != 0) return data
    val nRows = data.length / (rowBytes + 1)
    val out = new Array[Byte](nRows * rowBytes)
    val prev = new Array[Int](rowBytes) // previous decoded row (zeros for row 0)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowBytes + 1)) & 0xff
      val src = r * (rowBytes + 1) + 1
      val dst = r * rowBytes
      var i = 0
      while (i < rowBytes) {
        val x = data(src + i) & 0xff
        val a = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val b = prev(i)
        val c = if (i >= bpp) prev(i - bpp) else 0
        val rec = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
          case _ => x // unknown filter byte: keep the raw byte
        }
        out(dst + i) = (rec & 0xff).toByte
        i += 1
      }
      i = 0
      while (i < rowBytes) { prev(i) = out(dst + i) & 0xff; i += 1 }
      r += 1
    }
    out
  }

  /** TIFF predictor 2 (horizontal differencing, §7.4.4.4): each 8-bit
    * component is stored as a delta against the component one pixel left;
    * decoding is a running sum per row. Rows have NO filter-type byte
    * (unlike PNG). Sub-byte components (`/BitsPerComponent` < 8) and
    * layouts that do not divide into rows pass through unchanged.
    */
  private[graft] def applyTiffPredictor(dict: String, data: Array[Byte]): Array[Byte] = {
    val cols = intParam(dict, "/Columns").getOrElse(1)
    val colors = intParam(dict, "/Colors").getOrElse(1)
    val bpc = intParam(dict, "/BitsPerComponent").getOrElse(8)
    if (bpc != 8) return data
    val rowBytes = cols * colors
    val bpp = colors
    if (rowBytes <= 0 || data.length % rowBytes != 0) return data
    val out = java.util.Arrays.copyOf(data, data.length)
    var r = 0
    while (r < data.length) {
      var i = bpp
      while (i < rowBytes) {
        out(r + i) = ((out(r + i) + out(r + i - bpp)) & 0xff).toByte
        i += 1
      }
      r += rowBytes
    }
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---- stage 2c: Identity-H / ToUnicode CMaps ------------------------------

  private val Type0Re = """/Subtype\s*/Type0""".r
  private val ToUnicodeRe = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
  private val IdentityHRe = """/Encoding\s*/Identity-H""".r
  private val DescFontsRe = """/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R""".r
  private val FontDescRe = """/FontDescriptor\s+(\d+)\s+\d+\s+R""".r
  private val FontFile2Re = """/FontFile2\s+(\d+)\s+\d+\s+R""".r
  private val CidToGidRe = """/CIDToGIDMap\s+(\d+)\s+\d+\s+R""".r
  private val SimpleFontRe = """/Subtype\s*/(TrueType|Type1|MMType1)\b""".r
  private val EncRefRe = """/Encoding\s+(\d+)\s+\d+\s+R""".r
  private val BaseEncRe = """/(?:BaseEncoding|Encoding)\s*/(WinAnsiEncoding|MacRomanEncoding|StandardEncoding)""".r
  private val DiffsRe = """(?s)/Differences\s*\[(.*?)\]""".r
  private val DiffTokRe = """(\d+)|/([^\s/\[\]<>()]+)""".r
  private val FontResRe = """(?s)/Font\s*<<(.*?)>>""".r
  private val FontRefRe = """/(\w+)\s+(\d+)\s+\d+\s+R""".r
  private val HexTokRe = """<([0-9A-Fa-f]+)>|\[|\]""".r
  private val BfCharRe = """(?s)beginbfchar(.*?)endbfchar""".r
  private val BfRangeRe = """(?s)beginbfrange(.*?)endbfrange""".r

  /** `N G obj … endobj` span walk by plain `indexOf` — linear in the
    * document. (The previous whole-document regex with a per-character
    * negative-lookahead lazy loop backtracked quadratically on large
    * Identity-H PDFs with long streams — an executor-task stall, not a
    * correctness bug.) Each hit is validated as a real object header by
    * scanning the `N G ` prefix backwards; `obj` inside `endobj` fails
    * the preceding-whitespace check and is skipped.
    */
  private[graft] def objSpans(text: String): List[(Int, String)] = {
    val out = List.newBuilder[(Int, String)]
    var pos = 0
    while ({ pos = text.indexOf("obj", pos); pos >= 0 }) {
      val afterOk = pos + 3 >= text.length ||
        !Character.isLetterOrDigit(text.charAt(pos + 3))
      var num = -1
      if (afterOk && pos > 0 && Character.isWhitespace(text.charAt(pos - 1))) {
        var i = pos - 1
        while (i >= 0 && Character.isWhitespace(text.charAt(i))) i -= 1
        val genEnd = i
        while (i >= 0 && Character.isDigit(text.charAt(i))) i -= 1
        if (i < genEnd && i >= 0 && Character.isWhitespace(text.charAt(i))) {
          while (i >= 0 && Character.isWhitespace(text.charAt(i))) i -= 1
          val numEnd = i
          while (i >= 0 && Character.isDigit(text.charAt(i))) i -= 1
          if (i < numEnd && numEnd - i <= 9)
            num = text.substring(i + 1, numEnd + 1).toInt
        }
      }
      if (num >= 0) {
        val end = text.indexOf("endobj", pos + 3)
        if (end < 0) { out += ((num, text.substring(pos + 3))); pos = text.length }
        else { out += ((num, text.substring(pos + 3, end))); pos = end + 6 }
      } else pos += 3
    }
    out.result()
  }

  /** Objects packed inside `/Type /ObjStm` object streams (ISO 32000-2
    * §7.5.7 — the PDF 1.5+ compression every modern producer emits):
    * the payload opens with `N` pairs of integers (object number,
    * byte offset relative to `/First`), then the concatenated object
    * bodies. Streams are forbidden inside one, but page and FONT
    * dictionaries live there routinely — without this walk a
    * compressed font dict is invisible to the byte scan and its text
    * silently fails to decode. Returns (object number, body) spans in
    * stream order; malformed headers yield nothing, never garbage.
    */
  private[graft] def objStmSpans(
      streams: Seq[(Int, Int, String, Array[Byte])]): List[(Int, String)] = {
    val out = List.newBuilder[(Int, String)]
    for ((_, _, dict, payload) <- streams if dict.contains("/ObjStm")) {
      val data = decodePayload(dict, payload)
      if (data.nonEmpty) {
        val text = new String(data, "ISO-8859-1")
        (intParam(dict, "/N"), intParam(dict, "/First")) match {
          case (Some(n), Some(first))
              if n > 0 && n <= 100000 && first > 0 && first <= text.length =>
            val header = text.substring(0, first)
            val ints = """\d+""".r.findAllIn(header).take(2 * n).map(_.toLong).toSeq
            if (ints.length == 2 * n) {
              val pairs = ints.grouped(2).map(p => (p(0).toInt, p(1).toInt)).toSeq
              for (i <- pairs.indices) {
                val (num, off) = pairs(i)
                val start = first + off
                val end =
                  if (i + 1 < pairs.length) first + pairs(i + 1)._2 else text.length
                if (start >= first && start <= end && end <= text.length)
                  out += ((num, text.substring(start, end)))
              }
            }
          case _ => ()
        }
      }
    }
    out.result()
  }

  /** Resource-name → CID-to-text map for every `/Type0` + `/Identity-H`
    * font, resolved over the same byte scan (no xref): font dicts are
    * plain objects, `/Font << /F1 N 0 R >>` resource spans bind names
    * to them (merged document-wide — a name bound to different fonts on
    * different pages keeps the first, the byte-scan trade-off), and
    * streams are found by object number.
    *
    * Two mapping sources, in spec-priority order: a `/ToUnicode` CMap
    * stream when present (ISO 32000-2 §9.10.2 names it the primary
    * text-extraction route), else — round 15 — the descendant
    * CIDFontType2's embedded TrueType program: `/FontFile2`'s `cmap`
    * table inverted by [[TrueTypeCmap.glyphToString]], composed through
    * `/CIDToGIDMap` (`/Identity`, absent = identity, or the 2-byte-BE
    * stream form §9.7.4.3). CIDFontType0 (CFF, `/FontFile3`) without
    * ToUnicode remains a disclosed stub — its charset maps gid→CID
    * inside the CFF program, a different container.
    */
  /** One linear pass over the bytes answering "does any needle occur" —
    * the cheap-bail scan ([[fontDecoders]]) asks about five substrings,
    * and five separate `indexOf` passes would quintuple the hot-path
    * scan cost on the (overwhelming) majority of documents that contain
    * none of them.
    */
  private[sources] def containsAny(hay: Array[Byte], needles: Seq[String]): Array[Boolean] = {
    val ns = needles.map(_.getBytes("ISO-8859-1")).toArray
    val found = new Array[Boolean](ns.length)
    var remaining = ns.length
    var i = 0
    while (i < hay.length && remaining > 0) {
      var k = 0
      while (k < ns.length) {
        if (!found(k) && hay(i) == ns(k)(0) && i + ns(k).length <= hay.length) {
          var j = 1
          while (j < ns(k).length && hay(i + j) == ns(k)(j)) j += 1
          if (j == ns(k).length) { found(k) = true; remaining -= 1 }
        }
        k += 1
      }
      i += 1
    }
    found
  }

  /** Both decoder families in one span walk: `_1` CID maps for composite
    * fonts, `_2` per-resource 256-entry tables for SIMPLE fonts (`/TrueType`,
    * `/Type1`, `/MMType1`) — base encoding (`/WinAnsiEncoding`,
    * `/MacRomanEncoding`, or the Latin-1 identity fallback) overlaid
    * with `/Differences` names resolved through [[PdfEncodings]]
    * (`uniXXXX` + the AGL subset; unknown names yield "", never a
    * wrong glyph). The `/Encoding` entry may be an inline name, an
    * inline dictionary, or an indirect reference to one.
    */
  private[graft] def fontDecoders(bytes: Array[Byte],
      streams: Seq[(Int, Int, String, Array[Byte])]): (Map[String, Map[Int, String]], Map[String, Array[String]]) = {
    // cheap bail: no font machinery in the file — ONE pass over the raw
    // bytes for all five markers, then the decoded object-stream bodies
    // only when the file declares an /ObjStm (a compressed font dict is
    // invisible to the raw scan)
    val raw = containsAny(bytes,
      Seq("Identity-H", "/TrueType", "/Type1", "/MMType1", "/ObjStm"))
    val rawIdH = raw(0)
    val rawSimple = raw(1) || raw(2) || raw(3)
    val stm =
      if (rawIdH || rawSimple || raw(4)) objStmSpans(streams)
      else Nil
    val anyIdH = rawIdH || stm.exists(_._2.contains("Identity-H"))
    val anySimple = rawSimple || stm.exists(s =>
      s._2.contains("/TrueType") || s._2.contains("/Type1") || s._2.contains("/MMType1"))
    if (!anyIdH && !anySimple) return (Map.empty, Map.empty)
    val text = new String(bytes, "ISO-8859-1")
    val spans = objSpans(text) ++ stm
    // obj number → bodies in file order; lookups take the first body that
    // actually matches the pattern being sought, so a chance "N 0 obj"
    // byte run inside a compressed payload cannot shadow the real object
    // (an updated object still needs the xref walk this byte-scan
    // deliberately avoids)
    val spansByNum: Map[Int, Seq[String]] =
      spans.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    def findIn(num: Int, re: scala.util.matching.Regex): Option[scala.util.matching.Regex.Match] =
      spansByNum.getOrElse(num, Seq.empty).iterator
        .flatMap(re.findFirstMatchIn(_)).nextOption()
    def streamOf(num: Int): Option[Array[Byte]] =
      streams.collectFirst { case (n, _, dict, payload) if n == num =>
        decodePayload(dict, payload) }
    // font object number → (ToUnicode stream obj, descendant font obj);
    // FIRST matching span wins — the same precedence every other lookup
    // here uses, so a duplicated object number resolves entirely from
    // one revision. The regexes run only over each bounded obj body,
    // never the whole file. Both refs are kept: when the ToUnicode
    // stream is missing or unparseable the descendant's embedded cmap
    // is the fallback, and a Type0 font that resolves to NOTHING still
    // binds an empty map so its CIDs DROP rather than leak raw bytes.
    val source: Map[Int, (Option[Int], Option[Int])] =
      spans.foldLeft(Map.empty[Int, (Option[Int], Option[Int])]) {
        case (acc, (num, body)) =>
          if (acc.contains(num) || Type0Re.findFirstIn(body).isEmpty ||
            IdentityHRe.findFirstIn(body).isEmpty) acc
          else acc + (num -> ((
            ToUnicodeRe.findFirstMatchIn(body).map(_.group(1).toInt),
            DescFontsRe.findFirstMatchIn(body).map(_.group(1).toInt))))
      }
    // simple-font object number → its 256-entry code table (first
    // matching span wins, as above)
    val simpleSource: Map[Int, Array[String]] = if (!anySimple) Map.empty
    else spans.foldLeft(Map.empty[Int, Array[String]]) { case (acc, (num, body)) =>
      if (acc.contains(num) || SimpleFontRe.findFirstIn(body).isEmpty ||
        Type0Re.findFirstIn(body).isDefined) acc
      else {
        val encBody = EncRefRe.findFirstMatchIn(body) match {
          case Some(r) =>
            // indirect /Encoding N 0 R: the dict lives in its own object
            spansByNum.getOrElse(r.group(1).toInt, Seq.empty)
              .find(b => BaseEncRe.findFirstIn(b).isDefined ||
                DiffsRe.findFirstIn(b).isDefined)
              .getOrElse("")
          case None => body // inline name or inline dict, if any
        }
        val base = BaseEncRe.findFirstMatchIn(encBody)
          .orElse(BaseEncRe.findFirstMatchIn(body))
          .map(_.group(1)).getOrElse("")
        val table = PdfEncodings.baseTable(base)
        DiffsRe.findFirstMatchIn(encBody).foreach { d =>
          var code = -1
          DiffTokRe.findAllMatchIn(d.group(1)).foreach { t =>
            if (t.group(1) != null) code = t.group(1).toInt
            else if (code >= 0 && code < 256) {
              table(code) = PdfEncodings.glyphName(t.group(2)).getOrElse("")
              code += 1
            }
          }
        }
        acc + (num -> table)
      }
    }
    if (source.isEmpty && simpleSource.isEmpty) return (Map.empty, Map.empty)
    // CID→text via the descendant's embedded TrueType cmap; the
    // descendant body is elected ONCE (first span carrying the
    // /FontDescriptor ref) so the CIDToGIDMap form is read off the same
    // dictionary that named the font program
    def fromFontFile2(descObj: Int): Map[Int, String] = {
      val descBody = spansByNum.getOrElse(descObj, Seq.empty)
        .find(FontDescRe.findFirstIn(_).isDefined).getOrElse("")
      val g2s = (for {
        fdM <- FontDescRe.findFirstMatchIn(descBody)
        ffM <- findIn(fdM.group(1).toInt, FontFile2Re)
        ttf <- streamOf(ffM.group(1).toInt)
      } yield TrueTypeCmap.glyphToString(ttf)).getOrElse(Map.empty)
      if (g2s.isEmpty) return Map.empty
      CidToGidRe.findFirstMatchIn(descBody) match {
        case Some(m) =>
          // stream form: byte pair 2i..2i+1 is the glyph id of CID i
          streamOf(m.group(1).toInt) match {
            case Some(map) =>
              val out = Map.newBuilder[Int, String]
              var cid = 0
              while (2 * cid + 1 < map.length) {
                val gid = ((map(2 * cid) & 0xFF) << 8) | (map(2 * cid + 1) & 0xFF)
                g2s.get(gid).foreach(s => out += cid -> s)
                cid += 1
              }
              out.result()
            case None => Map.empty
          }
        case None => g2s // /Identity or absent: CID == GID
      }
    }
    // resource name → font object number (first binding wins); page
    // resource dicts may themselves live inside an object stream
    val resText =
      if (stm.isEmpty) text else text + "\n" + stm.map(_._2).mkString("\n")
    val names = FontResRe.findAllMatchIn(resText).flatMap(m =>
      FontRefRe.findAllMatchIn(m.group(1)).map(r => r.group(1) -> r.group(2).toInt))
      .toSeq.distinct
    val cmapOf = scala.collection.mutable.Map.empty[Int, Map[Int, String]]
    val cid = names.flatMap { case (name, fontObj) =>
      source.get(fontObj).map { case (tuObj, descObj) =>
        // ToUnicode first (§9.10.2's primary route), the descendant's
        // embedded cmap when that stream is missing or unparseable; a
        // Type0 font that resolves to NOTHING binds the EMPTY map — its
        // CIDs then drop in decodeCids instead of leaking as raw bytes
        val cm = cmapOf.getOrElseUpdate(fontObj, {
          val viaTu = tuObj.flatMap(streamOf).map(parseCMap)
            .getOrElse(Map.empty[Int, String])
          if (viaTu.nonEmpty) viaTu
          else descObj.map(fromFontFile2).getOrElse(Map.empty)
        })
        name -> cm
      }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.head._2 }
    val simple = names.flatMap { case (name, fontObj) =>
      simpleSource.get(fontObj).map(name -> _)
    }.groupBy(_._1).map { case (k, vs) => k -> vs.head._2 }
    (cid, simple)
  }

  /** `bfchar`/`bfrange` sections of a ToUnicode CMap → CID → text.
    * Sources are hex strings (2-byte for Identity-H); targets are
    * UTF-16BE hex, any length (multi-unit targets incl. surrogate pairs
    * decode through the JVM's UTF-16 handling). Both bfrange forms:
    * `<lo> <hi> <dstStart>` (the LAST code unit increments, §9.10.3) and
    * `<lo> <hi> [<d0> <d1> …]` (explicit per-code targets).
    */
  private[graft] def parseCMap(data: Array[Byte]): Map[Int, String] = {
    if (data.isEmpty) return Map.empty
    val text = new String(data, "ISO-8859-1")
    val out = Map.newBuilder[Int, String]
    def hexStr(h: String): String = {
      // UTF-16BE units assembled by hand: a charset decoder would replace
      // the LONE surrogate halves that astral targets arrive as (one
      // bfchar entry per unit) with U+FFFD; appended as raw chars the JVM
      // re-joins the pair
      val even = if (h.length % 2 == 1) h + "0" else h
      val sb = new StringBuilder(even.length / 4 + 1)
      var i = 0
      while (i + 4 <= even.length) {
        sb.append(Integer.parseInt(even.substring(i, i + 4), 16).toChar)
        i += 4
      }
      if (i < even.length) // dangling single byte: keep as its code unit
        sb.append(Integer.parseInt(even.substring(i), 16).toChar)
      sb.result()
    }
    def bumpLast(s: String, by: Int): String =
      if (s.isEmpty) s
      else s.substring(0, s.length - 1) + ((s.last + by) & 0xFFFF).toChar
    for (m <- BfCharRe.findAllMatchIn(text)) {
      val toks = HexTokRe.findAllMatchIn(m.group(1)).flatMap(h => Option(h.group(1))).toSeq
      toks.grouped(2).foreach {
        case Seq(src, dst) => out += Integer.parseInt(src, 16) -> hexStr(dst)
        case _ => ()
      }
    }
    for (m <- BfRangeRe.findAllMatchIn(text)) {
      // token walk: <lo> <hi> then either <dst> or [ <d0> <d1> … ]
      val toks = HexTokRe.findAllMatchIn(m.group(1))
        .map(h => Option(h.group(1)).getOrElse(h.matched)).toSeq
      var i = 0
      while (i + 1 < toks.length) {
        (toks.lift(i), toks.lift(i + 1), toks.lift(i + 2)) match {
          case (Some(lo), Some(hi), Some("["))
              if lo != "[" && lo != "]" && hi != "[" && hi != "]" =>
            val l = Integer.parseInt(lo, 16)
            var j = i + 3
            var code = l
            while (j < toks.length && toks(j) != "]") {
              out += code -> hexStr(toks(j))
              code += 1
              j += 1
            }
            i = j + 1
          case (Some(lo), Some(hi), Some(dst))
              if lo != "[" && lo != "]" && hi != "[" && hi != "]" &&
                dst != "[" && dst != "]" =>
            val l = Integer.parseInt(lo, 16)
            val h = Integer.parseInt(hi, 16)
            val d0 = hexStr(dst)
            var code = l
            while (code <= h && code - l <= 0xFFFF) {
              out += code -> bumpLast(d0, code - l)
              code += 1
            }
            i += 3
          case _ => i += 1
        }
      }
    }
    out.result()
  }

  /** Decode a show-text operand under an Identity-H CMap: chars carry raw
    * bytes (the tokenizer is byte-preserving), consumed as big-endian
    * 2-byte CIDs; unmapped CIDs contribute nothing (never a wrong glyph);
    * a trailing odd byte is ignored.
    */
  private def decodeCids(s: String, cmap: Map[Int, String]): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i + 1 < s.length) {
      val code = ((s.charAt(i) & 0xFF) << 8) | (s.charAt(i + 1) & 0xFF)
      cmap.get(code).foreach(sb.append)
      i += 2
    }
    sb.result()
  }

  /** Deterministic Identity-H fixture PDF: `text`'s UTF-16 code units map
    * to CIDs 1..k in order of first appearance, the content stream shows
    * one hex CID string through `/F1` (`Tf`-selected), and the `/ToUnicode`
    * CMap carries the reverse mapping as `beginbfchar` groups of ≤ 100
    * (§9.10.3). Both streams are REAL FlateDecode, so the fixture
    * exercises filter chain → font resolution → CMap parse → CID decode
    * end-to-end. Extraction round-trips `text` exactly (surrogate pairs
    * ride as two mapped units that the JVM re-joins).
    */
  def synthIdentityHPdf(text: String): Array[Byte] =
    synthIdentityHPdf(text, encryptMode = -1)

  /** As [[synthIdentityHPdf]], with `encryptMode` 0/1/2/3 additionally
    * encrypting both streams under the standard security handler
    * (RC4-40 V1/R2 / RC4-128 V2/R3 / AES-128 V4/R4 AESV2 / AES-256
    * V5/R6 AESV3 — EMPTY user password, owner-restricted): per-object
    * keys over the deflated payloads for /V ≤ 4, the file key directly
    * for /V 5, /Encrypt dict + /ID in a trailer. Deterministic
    * throughout (ID from the text, IV from object number + ID), so the
    * fixture replays byte-identically.
    */
  def synthIdentityHPdf(text: String, encryptMode: Int): Array[Byte] =
    synthIdentityHPdf(text, encryptMode, "")

  /** As above with a NON-EMPTY user password (round 15): the document
    * only opens when the caller supplies it.
    */
  def synthIdentityHPdf(text: String, encryptMode: Int,
      userPassword: String): Array[Byte] = {
    val units = text.toCharArray
    val cidOf = scala.collection.mutable.LinkedHashMap.empty[Char, Int]
    units.foreach(c => cidOf.getOrElseUpdate(c, cidOf.size + 1))
    val hexCids = units.map(c => f"${cidOf(c)}%04X").mkString
    val content = s"BT /F1 12 Tf <$hexCids> Tj ET"
    val entries = cidOf.toSeq.map { case (c, cid) => f"<$cid%04X> <${c.toInt}%04X>" }
    val groups = entries.grouped(100)
      .map(g => s"${g.length} beginbfchar\n${g.mkString("\n")}\nendbfchar")
      .mkString("\n")
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Graft-Identity-ToUnicode def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
$groups
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    def cc(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val enc = if (encryptMode >= 0)
      Some(PdfCrypt.fixtureEncrypt(encryptMode, text,
        userPassword.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    else None
    def sealStream(num: Int, plain: Array[Byte]): Array[Byte] = enc match {
      case Some((_, dec, id0)) =>
        dec.encryptStream(num, 0, plain, PdfCrypt.fixtureIv(num, id0))
      case None => plain
    }
    val out = new ByteArrayOutputStream()
    out.write(cc("%PDF-1.4\n"))
    out.write(cc("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"))
    out.write(cc("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"))
    out.write(cc("3 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n"))
    out.write(cc("4 0 obj << /Type /Font /Subtype /Type0 /BaseFont /GraftSynth " +
      "/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >> endobj\n"))
    val contentZ = sealStream(5, deflate(content))
    out.write(cc(s"5 0 obj << /Length ${contentZ.length} /Filter /FlateDecode >>\nstream\n"))
    out.write(contentZ)
    out.write(cc("\nendstream\nendobj\n"))
    out.write(cc("6 0 obj << /Type /Font /Subtype /CIDFontType2 " +
      "/BaseFont /GraftSynth /CIDToGIDMap /Identity >> endobj\n"))
    val cmapZ = sealStream(7, deflate(cmap))
    out.write(cc(s"7 0 obj << /Length ${cmapZ.length} /Filter /FlateDecode >>\nstream\n"))
    out.write(cmapZ)
    out.write(cc("\nendstream\nendobj\n"))
    enc.foreach { case (dict, _, id0) =>
      val hx = id0.map(b => f"${b & 0xFF}%02X").mkString
      out.write(cc(s"8 0 obj $dict endobj\n"))
      out.write(cc(s"trailer << /Root 1 0 R /Encrypt 8 0 R /ID [<$hx> <$hx>] >>\n"))
    }
    out.write(cc("%%EOF\n"))
    out.toByteArray
  }

  /** Deterministic Identity-H fixture PDF WITHOUT a `/ToUnicode` CMap —
    * the round-15 FontFile2 path: `text`'s code points map to CIDs 1..k
    * in order of first appearance, and the mapping is carried ONLY by
    * the descendant CIDFontType2's embedded TrueType program, whose
    * `cmap` table the extractor must invert ([[TrueTypeCmap]]).
    *
    * `useStreamMap = false`: `/CIDToGIDMap /Identity`, glyph id == CID,
    * cmap emitted as a (3,10) format-12 subtable.
    * `useStreamMap = true`: glyph ids are CID+7 and a `/CIDToGIDMap`
    * STREAM (2-byte-BE per CID, §9.7.4.3) carries the shift, so
    * extraction must COMPOSE stream→cmap-inverse; the cmap is a (3,1)
    * format-4 subtable when the text is BMP-only (format 4 cannot
    * express astral code points — those texts upgrade to format 12).
    * Both the font program and the gid map ride real FlateDecode
    * streams, exercising the binary filter chain.
    */
  def synthCidFontPdf(text: String, useStreamMap: Boolean): Array[Byte] = {
    val cps = text.codePoints().toArray
    val cidOf = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    cps.foreach(cp => cidOf.getOrElseUpdate(cp, cidOf.size + 1))
    val hexCids = cps.map(cp => f"${cidOf(cp)}%04X").mkString
    val content = s"BT /F1 12 Tf <$hexCids> Tj ET"
    val shift = if (useStreamMap) 7 else 0
    val ttf = TrueTypeCmap.buildTtf(
      cidOf.toSeq.map { case (cp, cid) => cp -> (cid + shift) },
      forceFormat12 = !useStreamMap)
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    def cc(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new ByteArrayOutputStream()
    out.write(cc("%PDF-1.4\n"))
    out.write(cc("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"))
    out.write(cc("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"))
    out.write(cc("3 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n"))
    out.write(cc("4 0 obj << /Type /Font /Subtype /Type0 /BaseFont /GraftSynth " +
      "/Encoding /Identity-H /DescendantFonts [6 0 R] >> endobj\n"))
    val contentZ = deflate(content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.write(cc(s"5 0 obj << /Length ${contentZ.length} /Filter /FlateDecode >>\nstream\n"))
    out.write(contentZ)
    out.write(cc("\nendstream\nendobj\n"))
    val c2g = if (useStreamMap) "9 0 R" else "/Identity"
    out.write(cc("6 0 obj << /Type /Font /Subtype /CIDFontType2 " +
      s"/BaseFont /GraftSynth /FontDescriptor 7 0 R /CIDToGIDMap $c2g >> endobj\n"))
    out.write(cc("7 0 obj << /Type /FontDescriptor /FontName /GraftSynth " +
      "/Flags 4 /FontFile2 8 0 R >> endobj\n"))
    val ttfZ = deflate(ttf)
    out.write(cc(s"8 0 obj << /Length ${ttfZ.length} /Filter /FlateDecode " +
      s"/Length1 ${ttf.length} >>\nstream\n"))
    out.write(ttfZ)
    out.write(cc("\nendstream\nendobj\n"))
    if (useStreamMap) {
      val map = new Array[Byte](2 * (cidOf.size + 1)) // CID 0 → glyph 0
      cidOf.values.foreach { cid =>
        val gid = cid + shift
        map(2 * cid) = ((gid >> 8) & 0xFF).toByte
        map(2 * cid + 1) = (gid & 0xFF).toByte
      }
      val mapZ = deflate(map)
      out.write(cc(s"9 0 obj << /Length ${mapZ.length} /Filter /FlateDecode >>\nstream\n"))
      out.write(mapZ)
      out.write(cc("\nendstream\nendobj\n"))
    }
    out.write(cc("%%EOF\n"))
    out.toByteArray
  }

  /** Deterministic Identity-H fixture PDF whose page, Type0 font, and
    * descendant-font DICTIONARIES are packed inside a `/Type /ObjStm`
    * object stream (§7.5.7) — the PDF 1.5+ layout modern producers
    * emit, where a raw byte scan sees no font dict at all. The content
    * stream and the `/ToUnicode` CMap remain top-level (streams are
    * forbidden inside an ObjStm), both real FlateDecode; the ObjStm
    * payload is itself FlateDecode, so extraction must inflate the
    * container before it can even FIND the font. CID scheme matches
    * [[synthIdentityHPdf]] (UTF-16 code units → CIDs 1..k).
    */
  def synthObjStmPdf(text: String): Array[Byte] = {
    val units = text.toCharArray
    val cidOf = scala.collection.mutable.LinkedHashMap.empty[Char, Int]
    units.foreach(c => cidOf.getOrElseUpdate(c, cidOf.size + 1))
    val hexCids = units.map(c => f"${cidOf(c)}%04X").mkString
    val content = s"BT /F1 12 Tf <$hexCids> Tj ET"
    val entries = cidOf.toSeq.map { case (c, cid) => f"<$cid%04X> <${c.toInt}%04X>" }
    val groups = entries.grouped(100)
      .map(g => s"${g.length} beginbfchar\n${g.mkString("\n")}\nendbfchar")
      .mkString("\n")
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Graft-Identity-ToUnicode def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
$groups
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    def cc(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    // the three packed dictionaries: (objnum, body)
    val packed = Seq(
      3 -> ("<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"),
      4 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /GraftSynth " +
        "/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >>"),
      6 -> "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftSynth /CIDToGIDMap /Identity >>")
    val offsets = packed.scanLeft(0) { case (acc, (_, b)) => acc + b.length + 1 }
    val header = packed.zip(offsets).map { case ((num, _), off) => s"$num $off" }
      .mkString("", " ", "\n")
    val body = packed.map(_._2).mkString("", "\n", "\n")
    val stmPlain = header + body
    val first = header.length
    val stmZ = deflate(stmPlain.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val out = new ByteArrayOutputStream()
    out.write(cc("%PDF-1.5\n"))
    out.write(cc("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"))
    out.write(cc("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"))
    out.write(cc(s"10 0 obj << /Type /ObjStm /N ${packed.length} /First $first " +
      s"/Length ${stmZ.length} /Filter /FlateDecode >>\nstream\n"))
    out.write(stmZ)
    out.write(cc("\nendstream\nendobj\n"))
    val contentZ = deflate(content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.write(cc(s"5 0 obj << /Length ${contentZ.length} /Filter /FlateDecode >>\nstream\n"))
    out.write(contentZ)
    out.write(cc("\nendstream\nendobj\n"))
    val cmapZ = deflate(cmap.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.write(cc(s"7 0 obj << /Length ${cmapZ.length} /Filter /FlateDecode >>\nstream\n"))
    out.write(cmapZ)
    out.write(cc("\nendstream\nendobj\n"))
    out.write(cc("%%EOF\n"))
    out.toByteArray
  }

  // ---- stage 3: content-stream text operators ----------------------------

  private def containsTextBlock(data: Array[Byte]): Boolean =
    data.nonEmpty && indexOf(data, "BT", 0) >= 0 && indexOf(data, "ET", 0) >= 0

  private sealed trait Tok
  private final case class Str(s: String) extends Tok
  private final case class Num(v: Double) extends Tok
  private final case class Name(n: String) extends Tok
  private final case class Op(name: String) extends Tok
  private case object ArrStart extends Tok
  private case object ArrEnd extends Tok

  /** Walk the token stream; show-text operands append inside BT…ET only.
    * Newlines: `'` and `"` are next-line-show by definition; `T*` moves a
    * line; `Td`/`TD` emit one when the vertical displacement is non-zero
    * (the one-line-per-positioning heuristic PyPDF's layout-less mode
    * uses). Inside a `TJ` array a kern more negative than −180/1000 em is
    * rendered as a word gap. `Tf` tracks the current font: while an
    * Identity-H font with a ToUnicode CMap is selected, show-text strings
    * decode as 2-byte CIDs through it.
    */
  private[sources] def contentText(data: Array[Byte],
      fonts: Map[String, Map[Int, String]] = Map.empty,
      simpleFonts: Map[String, Array[String]] = Map.empty): String = {
    val out = new StringBuilder
    var inBT = false
    var pend = List.empty[Tok] // operand stack (reverse order)
    var arr: List[Tok] = null  // non-null while inside [ … ]
    var cmap: Map[Int, String] = null // non-null while a CID font is selected
    var simple: Array[String] = null  // non-null while a simple font with a known encoding is selected

    def push(t: Tok): Unit = if (arr != null) arr = t :: arr else pend = t :: pend
    def newline(): Unit = if (out.nonEmpty && !out.endsWith("\n")) out.append('\n')
    def show(s: String): String =
      if (cmap != null) decodeCids(s, cmap)
      else if (simple != null) {
        val sb = new StringBuilder(s.length)
        var i = 0
        while (i < s.length) { sb.append(simple(s.charAt(i) & 0xFF)); i += 1 }
        sb.result()
      } else s
    def lastStr: String = pend.collectFirst { case Str(s) => show(s) }.getOrElse("")

    val toks = tokenize(data)
    toks.foreach {
      case ArrStart => arr = Nil
      case ArrEnd if arr != null => // finished array becomes the pending TJ operand
        val done = arr; arr = null; pend = ArrEnd :: (done ++ (ArrStart :: pend))
      case ArrEnd => () // unbalanced ']' in a malformed stream: drop
      case op: Op if op.name == "BT" => inBT = true; pend = Nil
      case op: Op if op.name == "ET" => inBT = false; newline(); pend = Nil
      case op: Op =>
        op.name match {
          case "Tf" => // /Fname size Tf — selects the font, inside BT or out
            val fname = pend.collectFirst { case Name(n) => n }
            cmap = fname.flatMap(fonts.get).orNull
            simple = if (cmap != null) null
              else fname.flatMap(simpleFonts.get).orNull
          case _ => ()
        }
        if (inBT) op.name match {
          case "Tj" => out.append(lastStr)
          case "'" => newline(); out.append(lastStr)
          case "\"" => newline(); out.append(lastStr)
          case "T*" => newline()
          case "Td" | "TD" =>
            // operands pushed in reverse: head is ty
            pend match {
              case Num(ty) :: _ if ty != 0.0 => newline()
              case _ => ()
            }
          case "TJ" =>
            // pend holds ArrEnd :: elems-reversed ::: ArrStart :: rest
            val elems = pend.dropWhile(_ == ArrEnd)
              .takeWhile(_ != ArrStart).reverse
            elems.foreach {
              case Str(s) => out.append(show(s))
              case Num(v) if v < -180.0 => out.append(' ')
              case _ => ()
            }
          case _ => ()
        }
        pend = Nil
      case t => push(t)
    }
    out.result()
  }

  private def tokenize(data: Array[Byte]): Iterator[Tok] = new Iterator[Tok] {
    private var i = 0
    private var nextTok: Tok = advance()
    override def hasNext: Boolean = nextTok != null
    override def next(): Tok = { val t = nextTok; nextTok = advance(); t }

    private def cur: Char = (data(i) & 0xff).toChar
    private def ws(c: Char) = c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0

    @annotation.tailrec
    private def advance(): Tok = {
      while (i < data.length && ws(cur)) i += 1
      if (i >= data.length) null
      else cur match {
        case '%' => // comment to EOL
          while (i < data.length && cur != '\n' && cur != '\r') i += 1
          advance()
        case '(' => i += 1; Str(literalString())
        case '<' if i + 1 < data.length && (data(i + 1) & 0xff).toChar == '<' =>
          i += 2; advance() // dict open: ignore
        case '>' if i + 1 < data.length && (data(i + 1) & 0xff).toChar == '>' =>
          i += 2; advance() // dict close
        case '<' => i += 1; Str(hexString())
        case '[' => i += 1; ArrStart
        case ']' => i += 1; ArrEnd
        case '/' => // name object: kept for Tf font selection
          i += 1
          val start = i
          while (i < data.length && !ws(cur) && !"()<>[]{}/%".contains(cur)) i += 1
          Name(new String(data, start, i - start, "ISO-8859-1"))
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val start = i
          i += 1
          while (i < data.length && (cur == '.' || (cur >= '0' && cur <= '9'))) i += 1
          try Num(new String(data, start, i - start, "ISO-8859-1").toDouble)
          catch { case _: NumberFormatException => advance() }
        case _ => // operator: run of regular characters
          val start = i
          i += 1
          while (i < data.length && !ws(cur) && !"()<>[]{}/%".contains(cur)) i += 1
          Op(new String(data, start, i - start, "ISO-8859-1"))
      }
    }

    /** `(…)` with balanced parens and the §7.3.4.2 escape table. */
    private def literalString(): String = {
      val sb = new StringBuilder
      var depth = 1
      while (i < data.length && depth > 0) {
        val c = cur
        i += 1
        c match {
          case '(' => depth += 1; sb.append('(')
          case ')' => depth -= 1; if (depth > 0) sb.append(')')
          case '\\' if i < data.length =>
            val e = cur; i += 1
            e match {
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case '(' => sb.append('(')
              case ')' => sb.append(')')
              case '\\' => sb.append('\\')
              case '\r' => if (i < data.length && cur == '\n') i += 1 // line continuation
              case '\n' => () // line continuation
              case d if d >= '0' && d <= '7' => // up to 3 octal digits
                var v = d - '0'
                var n = 1
                while (n < 3 && i < data.length && cur >= '0' && cur <= '7') {
                  v = v * 8 + (cur - '0'); i += 1; n += 1
                }
                sb.append((v & 0xff).toChar)
              case other => sb.append(other) // spec: backslash is dropped
            }
          case other => sb.append(other)
        }
      }
      sb.result()
    }

    /** `<hex>`; odd final digit padded with 0 per spec. */
    private def hexString(): String = {
      val sb = new StringBuilder
      val digits = new StringBuilder
      while (i < data.length && cur != '>') {
        val c = cur
        if (Character.digit(c, 16) >= 0) digits.append(c)
        i += 1
      }
      if (i < data.length) i += 1 // consume '>'
      if (digits.length % 2 == 1) digits.append('0')
      var j = 0
      while (j < digits.length) {
        sb.append(Integer.parseInt(digits.substring(j, j + 2), 16).toChar)
        j += 2
      }
      sb.result()
    }
  }
}
