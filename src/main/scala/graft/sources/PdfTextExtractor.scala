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
  * Deliberately out of scope (the documented fallback remains
  * [[PdfIngest.stubPdfToText]]): CID/Type0 composite fonts with multi-byte
  * encodings, encrypted documents, DCT/JPX image filters, and object
  * streams (`/ObjStm` — the spec forbids streams inside one, so they carry
  * cross-reference structure, never page content; this byte-scan never
  * needs them). A chain containing an unsupported filter yields empty
  * bytes, never garbage text.
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

  /** All pages' text, blocks newline-joined; "" when nothing decodable. */
  def extract(bytes: Array[Byte]): String = {
    if (!isPdf(bytes)) return ""
    val out = new StringBuilder
    for ((dict, payload) <- rawStreams(bytes)) {
      val data = decodePayload(dict, payload)
      if (containsTextBlock(data)) {
        val text = contentText(data)
        if (text.nonEmpty) {
          if (out.nonEmpty && !out.endsWith("\n")) out.append('\n')
          out.append(text)
        }
      }
    }
    out.result().trim
  }

  // ---- stage 1: stream payloads ------------------------------------------

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
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

  /** (owning-dict text, payload bytes) for each `stream…endstream`. The
    * dict is the byte span from the nearest preceding `obj` keyword — close
    * enough to read `/Filter` without resolving indirect references.
    */
  private def rawStreams(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val found = Seq.newBuilder[(String, Array[Byte])]
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
        val end = indexOf(bytes, "endstream", payloadStart)
        if (end > payloadStart) {
          var payloadEnd = end
          // strip the EOL that precedes `endstream`
          if (payloadEnd > payloadStart && bytes(payloadEnd - 1) == '\n') payloadEnd -= 1
          if (payloadEnd > payloadStart && bytes(payloadEnd - 1) == '\r') payloadEnd -= 1
          lastObj = lastIndexOfObj(bytes, lastObj, streamAt)
          val dict = new String(bytes, lastObj, streamAt - lastObj, "ISO-8859-1")
          found += ((dict, java.util.Arrays.copyOfRange(bytes, payloadStart, payloadEnd)))
          pos = end + "endstream".length
        } else pos = payloadStart
      } else pos = payloadStart
      streamAt = indexOf(bytes, "stream", pos)
    }
    found.result()
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

  private def intParam(dict: String, name: String): Option[Int] =
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

  // ---- stage 3: content-stream text operators ----------------------------

  private def containsTextBlock(data: Array[Byte]): Boolean =
    data.nonEmpty && indexOf(data, "BT", 0) >= 0 && indexOf(data, "ET", 0) >= 0

  private sealed trait Tok
  private final case class Str(s: String) extends Tok
  private final case class Num(v: Double) extends Tok
  private final case class Op(name: String) extends Tok
  private case object ArrStart extends Tok
  private case object ArrEnd extends Tok

  /** Walk the token stream; show-text operands append inside BT…ET only.
    * Newlines: `'` and `"` are next-line-show by definition; `T*` moves a
    * line; `Td`/`TD` emit one when the vertical displacement is non-zero
    * (the one-line-per-positioning heuristic PyPDF's layout-less mode
    * uses). Inside a `TJ` array a kern more negative than −180/1000 em is
    * rendered as a word gap.
    */
  private[sources] def contentText(data: Array[Byte]): String = {
    val out = new StringBuilder
    var inBT = false
    var pend = List.empty[Tok] // operand stack (reverse order)
    var arr: List[Tok] = null  // non-null while inside [ … ]

    def push(t: Tok): Unit = if (arr != null) arr = t :: arr else pend = t :: pend
    def newline(): Unit = if (out.nonEmpty && !out.endsWith("\n")) out.append('\n')
    def lastStr: String = pend.collectFirst { case Str(s) => s }.getOrElse("")

    val toks = tokenize(data)
    toks.foreach {
      case ArrStart => arr = Nil
      case ArrEnd if arr != null => // finished array becomes the pending TJ operand
        val done = arr; arr = null; pend = ArrEnd :: (done ++ (ArrStart :: pend))
      case ArrEnd => () // unbalanced ']' in a malformed stream: drop
      case op: Op if op.name == "BT" => inBT = true; pend = Nil
      case op: Op if op.name == "ET" => inBT = false; newline(); pend = Nil
      case op: Op =>
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
              case Str(s) => out.append(s)
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
        case '/' => // name object: ignore
          i += 1
          while (i < data.length && !ws(cur) && !"()<>[]{}/%".contains(cur)) i += 1
          advance()
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
