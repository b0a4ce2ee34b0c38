package graft.sources

/** Single-byte simple-font encodings (ISO 32000-2 Annex D) and glyph-name
  * → Unicode resolution for `/Differences` arrays — the round-15 fidelity
  * pass for NON-composite fonts (`/TrueType`, `/Type1`): before this, a
  * high byte in a show-text string decoded as its Latin-1 identity, which
  * is right for `/WinAnsiEncoding`'s 0xA0–0xFF block but wrong for
  * 0x80–0x9F (cp1252's punctuation/quote block) and wrong everywhere for
  * `/MacRomanEncoding`.
  *
  * Glyph names resolve in the standard precedence real extractors use:
  * the algorithmic `uniXXXX` / `uXXXX[XX]` forms first (Adobe's glyph
  * naming convention, exact by construction), then a curated subset of
  * the Adobe Glyph List covering the Latin repertoire simple fonts
  * actually carry. An unknown name maps to NOTHING — the never-a-wrong-
  * glyph contract — and the consumer drops that code.
  */
object PdfEncodings {

  /** cp1252 0x80–0x9F, the block where WinAnsi and Latin-1 disagree
    * (undefined codes 0x81/0x8D/0x8F/0x90/0x9D absent).
    */
  val winAnsiHigh: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  /** Mac OS Roman 0x80–0xFF (PDF Annex D.2's MacRomanEncoding column). */
  val macRomanHigh: Map[Int, Char] = Map(
    0x80 -> 'Ä', 0x81 -> 'Å', 0x82 -> 'Ç', 0x83 -> 'É',
    0x84 -> 'Ñ', 0x85 -> 'Ö', 0x86 -> 'Ü', 0x87 -> 'á',
    0x88 -> 'à', 0x89 -> 'â', 0x8A -> 'ä', 0x8B -> 'ã',
    0x8C -> 'å', 0x8D -> 'ç', 0x8E -> 'é', 0x8F -> 'è',
    0x90 -> 'ê', 0x91 -> 'ë', 0x92 -> 'í', 0x93 -> 'ì',
    0x94 -> 'î', 0x95 -> 'ï', 0x96 -> 'ñ', 0x97 -> 'ó',
    0x98 -> 'ò', 0x99 -> 'ô', 0x9A -> 'ö', 0x9B -> 'õ',
    0x9C -> 'ú', 0x9D -> 'ù', 0x9E -> 'û', 0x9F -> 'ü',
    0xA0 -> '†', 0xA1 -> '°', 0xA2 -> '¢', 0xA3 -> '£',
    0xA4 -> '§', 0xA5 -> '•', 0xA6 -> '¶', 0xA7 -> 'ß',
    0xA8 -> '®', 0xA9 -> '©', 0xAA -> '™', 0xAB -> '´',
    0xAC -> '¨', 0xAE -> 'Æ', 0xAF -> 'Ø',
    0xB0 -> '∞', 0xB1 -> '±', 0xB4 -> '¥',
    0xB5 -> 'µ', 0xBB -> 'ª', 0xBC -> 'º',
    0xBE -> 'æ', 0xBF -> 'ø',
    0xC0 -> '¿', 0xC1 -> '¡', 0xC2 -> '¬',
    0xC4 -> 'ƒ', 0xC7 -> '«', 0xC8 -> '»',
    0xC9 -> '…', 0xCA -> ' ', 0xCB -> 'À', 0xCC -> 'Ã',
    0xCD -> 'Õ', 0xCE -> 'Œ', 0xCF -> 'œ',
    0xD0 -> '–', 0xD1 -> '—', 0xD2 -> '“', 0xD3 -> '”',
    0xD4 -> '‘', 0xD5 -> '’', 0xD6 -> '÷',
    0xD8 -> 'ÿ', 0xD9 -> 'Ÿ', 0xDA -> '⁄', 0xDB -> '¤',
    0xDC -> '‹', 0xDD -> '›', 0xDE -> 'ﬁ', 0xDF -> 'ﬂ',
    0xE0 -> '‡', 0xE1 -> '·', 0xE2 -> '‚', 0xE3 -> '„',
    0xE4 -> '‰', 0xE5 -> 'Â', 0xE6 -> 'Ê', 0xE7 -> 'Á',
    0xE8 -> 'Ë', 0xE9 -> 'È', 0xEA -> 'Í', 0xEB -> 'Î',
    0xEC -> 'Ï', 0xED -> 'Ì', 0xEE -> 'Ó', 0xEF -> 'Ô',
    0xF1 -> 'Ò', 0xF2 -> 'Ú', 0xF3 -> 'Û', 0xF4 -> 'Ù',
    0xF5 -> 'ı', 0xF6 -> 'ˆ', 0xF7 -> '˜', 0xF8 -> '¯',
    0xF9 -> '˘', 0xFA -> '˙', 0xFB -> '˚', 0xFC -> '¸',
    0xFD -> '˝', 0xFE -> '˛', 0xFF -> 'ˇ')

  /** Adobe Glyph List subset: the Latin/punctuation names `/Differences`
    * arrays actually carry. Sourced from the published AGL (the names
    * are the spec's own identifiers); anything outside this subset that
    * is not an algorithmic `uniXXXX` name resolves to None.
    */
  private val aglSubset: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
    "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
    "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
    "parenright" -> ")", "asterisk" -> "*", "plus" -> "+", "comma" -> ",",
    "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
    "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
    "eight" -> "8", "nine" -> "9", "colon" -> ":", "semicolon" -> ";",
    "less" -> "<", "equal" -> "=", "greater" -> ">", "question" -> "?",
    "at" -> "@", "bracketleft" -> "[", "backslash" -> "\\",
    "bracketright" -> "]", "asciicircum" -> "^", "underscore" -> "_",
    "grave" -> "`", "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
    "asciitilde" -> "~",
    "exclamdown" -> "¡", "cent" -> "¢", "sterling" -> "£",
    "currency" -> "¤", "yen" -> "¥", "brokenbar" -> "¦",
    "section" -> "§", "dieresis" -> "¨", "copyright" -> "©",
    "ordfeminine" -> "ª", "guillemotleft" -> "«",
    "logicalnot" -> "¬", "registered" -> "®", "macron" -> "¯",
    "degree" -> "°", "plusminus" -> "±", "acute" -> "´",
    "mu" -> "µ", "paragraph" -> "¶", "periodcentered" -> "·",
    "cedilla" -> "¸", "ordmasculine" -> "º",
    "guillemotright" -> "»", "onequarter" -> "¼",
    "onehalf" -> "½", "threequarters" -> "¾",
    "questiondown" -> "¿",
    "Agrave" -> "À", "Aacute" -> "Á", "Acircumflex" -> "Â",
    "Atilde" -> "Ã", "Adieresis" -> "Ä", "Aring" -> "Å",
    "AE" -> "Æ", "Ccedilla" -> "Ç", "Egrave" -> "È",
    "Eacute" -> "É", "Ecircumflex" -> "Ê", "Edieresis" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icircumflex" -> "Î",
    "Idieresis" -> "Ï", "Eth" -> "Ð", "Ntilde" -> "Ñ",
    "Ograve" -> "Ò", "Oacute" -> "Ó", "Ocircumflex" -> "Ô",
    "Otilde" -> "Õ", "Odieresis" -> "Ö", "multiply" -> "×",
    "Oslash" -> "Ø", "Ugrave" -> "Ù", "Uacute" -> "Ú",
    "Ucircumflex" -> "Û", "Udieresis" -> "Ü", "Yacute" -> "Ý",
    "Thorn" -> "Þ", "germandbls" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â",
    "atilde" -> "ã", "adieresis" -> "ä", "aring" -> "å",
    "ae" -> "æ", "ccedilla" -> "ç", "egrave" -> "è",
    "eacute" -> "é", "ecircumflex" -> "ê", "edieresis" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icircumflex" -> "î",
    "idieresis" -> "ï", "eth" -> "ð", "ntilde" -> "ñ",
    "ograve" -> "ò", "oacute" -> "ó", "ocircumflex" -> "ô",
    "otilde" -> "õ", "odieresis" -> "ö", "divide" -> "÷",
    "oslash" -> "ø", "ugrave" -> "ù", "uacute" -> "ú",
    "ucircumflex" -> "û", "udieresis" -> "ü", "yacute" -> "ý",
    "thorn" -> "þ", "ydieresis" -> "ÿ",
    "OE" -> "Œ", "oe" -> "œ", "Scaron" -> "Š",
    "scaron" -> "š", "Ydieresis" -> "Ÿ", "Zcaron" -> "Ž",
    "zcaron" -> "ž", "florin" -> "ƒ", "circumflex" -> "ˆ",
    "caron" -> "ˇ", "breve" -> "˘", "dotaccent" -> "˙",
    "ring" -> "˚", "ogonek" -> "˛", "tilde" -> "˜",
    "hungarumlaut" -> "˝", "endash" -> "–", "emdash" -> "—",
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotesinglbase" -> "‚", "quotedblleft" -> "“",
    "quotedblright" -> "”", "quotedblbase" -> "„",
    "dagger" -> "†", "daggerdbl" -> "‡", "bullet" -> "•",
    "ellipsis" -> "…", "perthousand" -> "‰",
    "guilsinglleft" -> "‹", "guilsinglright" -> "›",
    "fraction" -> "⁄", "Euro" -> "€", "trademark" -> "™",
    "minus" -> "−", "fi" -> "ﬁ", "fl" -> "ﬂ",
    "dotlessi" -> "ı", "nbspace" -> " ")

  private val UniRe = """uni([0-9A-F]{4})""".r
  private val URe = """u([0-9A-F]{4,6})""".r

  /** Resolve one glyph name to its text. Algorithmic `uniXXXX`/`uXXXXXX`
    * first (exact by construction; surrogate code points refused), then
    * single ASCII letters/digits (AGL maps them to themselves), then the
    * AGL subset. None = drop the code, never guess.
    */
  def glyphName(name: String): Option[String] = name match {
    case UniRe(hex) =>
      val cp = Integer.parseInt(hex, 16)
      if (cp >= 0xD800 && cp <= 0xDFFF) None else Some(cp.toChar.toString)
    case URe(hex) =>
      val cp = Integer.parseInt(hex, 16)
      if (cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) None
      else Some(new String(Character.toChars(cp)))
    case n if n.length == 1 && n.head.isLetterOrDigit && n.head < 0x80 =>
      Some(n)
    case n => aglSubset.get(n)
  }

  /** 256-entry base table for a named encoding. WinAnsi is cp1252
    * (Latin-1 + the 0x80–0x9F block, control bytes undefined per the
    * spec's table); MacRoman is ASCII low + the Mac high block;
    * anything else (incl. the implicit StandardEncoding default) keeps
    * the long-standing FULL Latin-1 identity fallback — Standard
    * differs from it only in rare punctuation slots, and a fallback
    * that never INVENTS non-Latin glyphs stays debuggable.
    */
  def baseTable(encoding: String): Array[String] = {
    val t = Array.tabulate(256)(i => i.toChar.toString)
    encoding match {
      case "WinAnsiEncoding" =>
        (0x00 until 0x20).foreach(i => t(i) = "")
        (0x80 to 0x9F).foreach(i => t(i) = winAnsiHigh.get(i).map(_.toString).getOrElse(""))
      case "MacRomanEncoding" =>
        (0x00 until 0x20).foreach(i => t(i) = "")
        (0x80 to 0xFF).foreach(i => t(i) = macRomanHigh.get(i).map(_.toString).getOrElse(""))
      case _ => ()
    }
    t
  }
}
