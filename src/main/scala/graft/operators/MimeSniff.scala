package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-type sniffing over payload bytes — the WHATWG mime-sniffing
  * algorithm's magic-number core (https://mimesniff.spec.whatwg.org §6),
  * the step a crawl pipeline runs on every fetched payload because
  * declared `Content-Type` headers lie constantly at corpus scale
  * (mislabeled images, gzip served as text, binaries as text/plain).
  * Downstream routing — HTML extraction vs container walk vs PDF decode
  * vs drop — keys off the SNIFFED type; the declared/sniffed mismatch
  * census (q286) is the data-quality diagnostic.
  *
  * Pure `Column` expression over `hex()` prefixes of the payload (one
  * scan-side pass, bytes never leave their task): the byte-pattern table
  * below is the spec's §6.1 "pattern matching algorithm" rows this corpus
  * can contain, the HTML probe is the spec's §7.1 whitespace-skipped
  * case-insensitive tag scan (`<!DOCTYPE HTML` / `<HTML` — the dominant
  * two of the spec's tag list), and the text/plain fallback is the spec's
  * §4 binary-byte check restricted to the first 64 bytes (a 0x00-0x08/
  * 0x0B/0x0E-0x1F byte anywhere in the head marks the payload binary).
  */
object MimeSniff {

  /** Sniffed MIME type of payload bytes (see object doc). */
  def sniffMime(bin: Column): Column = {
    val hx = hex(substring(bin, 1, 16)) // uppercase hex of the magic window
    // lossless byte→char view of the head for the tag scan + binary check
    val head = decode(substring(bin, 1, 64), "ISO-8859-1")
    val tag = upper(regexp_replace(head, "^[ \\t\\r\\n\\x0C]+", ""))
    when(hx.startsWith("255044462D"), "application/pdf") // %PDF-
      .when(hx.startsWith("89504E470D0A1A0A"), "image/png")
      .when(hx.startsWith("FFD8FF"), "image/jpeg")
      .when(hx.startsWith("474946383761") || hx.startsWith("474946383961"),
        "image/gif") // GIF87a / GIF89a
      .when(hx.startsWith("504B0304"), "application/zip") // PK\x03\x04
      .when(hx.startsWith("1F8B"), "application/gzip")
      .when(hx.startsWith("4F676753"), "application/ogg") // OggS
      .when(hx.startsWith("664C6143"), "audio/flac") // fLaC
      .when(hx.startsWith("494433"), "audio/mpeg") // ID3
      .when(hx.startsWith("52494646") && // RIFF....WAVE
        hex(substring(bin, 9, 4)) === "57415645", "audio/wav")
      .when(tag.startsWith("<!DOCTYPE HTML") || tag.startsWith("<HTML"),
        "text/html")
      .when(head.rlike("^[\\x09\\x0A\\x0D\\x20-\\xFF]*$"), "text/plain")
      .otherwise("application/octet-stream")
  }
}
