package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PdfCrypt, PdfTextExtractor}

/** Goldens for the standard-security-handler slice: RC4 against the
  * classic published vector, all three handler generations round-tripping
  * REAL encrypted fixtures through the extractor, and the refusal paths
  * (unencrypted, tampered /U, truncated AES payload).
  */
class PdfCryptSpec extends AnyFunSuite {

  test("RC4 matches the published Key/Plaintext vector and is its own inverse") {
    val key = "Key".getBytes("US-ASCII")
    val ct = PdfCrypt.rc4(key, "Plaintext".getBytes("US-ASCII"))
    assert(ct.map(b => f"${b & 0xFF}%02X").mkString == "BBF316E8D940AF0AD3")
    assert(new String(PdfCrypt.rc4(key, ct), "US-ASCII") == "Plaintext")
  }

  test("encrypted Identity-H fixtures round-trip through extract() for RC4-40, RC4-128 and AES-128") {
    val text = "Résumé content — 😀 and ASCII both, across the CID path."
    for (mode <- 0 to 2) {
      val pdf = PdfTextExtractor.synthIdentityHPdf(text, mode)
      // the document must actually be unreadable without decryption:
      // its streams are not valid zlib
      assert(new String(pdf, "ISO-8859-1").contains("/Encrypt"))
      val got = PdfTextExtractor.extract(pdf)
      assert(got == text, s"mode $mode")
    }
    // unencrypted baseline still works and reports no decryptor
    val plain = PdfTextExtractor.synthIdentityHPdf(text)
    assert(PdfCrypt.decryptorFor(plain).isEmpty)
    assert(PdfTextExtractor.extract(plain) == text)
  }

  test("refusal paths: tampered /U fails verification and extraction yields empty, never garbage") {
    val text = "secret body text"
    val pdf = PdfTextExtractor.synthIdentityHPdf(text, 2)
    val s = new String(pdf, "ISO-8859-1")
    val uAt = s.indexOf("/U <")
    assert(uAt > 0)
    val bad = pdf.clone()
    // flip one hex digit of /U: empty-password auth must now fail
    bad(uAt + 4) = (if (bad(uAt + 4) == '0') '1' else '0').toByte
    assert(PdfCrypt.decryptorFor(bad).isEmpty)
    val got = PdfTextExtractor.extract(bad)
    assert(got == "", s"expected empty, got: $got")
    // V5/AES-256 (unsupported) also refuses cleanly
    val v5 = new String(pdf, "ISO-8859-1").replace("/V 4 /R 4", "/V 5 /R 6")
    assert(PdfCrypt.decryptorFor(v5.getBytes("ISO-8859-1")).isEmpty)
  }
}
