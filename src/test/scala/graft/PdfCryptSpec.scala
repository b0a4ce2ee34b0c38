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

  test("encrypted Identity-H fixtures round-trip through extract() for RC4-40, RC4-128, AES-128 and AES-256") {
    val text = "Résumé content — 😀 and ASCII both, across the CID path."
    for (mode <- 0 to 3) {
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
    // a mislabeled generation (V5 dict without /UE et al.) refuses cleanly
    val v5 = new String(pdf, "ISO-8859-1").replace("/V 4 /R 4", "/V 5 /R 6")
    assert(PdfCrypt.decryptorFor(v5.getBytes("ISO-8859-1")).isEmpty)
  }

  test("V5/R6: Algorithm 2.B properties, /U auth, /UE unwrap, /Perms gate, tamper refusals") {
    val text = "modern AES-256 document body"
    val pdf = PdfTextExtractor.synthIdentityHPdf(text, 3)
    val s = new String(pdf, "ISO-8859-1")
    assert(s.contains("/AESV3") && s.contains("/UE <") && s.contains("/Perms <"))
    // hash2B is deterministic and salt-sensitive; R5 degenerates to one SHA-256
    val e = Array.emptyByteArray
    val salt = Array.tabulate[Byte](8)(_.toByte)
    val h1 = PdfCrypt.hash2B(e, salt, e, 6)
    assert(h1.length == 32)
    assert(h1.sameElements(PdfCrypt.hash2B(e, salt, e, 6)))
    assert(!h1.sameElements(PdfCrypt.hash2B(e, salt.map(b => (b ^ 1).toByte), e, 6)))
    val h5 = PdfCrypt.hash2B(e, salt, e, 5)
    assert(h5.sameElements(java.security.MessageDigest.getInstance("SHA-256").digest(salt)))
    assert(!h1.sameElements(h5)) // R6 iterates past the seed hash
    // full round-trip through the extractor (file-key streams, no obj keys)
    assert(PdfTextExtractor.extract(pdf) == text)
    // tampered /U → auth fails → stub path (empty, never garbage)
    val uAt = s.indexOf("/U <")
    val bad = pdf.clone()
    bad(uAt + 4) = (if (bad(uAt + 4) == '0') '1' else '0').toByte
    assert(PdfCrypt.decryptorFor(bad).isEmpty)
    assert(PdfTextExtractor.extract(bad) == "")
    // tampered /Perms → Algorithm 13 sanity fails closed
    val pAt = s.indexOf("/Perms <")
    val badP = pdf.clone()
    badP(pAt + 8) = (if (badP(pAt + 8) == '0') '1' else '0').toByte
    assert(PdfCrypt.decryptorFor(badP).isEmpty)
    // /U vs /UE token boundary: both parse distinctly (a /U lookup that
    // landed on /UE would break auth; this pins the boundary rule)
    assert(s.indexOf("/UE <") != uAt)
  }
}
