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

  // -------------------------------------------------------------------
  // EXTERNAL Algorithm 2.B vectors — produced by an INDEPENDENT
  // implementation (scripts/gen_r6_vectors.py: Python hashlib +
  // `cryptography`, written from the ISO 32000-2 §7.6.4.3.4 text, zero
  // shared code with hash2B). Before round 15 the R6 fixtures were
  // circular: builder and verifier shared hash2B, so a bug in the
  // iteration/termination loop would pass every test and fail on every
  // real R6 PDF. These vectors break that circularity.
  // -------------------------------------------------------------------

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def hx(b: Array[Byte]): String = b.map(x => f"${x & 0xFF}%02X").mkString

  test("hash2B matches the externally-generated Algorithm 2.B vectors") {
    val e = Array.emptyByteArray
    val salt07 = Array.tabulate[Byte](8)(_.toByte)
    // empty pw, salt 00..07, no udata
    assert(hx(PdfCrypt.hash2B(e, salt07, e, 6)) ==
      "1403C04EB647D2E60452DFC4EB0A5E0CF322E8A83A759EABBD17D498A93BA041")
    // empty pw, salt A5*8, no udata (different termination-round path)
    assert(hx(PdfCrypt.hash2B(e, Array.fill[Byte](8)(0xA5.toByte), e, 6)) ==
      "5488483891183A145CEEDC0696C94D888251ED48719E15B6BCC931B669495AF2")
    // empty pw with a 48-byte udata — the /O computation path
    val udata48 = Array.tabulate[Byte](48)(i => ((i * 7 + 3) % 256).toByte)
    assert(hx(PdfCrypt.hash2B(e, salt07, udata48, 6)) ==
      "64593B5DE694FCB2954C93E5468C969D73F9CB002CCF93C0951A8ECE674337E3")
    // non-empty password (pw rides inside the 64x repeated block)
    val pw = "graft-owner".getBytes("US-ASCII")
    val salt1017 = Array.tabulate[Byte](8)(i => (16 + i).toByte)
    val udataB = Array.tabulate[Byte](48)(i => ((i * 11 + 5) % 256).toByte)
    assert(hx(PdfCrypt.hash2B(pw, salt1017, udataB, 6)) ==
      "DF68FEE29AD78C3C2E9DF1CB28CF9E63B5F5A9D07A26DE0793CB32803384AC72")
  }

  /** Minimal document bytes around an externally-authored Encrypt dict. */
  private def docWith(dict: String): Array[Byte] =
    ("%PDF-1.7\n1 0 obj\n" + dict + "\nendobj\ntrailer\n" +
      "<< /Encrypt 1 0 R /ID [<00112233445566778899AABBCCDDEEFF>" +
      "<00112233445566778899AABBCCDDEEFF>] >>\n%%EOF")
      .getBytes("ISO-8859-1")

  // the Python-built credential set (Algorithm 8 / 2.A forward direction)
  private val ExtFileKey =
    "010E1B2835424F5C697683909DAAB7C4D1DEEBF805121F2C394653606D7A8794"
  private val ExtU = "56AF12F56D50526F2E99953DD63CA826EC81F539B71DA705740E09" +
    "6D967FBEF6202122232425262728292A2B2C2D2E2F"
  private val ExtUE = "7A1FDA7884F87003412D24AB516291A276BE8753D01762228D6E9229CF2694EF"
  private val ExtO = "D401846A0B7FB2E694255EB044E44365CA2F29EA964041D4300EDC" +
    "AB3814D4F6303132333435363738393A3B3C3D3E3F"
  private val ExtOE = "731225F931C9F9036A3DA8DDE25F6FFC520D7B0C49A4AF60404C90D92BDC65A5"

  test("decryptorV5 recovers the file key from the externally-built R6 credential set") {
    val dict = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
      "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
      "/StmF /StdCF /StrF /StdCF " +
      s"/O <$ExtO> /OE <$ExtOE> /U <$ExtU> /UE <$ExtUE> /P -3904 >>"
    val dec = PdfCrypt.decryptorFor(docWith(dict))
    assert(dec.isDefined, "empty-user-password auth must succeed")
    assert(hx(dec.get.key) == ExtFileKey)
    assert(dec.get.v5 && dec.get.aes && !dec.get.identity)
  }

  test("V5 /StmF /Identity authenticates but passes stream bytes through verbatim") {
    val dict = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
      "/CF << /StdCF << /CFM /AESV3 >> >> /StmF /Identity /StrF /StdCF " +
      s"/O <$ExtO> /OE <$ExtOE> /U <$ExtU> /UE <$ExtUE> /P -3904 >>"
    val dec = PdfCrypt.decryptorFor(docWith(dict))
    assert(dec.isDefined && dec.get.identity)
    val data = Array.tabulate[Byte](37)(_.toByte) // not even AES-block-sized
    assert(dec.get.decryptStream(7, 0, data).sameElements(data))
    // and an UNKNOWN stream filter name refuses cleanly
    val odd = PdfCrypt.decryptorFor(docWith(dict.replace("/StmF /Identity", "/StmF /OddCF")))
    assert(odd.isEmpty)
  }

  test("non-empty user passwords: the document opens ONLY with the credential, all four generations") {
    val text = "credentialed corpus body — Résumé 😀"
    for (mode <- 0 to 3) {
      val pdf = PdfTextExtractor.synthIdentityHPdf(text, mode, "s3cret-pw")
      // without the password: auth fails, stub path, never garbage
      assert(PdfCrypt.decryptorFor(pdf).isEmpty, s"mode $mode: empty pw must refuse")
      assert(PdfTextExtractor.extract(pdf) == "", s"mode $mode")
      // wrong password refuses too
      assert(PdfTextExtractor.extract(pdf, "wrong") == "", s"mode $mode")
      // the right credential opens the same extraction chain
      assert(PdfTextExtractor.extract(pdf, "s3cret-pw") == text, s"mode $mode")
    }
  }

  test("pdfString/pdfName token boundaries: regular chars like '-' continue a name") {
    // /U-custom must NOT satisfy the /U lookup (PDF names may contain
    // any regular character, not just alnum/#)
    val dict = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
      "/CF << /StdCF << /CFM /AESV3 >> >> /StmF /StdCF /StrF /StdCF " +
      "/U-custom <DEADBEEF> " +
      s"/O <$ExtO> /OE <$ExtOE> /U <$ExtU> /UE <$ExtUE> /P -3904 >>"
    val dec = PdfCrypt.decryptorFor(docWith(dict))
    assert(dec.isDefined, "auth must skip the /U-custom decoy")
    assert(hx(dec.get.key) == ExtFileKey)
  }
}
