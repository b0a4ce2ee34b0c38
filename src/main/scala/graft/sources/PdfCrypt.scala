package graft.sources

import java.security.MessageDigest

/** PDF standard security handler, the EMPTY-USER-PASSWORD slice — the
  * single most common "encrypted" PDF in a real corpus: owner-restricted
  * files (no-copy/no-print flags) that every viewer opens transparently
  * because the user password is empty. PyPDF does this inside
  * `PdfReader` (the reference inherits it at `pipeline1.py:605-612`);
  * round 12 stubbed all encrypted PDFs — this demotes the stub to
  * user-password-protected files only.
  *
  * Implements ISO 32000-1 §7.6.3 on pure JCE/`java.security`:
  *   - Algorithm 2 file-key derivation (MD5 of pad ‖ /O ‖ /P-LE32 ‖
  *     ID[0], the R≥3 50-round squeeze, /Length-sized keys);
  *   - Algorithm 4/5 `/U` verification — the gate that PROVES the empty
  *     user password opens the file (mismatch → None, the stub path);
  *   - Algorithm 1 per-object keys (MD5 of key ‖ objnum-LE24 ‖ gen-LE16,
  *     plus the `sAlT` suffix for AESV2), RC4 (/V 1–2, 40–128 bit;
  *     hand-rolled — it is 15 lines of the spec) and AES-128-CBC
  *     (/V 4 `/CFM /AESV2`: 16-byte IV prefix, PKCS#5 unpad) via JCE.
  *
  * Round 14 adds the MODERN generation — ISO 32000-2 §7.6.4 /V 5
  * (`/CFM /AESV3`, increasingly the default for new documents):
  *   - Algorithm 2.B iterated SHA-2 hash for R6 (SHA-256 seed, then
  *     64+ rounds of 64×(pw ‖ K ‖ udata) through AES-128-CBC keyed by
  *     the running hash, digest family chosen by E's first-16-byte sum
  *     mod 3, terminating when the last byte of E ≤ round − 32); R5's
  *     plain SHA-256 also accepted;
  *   - Algorithm 2.A validation/derivation: /U = hash(32) ‖ vsalt(8) ‖
  *     ksalt(8); the empty password authenticates iff
  *     hash(pw, vsalt) = U[0..32]; the FILE key is AES-256-CBC-decrypt
  *     of /UE under the intermediate key hash(pw, ksalt), zero IV;
  *   - Algorithm 13 /Perms sanity: AES-256-ECB-decrypt must read `adb`
  *     at bytes 9–11 (checked when present — a corrupted Perms fails
  *     closed);
  *   - /V 5 streams use the FILE key directly (no per-object keys in
  *     this generation), AES-256-CBC with IV prefix and PKCS#5 unpad.
  *
  * Round 15: non-empty USER passwords decrypt too — [[decryptorFor]]
  * takes the password bytes (the same Algorithm 2/2.A machinery keyed
  * on it; empty remains the default), so a pipeline holding credentials
  * for a partner corpus opens those documents through the same chain.
  * Out of scope (still the documented stub): owner-password-only
  * authentication (Algorithm 7), SASLprep of non-ASCII V5 passwords,
  * crypt filters other than /Identity and /StdCF, and per-string
  * decryption (this engine only reads STREAMS — content + ToUnicode —
  * which is the whole text-extraction surface).
  *
  * The Encrypt dictionary is located by the same no-xref byte scan as
  * everything else: `/Encrypt N G R` + `/ID [<…><…>]` from the trailer
  * bytes, the dict body from the object span walk.
  */
object PdfCrypt {

  /** §7.6.3.3 padding string. */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 as specified (KSA + PRGA); key ≤ 16 bytes here. */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xFF
      j = (j + s(i)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  private def aesCbc(mode: Int, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  private def padPw(pw: Array[Byte]): Array[Byte] =
    if (pw.length >= 32) pw.take(32) else pw ++ Pad.take(32 - pw.length)

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Algorithm 2: file encryption key for a (padded) user password. */
  private def fileKey(userPw: Array[Byte], o: Array[Byte], p: Int,
      id0: Array[Byte], r: Int, nBytes: Int): Array[Byte] = {
    var h = md5(padPw(userPw), o.take(32), le32(p), id0)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(nBytes)); i += 1 }
    }
    h.take(nBytes)
  }

  /** Algorithm 3: the /O entry from owner+user passwords (builder side). */
  private[sources] def computeO(ownerPw: Array[Byte], userPw: Array[Byte],
      r: Int, nBytes: Int): Array[Byte] = {
    var h = md5(padPw(ownerPw))
    if (r >= 3) { var i = 0; while (i < 50) { h = md5(h); i += 1 } }
    val rk = h.take(nBytes)
    var o = rc4(rk, padPw(userPw))
    if (r >= 3) {
      var i = 1
      while (i <= 19) { o = rc4(rk.map(b => (b ^ i).toByte), o); i += 1 }
    }
    o
  }

  /** Algorithm 4 (R2) / 5 (R≥3): the /U entry for a file key. */
  private[sources] def computeU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) { u = rc4(key.map(b => (b ^ i).toByte), u); i += 1 }
      u ++ new Array[Byte](16)
    }

  // ---------------------------------------------------------------------
  // /V 5 (ISO 32000-2 §7.6.4): SHA-2 hashes, AES-256, no per-object keys
  // ---------------------------------------------------------------------

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  /** Algorithm 2.B (R6) / plain SHA-256 (R5): the password hash. `udata`
    * is empty for /U computations, the full 48-byte /U for /O ones.
    */
  private[graft] def hash2B(pw: Array[Byte], salt: Array[Byte],
      udata: Array[Byte], r: Int): Array[Byte] = {
    var k = sha("SHA-256", pw, salt, udata)
    if (r == 5) return k
    var i = 0
    var e: Array[Byte] = null
    while (i < 64 || (e(e.length - 1) & 0xFF) > i - 32) {
      val block = pw ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var j = 0
      while (j < 64) {
        System.arraycopy(block, 0, k1, j * block.length, block.length)
        j += 1
      }
      e = aesCbc(javax.crypto.Cipher.ENCRYPT_MODE, k.take(16),
        java.util.Arrays.copyOfRange(k, 16, 32), k1)
      val mod = e.take(16).map(_ & 0xFF).sum % 3
      k = sha(mod match {
        case 0 => "SHA-256"
        case 1 => "SHA-384"
        case _ => "SHA-512"
      }, e)
      i += 1
    }
    k.take(32)
  }

  private def aesEcb(mode: Int, key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"))
    c.doFinal(data)
  }

  /** Algorithm 1: per-object key. */
  private def objKey(key: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val tail = Array((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
      ((num >> 16) & 0xFF).toByte, (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte)
    val salt = if (aes) Array(0x73, 0x41, 0x6C, 0x54).map(_.toByte)
      else Array.emptyByteArray
    md5(key, tail, salt).take(math.min(key.length + 5, 16))
  }

  /** A verified empty-user-password decryptor for one document. `v5`
    * marks the ISO 32000-2 generation: streams decrypt under the FILE
    * key directly (Algorithm 1 per-object keys exist only in /V ≤ 4).
    * `identity` marks an effective `/StmF /Identity` — the password
    * still authenticated, but STREAMS are unencrypted and pass through
    * verbatim (§7.6.5: Identity is the default stream filter, and a /V
    * 4/5 document may encrypt strings only).
    */
  final case class Decryptor(key: Array[Byte], aes: Boolean,
      v5: Boolean = false, identity: Boolean = false) {
    def decryptStream(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      if (identity) return data
      val k = if (v5) key else objKey(key, num, gen, aes)
      if (!aes) rc4(k, data)
      else if (data.length < 32 || data.length % 16 != 0) Array.emptyByteArray
      else try {
        val plain = aesCbc(javax.crypto.Cipher.DECRYPT_MODE, k,
          data.take(16), data.drop(16))
        val padN = plain.last & 0xFF
        if (padN >= 1 && padN <= 16 && padN <= plain.length)
          plain.dropRight(padN)
        else Array.emptyByteArray
      } catch { case _: java.security.GeneralSecurityException => Array.emptyByteArray }
    }

    /** Builder-side inverse (fixtures): encrypt with a deterministic IV. */
    private[sources] def encryptStream(num: Int, gen: Int, data: Array[Byte],
        iv: Array[Byte]): Array[Byte] = {
      if (identity) return data
      val k = if (v5) key else objKey(key, num, gen, aes)
      if (!aes) rc4(k, data)
      else {
        val padN = 16 - (data.length % 16)
        val padded = data ++ Array.fill(padN)(padN.toByte)
        iv ++ aesCbc(javax.crypto.Cipher.ENCRYPT_MODE, k, iv, padded)
      }
    }
  }

  // ---------------------------------------------------------------------
  // document-side parse
  // ---------------------------------------------------------------------

  private val EncryptRefRe = """/Encrypt\s+(\d+)\s+(\d+)\s+R""".r
  private val IdRe = """/ID\s*\[\s*<([0-9A-Fa-f]*)>\s*<[0-9A-Fa-f]*>\s*\]""".r
  private val IntRe = Map(
    "V" -> """/V\s+(\d+)""".r, "R" -> """/R\s+(\d+)""".r,
    "Length" -> """/Length\s+(\d+)""".r, "P" -> """/P\s+(-?\d+)""".r)
  private val HexStrRe = """<([0-9A-Fa-f]+)>""".r
  private val LitStrRe = """(?s)\((.*?[^\\])\)""".r

  private def hexBytes(h: String): Array[Byte] = {
    val even = if (h.length % 2 == 1) h + "0" else h
    Array.tabulate(even.length / 2)(i =>
      Integer.parseInt(even.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  /** §7.2.2/§7.3.5: a PDF name token runs until the next delimiter or
    * whitespace — any other REGULAR character (letters, digits, `#`
    * escapes, but also `-`, `+`, …) continues the name, so `/U-custom`
    * must not satisfy a `/U` lookup.
    */
  private def nameContinues(c: Char): Boolean =
    !(c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
      c == '\u0000' || "()<>[]{}/%".indexOf(c) >= 0)

  /** The NAME value of a name-valued key (`/StmF /StdCF` → "StdCF"),
    * token-bounded on both the key and the value.
    */
  private def pdfName(dict: String, keyName: String): Option[String] = {
    var at = dict.indexOf(keyName)
    while (at >= 0 && at + keyName.length < dict.length &&
      nameContinues(dict.charAt(at + keyName.length)))
      at = dict.indexOf(keyName, at + 1)
    if (at < 0) return None
    val rest = dict.substring(at + keyName.length).dropWhile(_.isWhitespace)
    if (!rest.startsWith("/")) None
    else Some(rest.drop(1).takeWhile(nameContinues))
  }

  /** /O and /U values: hex string or literal string (escape table §7.3.4.2).
    * Key lookup is TOKEN-BOUNDED: `/U` must not match the `/UE` or `/URI`
    * prefix (the V5 dicts carry both /U and /UE), so the char after the
    * name must end the PDF name token.
    */
  private def pdfString(dict: String, keyName: String): Option[Array[Byte]] = {
    var at = dict.indexOf(keyName)
    while (at >= 0 && at + keyName.length < dict.length &&
      nameContinues(dict.charAt(at + keyName.length)))
      at = dict.indexOf(keyName, at + 1)
    if (at < 0) return None
    val rest = dict.substring(at + keyName.length)
    val hex = HexStrRe.findPrefixMatchOf(rest.dropWhile(_.isWhitespace))
    hex.map(m => hexBytes(m.group(1))).orElse {
      val trimmed = rest.dropWhile(_.isWhitespace)
      if (!trimmed.startsWith("(")) None
      else LitStrRe.findPrefixMatchOf(trimmed).map { m =>
        val s = m.group(1)
        val out = new java.io.ByteArrayOutputStream(s.length)
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c == '\\' && i + 1 < s.length) {
            s.charAt(i + 1) match {
              case 'n' => out.write('\n'); i += 2
              case 'r' => out.write('\r'); i += 2
              case 't' => out.write('\t'); i += 2
              case 'b' => out.write('\b'); i += 2
              case 'f' => out.write('\f'); i += 2
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                  v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
                }
                out.write(v & 0xFF)
              case other => out.write(other); i += 2
            }
          } else { out.write(c); i += 1 }
        }
        out.toByteArray
      }
    }
  }

  /** Parse + VERIFY: Some(decryptor) iff the document declares a
    * standard-handler /V 1/2/4/5 encryption this module supports AND the
    * user password authenticates against /U — the EMPTY password by
    * default (the owner-restricted files that dominate real "encrypted"
    * corpora), or a caller-supplied one (round 15: a curation pipeline
    * holding credentials for a partner corpus passes them per document).
    * Anything else — unencrypted, unsupported /V, /O//U/ID missing, or a
    * wrong password — is None (caller falls back: unencrypted path or
    * stub). /V 5 passwords are UTF-8 bytes (the SASLprep step of ISO
    * 32000-2 §7.6.4.3.2 is out of scope — ASCII passwords, the
    * overwhelming real case, are unaffected).
    */
  def decryptorFor(bytes: Array[Byte]): Option[Decryptor] =
    decryptorFor(bytes, Array.emptyByteArray)

  def decryptorFor(bytes: Array[Byte], userPw: Array[Byte]): Option[Decryptor] = {
    // cheap bail on the 99% case
    if (PdfTextExtractor.indexOf(bytes, "/Encrypt", 0) < 0) return None
    val text = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val parsed = for {
      encRef <- EncryptRefRe.findFirstMatchIn(text)
      encNum = encRef.group(1).toInt
      dict <- PdfTextExtractor.objSpans(text).collectFirst {
        case (n, body) if n == encNum && body.contains("/Standard") => body }
      v <- IntRe("V").findFirstMatchIn(dict).map(_.group(1).toInt)
      r <- IntRe("R").findFirstMatchIn(dict).map(_.group(1).toInt)
    } yield (dict, v, r)
    parsed.flatMap {
      case (dict, v, r) if v == 5 && (r == 5 || r == 6) =>
        decryptorV5(dict, r, userPw)
      case (dict, v, r) if (v == 1 || v == 2 || v == 4) && r >= 2 && r <= 4 =>
        for {
          idm <- IdRe.findFirstMatchIn(text)
          id0 = hexBytes(idm.group(1))
          p <- IntRe("P").findFirstMatchIn(dict).map(_.group(1).toInt)
          o <- pdfString(dict, "/O")
          u <- pdfString(dict, "/U")
          // §7.6.5: /StmF names the STREAM crypt filter; the default is
          // /Identity (streams unencrypted even though the doc has an
          // Encrypt dict). /V ≤ 2 predates crypt filters — always RC4.
          stmF = if (v == 4) pdfName(dict, "/StmF").getOrElse("Identity")
            else "StdCF"
          cfm = if (v == 4) pdfName(dict, "/CFM").getOrElse("") else ""
          if v <= 2 || stmF == "Identity" ||
            (stmF == "StdCF" && (cfm == "AESV2" || cfm == "V2"))
          nBytes = if (r == 2) 5
            else IntRe("Length").findFirstMatchIn(dict).map(_.group(1).toInt / 8).getOrElse(5)
          key = fileKey(userPw, o, p, id0, r, nBytes)
          uWant = computeU(key, id0, r)
          if (if (r == 2) java.util.Arrays.equals(uWant, u.take(32))
              else java.util.Arrays.equals(uWant.take(16), u.take(16)))
        } yield Decryptor(key, aes = cfm == "AESV2",
          identity = v == 4 && stmF == "Identity")
      case _ => None
    }
  }

  /** ISO 32000-2 Algorithm 2.A for the user password (empty by
    * default): validate the R5/R6 hash against /U[0..32], unwrap the
    * file key from /UE under the key-salt intermediate, and (when
    * /Perms is present) require Algorithm 13's `adb` sanity bytes —
    * fail closed on any mismatch.
    */
  private def decryptorV5(dict: String, r: Int,
      userPw: Array[Byte] = Array.emptyByteArray): Option[Decryptor] = {
    val empty = Array.emptyByteArray // user-password hashes carry no udata
    // §7.6.5: the effective STREAM filter — /Identity (the default when
    // /StmF is absent) means streams are NOT encrypted even though the
    // password still authenticates; /StdCF must declare /CFM /AESV3 in
    // this generation. Any other name refuses (the stub path).
    val stmF = pdfName(dict, "/StmF").getOrElse("Identity")
    val cfm = pdfName(dict, "/CFM").getOrElse("")
    for {
      u <- pdfString(dict, "/U")
      if u.length >= 48
      ue <- pdfString(dict, "/UE")
      if ue.length == 32
      if stmF == "Identity" || (stmF == "StdCF" && cfm == "AESV3")
      vsalt = java.util.Arrays.copyOfRange(u, 32, 40)
      ksalt = java.util.Arrays.copyOfRange(u, 40, 48)
      if java.util.Arrays.equals(hash2B(userPw, vsalt, empty, r), u.take(32))
      ikey = hash2B(userPw, ksalt, empty, r)
      fileKey = aesCbc(javax.crypto.Cipher.DECRYPT_MODE, ikey,
        new Array[Byte](16), ue)
      if pdfString(dict, "/Perms").forall { pm =>
        pm.length == 16 && {
          val plain = aesEcb(javax.crypto.Cipher.DECRYPT_MODE, fileKey, pm)
          plain(9) == 'a' && plain(10) == 'd' && plain(11) == 'b'
        }
      }
    } yield Decryptor(fileKey, aes = true, v5 = true,
      identity = stmF == "Identity")
  }

  // ---------------------------------------------------------------------
  // fixture-side: deterministic encrypt parameters per (r, text)
  // ---------------------------------------------------------------------

  /** Deterministic builder inputs: ID[0] from the text, P = -3904 (the
    * usual print/copy-restricted mask), owner password fixed, IV from
    * the object number + text (fixtures must be replayable, so no RNG).
    */
  private[sources] def fixtureParams(text: String): (Array[Byte], Int) =
    (md5(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)), -3904)

  private[sources] def fixtureIv(num: Int, id0: Array[Byte]): Array[Byte] =
    md5(Array(num.toByte), id0)

  /** Encrypt-dict body + verified Decryptor for mode 0/1/2/3 =
    * RC4-40 (V1/R2) / RC4-128 (V2/R3) / AES-128 (V4/R4 AESV2) /
    * AES-256 (V5/R6 AESV3).
    */
  private[sources] def fixtureEncrypt(mode: Int, text: String,
      userPw: Array[Byte] = Array.emptyByteArray): (String, Decryptor, Array[Byte]) = {
    if (mode == 3) return fixtureEncryptV5(text, userPw)
    val (id0, p) = fixtureParams(text)
    val (v, r, bits) = mode match {
      case 0 => (1, 2, 40)
      case 1 => (2, 3, 128)
      case _ => (4, 4, 128)
    }
    val nBytes = bits / 8
    val owner = "graft-owner".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val o = computeO(owner, userPw, r, nBytes)
    val key = fileKey(userPw, o, p, id0, r, nBytes)
    val u = computeU(key, id0, r)
    def hx(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02X").mkString
    val cf = if (v == 4)
      " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
    else ""
    val lenEntry = if (v >= 2) s" /Length $bits" else ""
    val dict = s"<< /Filter /Standard /V $v /R $r$lenEntry$cf " +
      s"/O <${hx(o)}> /U <${hx(u)}> /P $p >>"
    (dict, Decryptor(key, aes = v == 4), id0)
  }

  /** V5/R6 fixture: deterministic 32-byte file key and salts (SHA-256 of
    * the text — fixtures must replay byte-identically, so no RNG), the
    * full /U‖/UE‖/O‖/OE‖/Perms set built by the SPEC's own algorithms
    * (2.A forward direction, 8/9/10 of ISO 32000-2), so the parse side's
    * verify-then-unwrap chain is exercised against an independent
    * construction, not a copy of itself.
    */
  private[sources] def fixtureEncryptV5(text: String,
      userPw: Array[Byte] = Array.emptyByteArray): (String, Decryptor, Array[Byte]) = {
    val empty = Array.emptyByteArray
    val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val fileKey = sha("SHA-256", "graft-filekey:".getBytes, tb)
    val saltSeed = sha("SHA-256", "graft-salts:".getBytes, tb)
    val vsalt = saltSeed.take(8)
    val ksalt = java.util.Arrays.copyOfRange(saltSeed, 8, 16)
    val ovsalt = java.util.Arrays.copyOfRange(saltSeed, 16, 24)
    val oksalt = java.util.Arrays.copyOfRange(saltSeed, 24, 32)
    val p = -3904
    // /U (Algorithm 8): hash(pw, vsalt) ‖ vsalt ‖ ksalt; /UE wraps the
    // file key under the ksalt intermediate, zero IV
    val u = hash2B(userPw, vsalt, empty, 6) ++ vsalt ++ ksalt
    val ue = aesCbc(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2B(userPw, ksalt, empty, 6), new Array[Byte](16), fileKey)
    // /O (Algorithm 9): owner hashes bind the full 48-byte /U
    val owner = "graft-owner".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val o = hash2B(owner, ovsalt, u, 6) ++ ovsalt ++ oksalt
    val oe = aesCbc(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2B(owner, oksalt, u, 6), new Array[Byte](16), fileKey)
    // /Perms (Algorithm 10): P-LE32 ‖ FFFFFFFF ‖ 'T' ‖ "adb" ‖ 4 filler
    val permsPlain = le32(p) ++ Array[Byte](-1, -1, -1, -1) ++
      "Tadbgrft".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val perms = aesEcb(javax.crypto.Cipher.ENCRYPT_MODE, fileKey, permsPlain)
    def hx(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02X").mkString
    val dict = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
      "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
      "/StmF /StdCF /StrF /StdCF " +
      s"/O <${hx(o)}> /OE <${hx(oe)}> /U <${hx(u)}> /UE <${hx(ue)}> " +
      s"/P $p /Perms <${hx(perms)}> >>"
    // id0 still feeds the trailer /ID and the deterministic stream IVs
    (dict, Decryptor(fileKey, aes = true, v5 = true), md5(tb))
  }
}
