package graft.functions

import java.nio.charset.StandardCharsets
import java.security.SecureRandom
import java.util.Base64
import javax.crypto.spec.PBEKeySpec
import javax.crypto.{Mac, SecretKeyFactory}
import javax.crypto.spec.SecretKeySpec

/** App-layer crypto utilities mirroring the reference's auth surface:
  * PBKDF2-SHA256 with 16-byte salt (`fastapi-backend/fastapiservice/crud.py:14-25`,
  * passlib default 29000 iterations) and JWT HS256 with `exp`
  * (`jwt_utils.py:11-26`). Driver-side utilities — not data-plane operators —
  * but exposed so register/login analog queries (SURVEY.md §2.3 J3/P4) can
  * produce and verify credentials deterministically.
  */
object CryptoFunctions {

  val Pbkdf2Iterations = 29000
  val SaltBytes = 16

  def newSalt(): Array[Byte] = {
    val salt = new Array[Byte](SaltBytes)
    new SecureRandom().nextBytes(salt)
    salt
  }

  private def pbkdf2Raw(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    val f = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    f.generateSecret(spec).getEncoded
  }

  def pbkdf2Hash(password: String, salt: Array[Byte], iterations: Int = Pbkdf2Iterations): String =
    Base64.getEncoder.encodeToString(pbkdf2Raw(password, salt, iterations))

  def pbkdf2Verify(password: String, salt: Array[Byte], expected: String): Boolean =
    java.security.MessageDigest.isEqual(
      pbkdf2Hash(password, salt).getBytes(StandardCharsets.UTF_8),
      expected.getBytes(StandardCharsets.UTF_8))

  // --- passlib modular-crypt format (`crud.py:14-25` stores
  // `pbkdf2_sha256.using(salt=...).hash(pw)`, i.e.
  // `$pbkdf2-sha256$<rounds>$<salt>$<hash>` with passlib's "adapted base64":
  // standard alphabet, '+' -> '.', padding stripped). These round-trip
  // against a reference-written credentials table and vice versa. ---

  private def ab64Encode(bytes: Array[Byte]): String =
    Base64.getEncoder.withoutPadding.encodeToString(bytes).replace('+', '.')

  private def ab64Decode(s: String): Array[Byte] = {
    val std = s.replace('.', '+')
    val pad = "=" * ((4 - std.length % 4) % 4)
    Base64.getDecoder.decode(std + pad)
  }

  /** The exact string the reference stores in `user_hashpassword`. */
  def pbkdf2ModularCrypt(password: String, salt: Array[Byte],
      iterations: Int = Pbkdf2Iterations): String =
    s"$$pbkdf2-sha256$$$iterations$$${ab64Encode(salt)}$$${ab64Encode(pbkdf2Raw(password, salt, iterations))}"

  /** Verify against a stored modular-crypt string (engine- OR
    * reference-written); rounds and salt come from the string itself. A
    * malformed or corrupt stored value simply fails to verify — it must
    * never throw (one bad row would otherwise kill a whole verification
    * query).
    */
  def pbkdf2ModularVerify(password: String, stored: String): Boolean =
    stored.split('$') match {
      case Array("", "pbkdf2-sha256", rounds, saltB64, _) =>
        scala.util.Try {
          java.security.MessageDigest.isEqual(
            pbkdf2ModularCrypt(password, ab64Decode(saltB64), rounds.toInt)
              .getBytes(StandardCharsets.UTF_8),
            stored.getBytes(StandardCharsets.UTF_8))
        }.getOrElse(false)
      case _ => false
    }

  private def b64url(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  private def hmacSha256(key: String, data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** Minimal HS256 JWT: header.payload.signature; expiry epoch-seconds claim
    * (30-minute default in the reference, `jwt_utils.py:9`).
    */
  def jwtEncode(subject: String, expEpochSeconds: Long, secret: String): String = {
    val header = b64url("""{"alg":"HS256","typ":"JWT"}""".getBytes(StandardCharsets.UTF_8))
    val payload = b64url(s"""{"sub":"$subject","exp":$expEpochSeconds}""".getBytes(StandardCharsets.UTF_8))
    val signature = b64url(hmacSha256(secret, s"$header.$payload"))
    s"$header.$payload.$signature"
  }

  /** Returns Some(subject) iff signature valid and not expired at `now`. */
  def jwtDecode(token: String, secret: String, nowEpochSeconds: Long): Option[String] = {
    token.split('.') match {
      case Array(h, p, s) =>
        val expected = b64url(hmacSha256(secret, s"$h.$p"))
        if (!java.security.MessageDigest.isEqual(
            expected.getBytes(StandardCharsets.UTF_8), s.getBytes(StandardCharsets.UTF_8))) None
        else {
          val payload = new String(Base64.getUrlDecoder.decode(p), StandardCharsets.UTF_8)
          val sub = """"sub":"([^"]*)"""".r.findFirstMatchIn(payload).map(_.group(1))
          val exp = """"exp":(\d+)""".r.findFirstMatchIn(payload).map(_.group(1).toLong)
          (sub, exp) match {
            case (Some(u), Some(e)) if e > nowEpochSeconds => Some(u)
            case _ => None
          }
        }
      case _ => None
    }
  }
}
