package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, oracle-reproducible hashing.
  *
  * Spark's `hash`/`xxhash64` and DuckDB's `hash` disagree, so every hash that
  * participates in a correctness-checked query is derived from MD5 (identical
  * bytes on both sides): take the first 15 hex chars (60 bits — fits a signed
  * 64-bit int) and parse as base-16. Salted variants prepend `"seed:"`.
  */
object HashFunctions {

  /** Columnar stable 60-bit hash: conv(substr(md5(s), 1, 15), 16, 10) as long. */
  def stableHash64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  def stableHash64(c: Column, seed: Int): Column =
    stableHash64(concat(lit(s"$seed:"), c.cast("string")))

  /** Plain-Scala twin (same bytes → same value). */
  def stableHash64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  def stableHash64(s: String, seed: Int): Long = stableHash64(s"$seed:$s")
}
