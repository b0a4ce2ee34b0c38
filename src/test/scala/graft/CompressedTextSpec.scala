package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CompressedText

/** Golden tests for the real java.util.zip ingestion boundary: gzip and
  * zip round-trips (incl. non-ASCII and surrogate-pair text), compression
  * actually compressing, codepoint-aligned slice closed forms, and the
  * corrupt-input fallbacks (CRC-checked — never silent garbage).
  */
class CompressedTextSpec extends AnyFunSuite {

  test("gzip round-trip: exact text back, incl. non-ASCII; repetitive text compresses; corruption is caught") {
    val texts = Seq(
      "plain ascii text with words",
      "accents éèê and CJK 中文 mixed in",
      "surrogate pair 😀 emoji content",
      "")
    for (t <- texts)
      assert(CompressedText.gunzip(CompressedText.gzip(t)).contains(t))
    // repetitive text must actually shrink (the codec is real, not a tag)
    val rep = "the same sentence over and over. " * 100
    val gz = CompressedText.gzip(rep)
    assert(gz.length < rep.length / 5,
      s"gzip ${gz.length}B for ${rep.length}B input — not compressing")
    // trailer CRC corruption → None, never garbage
    val bad = gz.clone(); bad(bad.length - 5) = (bad(bad.length - 5) ^ 0xFF).toByte
    assert(CompressedText.gunzip(bad).isEmpty)
    assert(CompressedText.gunzip("not gzip".getBytes).isEmpty)
  }

  test("zstd cross-implementation round-trip: zstd-jni frames decode pure-Java; corruption and garbage refuse") {
    val body = ("zstd entity — κείμενο 😀 " * 40).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // compress with the JNI binding of the upstream C library, decode
    // with aircompressor's from-spec pure-Java decoder: a bug that is
    // self-consistent inside either implementation cannot pass
    val frame = CompressedText.zstdCompress(body)
    assert(frame.length < body.length / 2,
      s"zstd ${frame.length}B for ${body.length}B input — not compressing")
    assert(CompressedText.unzstdBytes(frame).exists(_.sameElements(body)))
    // and the reverse direction: the C library accepts what it wrote
    assert(com.github.luben.zstd.Zstd.decompress(frame, body.length * 2)
      .take(body.length).sameElements(body))
    // magic + garbage → None (the q302 corrupt-zstd class)
    val broken = Array(0x28.toByte, 0xB5.toByte, 0x2F.toByte, 0xFD.toByte) ++ body
    assert(CompressedText.unzstdBytes(broken).isEmpty)
    // mid-frame corruption → refused (None), never the original bytes
    val bad = frame.clone(); bad(frame.length / 2) = (bad(frame.length / 2) ^ 0x5a).toByte
    assert(!CompressedText.unzstdBytes(bad).exists(_.sameElements(body)),
      "corrupted frame decoded back to the original bytes")
    assert(CompressedText.unzstdBytes("not zstd".getBytes).isEmpty)
    // degenerate inputs must take the None path, not crash the task
    assert(!CompressedText.unzstdBytes(Array.emptyByteArray).exists(_.nonEmpty))
    assert(CompressedText.unzstdBytes(frame.take(6)).isEmpty) // truncated header
  }

  test("zip slices: codepoint-aligned closed form, surrogate pairs never split, non-zip yields zero entries") {
    // 10 codepoints incl. an astral (2-UTF-16-unit) one at a slice edge:
    // unit-based slicing at 3 would sever the pair — codepoint slicing
    // must keep it whole
    val t = "ab😀cdefghi" // a b 😀 c d e f g h i = 10 codepoints
    val entries = CompressedText.zipEntries(CompressedText.zipOfSlices(t, 3))
    assert(entries.map(_._1) == Seq("part_0", "part_1", "part_2"))
    assert(entries.map(_._2).mkString == t) // lossless reassembly
    // step = 10/3 = 3 codepoints; last takes the remainder
    val cpLens = entries.map(e => e._2.codePointCount(0, e._2.length))
    assert(cpLens == Seq(3, 3, 4))
    // n = 1 → whole text in one entry
    assert(CompressedText.zipEntries(CompressedText.zipOfSlices(t, 1))
      == Seq(("part_0", t)))
    // shorter text than n: trailing entries empty, nothing lost
    val tiny = CompressedText.zipEntries(CompressedText.zipOfSlices("xy", 3))
    assert(tiny.map(_._2).mkString == "xy" && tiny.size == 3)
    assert(CompressedText.zipEntries("no zip here".getBytes).isEmpty)
  }
}
