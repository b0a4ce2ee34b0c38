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
