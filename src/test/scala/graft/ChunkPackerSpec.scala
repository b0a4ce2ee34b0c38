package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.functions.TextFunctions
import graft.operators.{ChunkPacker, Sectionizer}

/** Golden parity specs: the Scala packers must reproduce, chunk for chunk,
  * the reference algorithms (pipeline1.py:75-104, 109-188, 190-253) as
  * re-derived by scripts/golden_packer.py under the engine tokenizer.
  */
class ChunkPackerSpec extends AnyFunSuite {

  private val golden: Map[String, JValue] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/packer_golden.json"))
    val parsed = try JsonMethods.parse(src.mkString) finally src.close()
    parsed.asInstanceOf[JObject].obj.toMap
  }

  implicit val fmts: Formats = DefaultFormats

  private def doc(name: String): JValue = golden(name)
  private def strs(j: JValue): Vector[String] = j.extract[Vector[String]]

  for (name <- golden.keys.toSeq.sorted) {
    val d = doc(name)
    val limit = (d \ "tokenLimit").extract[Int]
    val text = (d \ "text").extract[String]
    val lines = text.split("\n", -1).toSeq

    test(s"$name: PyPDF pass 1+2 (C1/C2) matches golden") {
      val (first, second) = ChunkPacker.packPyPdfPasses(lines, limit)
      assert(first == strs(d \ "pypdf_first"))
      assert(second == strs(d \ "pypdf_second"))
    }

    test(s"$name: paragraphs (clean/classify/sectionize W1-W4) match golden") {
      val got = Sectionizer.paragraphs(name, text)
      val want = (d \ "paragraphs").extract[Vector[Map[String, JValue]]]
      assert(got.size == want.size)
      got.zip(want).foreach { case (g, w) =>
        assert(g.paraNumber == w("paraNumber").extract[Int], g.paraContent)
        assert(g.paraContent == w("paraContent").extract[String])
        assert(g.paraSemantics == w("paraSemantics").extract[String], g.paraContent)
        assert(g.section == w("section").extract[Int], g.paraContent)
        assert(g.tokenCount == w("tokenCount").extract[Int], g.paraContent)
        assert(g.cumulativeTokenCount == w("cumulativeTokenCount").extract[Int])
      }
    }

    test(s"$name: section aggregation (A1/W2) matches golden") {
      val got = Sectionizer.sections(Sectionizer.paragraphs(name, text))
      val want = (d \ "sections").extract[Vector[Map[String, JValue]]]
      assert(got.size == want.size)
      got.zip(want).foreach { case (g, w) =>
        assert(g.section == w("section").extract[Int])
        assert(g.chunk == w("chunk").extract[String])
        assert(g.tokenCount == w("tokenCount").extract[Int])
        assert(g.cumulativeTokenCount == w("cumulativeTokenCount").extract[Int])
      }
    }

    test(s"$name: nougat chunks (C3/C4) match golden") {
      val got = Sectionizer.chunkDocument(name, text, limit).map(_.content)
      assert(got == strs(d \ "nougat_chunks"))
    }

    test(s"$name: streaming sectionsFromLines equals the materialized sections") {
      val cleanedLines = Sectionizer.cleanMmd(text).split("\n", -1).iterator
      val streamed = Sectionizer.sectionsFromLines(cleanedLines).toVector
      val want = Sectionizer.sections(Sectionizer.paragraphs(name, text))
        .map(s => (s.chunk, s.tokenCount))
      assert(streamed == want)
    }
  }

  test("quirk: exact-limit line flushes an empty buffer (C1 else-branch)") {
    // 50 single-token words => numTokens == 50 == limit
    val line = (1 to 50).map(i => s"w$i").mkString(" ")
    assert(TextFunctions.numTokens(line) == 50)
    val r = ChunkPacker.packLines(Seq(line), "\n", 50)
    assert(r.chunks == Vector("", line)) // reference appends the empty buffer
    assert(r.oversized.isEmpty)
  }

  test("quirk: delimiter is prepended to a fresh buffer") {
    val r = ChunkPacker.packLines(Seq("alpha", "beta"), "\n", 50)
    assert(r.chunks == Vector("\nalpha\nbeta")) // leading delim from buffer=""
  }

  test("quirk: oversized line flushes buffer and is routed aside") {
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val r = ChunkPacker.packLines(Seq("small", big, "after"), "\n", 50)
    assert(r.oversized == Vector(big))
    assert(r.chunks == Vector("\nsmall", "\nafter"))
  }

  test("quirk: C4 heading carried with NO separator before first sentence") {
    val body = (0 until 4).map(i => (1 to 30).map(j => s"t${i}x$j").mkString(" "))
    val section = "# Head\n" + body.mkString("\n")
    val chunks = ChunkPacker.splitOversizedSection(section, 50)
    assert(chunks.nonEmpty)
    chunks.tail.foreach(c => assert(c.startsWith("# Head" + body.head.take(0) + "t"), c.take(20)))
    assert(chunks.head.startsWith("# Head\n"))
  }

  test("cleanMmd scrubs begin/end lines separately and warnings DOTALL") {
    val s = "keep\n\\begin{tabular}{cc} x\ninner stays\n\\end{tabular} y\n+++ warn\nmore +++\nend"
    val cleaned = Sectionizer.cleanMmd(s)
    assert(cleaned.contains("inner stays")) // only the begin/end LINES go
    assert(!cleaned.contains("tabular"))
    assert(!cleaned.contains("warn"))
    assert(cleaned.contains("keep") && cleaned.contains("end"))
  }
}
