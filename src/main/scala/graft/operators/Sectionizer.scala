package graft.operators

import graft.functions.TextFunctions

/** Nougat-path document structuring (`pipeline1.py:109-188`): clean the MMD,
  * split to paragraphs, classify markdown semantics (W3), assign sections via
  * the verified state machine (W4), aggregate sections in paragraph order
  * (A1) with running token counts (W2).
  *
  * Pure-Scala per-document form, used inside `flatMapGroups`. The windowed
  * DataFrame formulation of W1-W4 (for when paragraphs are already rows) is
  * in [[ChunkingJob.sectionizeDF]] — both formulations are tested against
  * each other.
  */
object Sectionizer {

  final case class Paragraph(
      formName: String,
      paraNumber: Int,           // index over the RAW split, so gaps where blanks were dropped
      paraContent: String,
      paraCharacterCount: Int,
      paraSemantics: String,
      section: Int,
      tokenCount: Int,
      cumulativeTokenCount: Int)

  final case class Section(section: Int, chunk: String, tokenCount: Int, cumulativeTokenCount: Int)

  /** MMD cleaning exactly as the reference does it (`pipeline1.py:114-134`)
    * — delegates to the single scrub implementation in
    * [[TextFunctions.scrub]] (line-scoped table markers, DOTALL warning
    * spans, `"\n"` replacement).
    */
  def cleanMmd(contents: String): String = TextFunctions.scrub(contents)

  /** Paragraph table with semantics + sections (`pipeline1.py:136-179`). */
  def paragraphs(
      formName: String,
      mmdContents: String,
      numTokens: String => Int = TextFunctions.numTokens): Vector[Paragraph] = {
    val raw = cleanMmd(mmdContents).split("\n", -1)
    var cumulative = 0
    val kept = Vector.newBuilder[(Int, String, String, Int, Int)]
    raw.zipWithIndex.foreach { case (p, i) =>
      if (p.nonEmpty) { // reference keeps whitespace-only paragraphs (len!=0)
        val t = numTokens(p)
        cumulative += t
        kept += ((i, p, TextFunctions.classifyMarkdown(p), t, cumulative))
      }
    }
    // W4 state machine (`pipeline1.py:167-179`): before the first heading
    // every paragraph opens its own section; a heading opens a section that
    // absorbs following non-headings.
    var sectionNo = 0
    var headingSeen = false
    kept.result().map { case (i, p, sem, t, cum) =>
      val isHeading = sem == "Heading1" || sem == "Heading2" || sem == "Heading3"
      if (!isHeading && !headingSeen) sectionNo += 1
      else if (isHeading) { headingSeen = true; sectionNo += 1 }
      Paragraph(formName, i, p, p.length, sem, sectionNo, t, cum)
    }
  }

  /** Section table (`pipeline1.py:184-188`): paragraphs joined by "\n" in
    * paragraph order per section; token count per section; running sum.
    */
  def sections(
      paras: Seq[Paragraph],
      numTokens: String => Int = TextFunctions.numTokens): Vector[Section] = {
    val grouped = paras.groupBy(_.section).toVector.sortBy(_._1)
    var cumulative = 0
    grouped.map { case (sec, ps) =>
      val chunk = ps.sortBy(_.paraNumber).map(_.paraContent).mkString("\n")
      val t = numTokens(chunk)
      cumulative += t
      Section(sec, chunk, t, cumulative)
    }
  }

  /** Streaming twin of [[paragraphs]] + [[sections]] for an ALREADY-CLEANED
    * line stream (the raw "\n" split of the scrubbed form text): emits
    * `(chunk, tokenCount)` per section in document order, holding only the
    * CURRENT section in memory. This is the 100 TB path —
    * [[ChunkingJob.chunkNougat]] feeds it a per-document line iterator so
    * no form-sized string ever materializes. The section state machine is
    * the verified one from [[paragraphs]] (`pipeline1.py:167-179`): before
    * the first heading every paragraph opens its own section; a heading
    * opens a section that absorbs following non-headings — so after the
    * first heading, every section opener IS a heading. Cross-checked
    * value-for-value against the materialized pipeline in ChunkPackerSpec.
    */
  def sectionsFromLines(
      lines: Iterator[String],
      numTokens: String => Int = TextFunctions.numTokens): Iterator[(String, Int)] =
    new Iterator[(String, Int)] {
      private def isHeading(p: String): Boolean = {
        val sem = TextFunctions.classifyMarkdown(p)
        sem == "Heading1" || sem == "Heading2" || sem == "Heading3"
      }
      private def nextPara(): String = {
        while (lines.hasNext) {
          val l = lines.next()
          if (l.nonEmpty) return l // reference keeps whitespace-only paragraphs
        }
        null
      }
      private var headingSeen = false
      private var opener: String = nextPara()
      def hasNext: Boolean = opener != null
      def next(): (String, Int) = {
        val sb = new StringBuilder(opener)
        if (isHeading(opener)) headingSeen = true
        var p = nextPara()
        while (p != null && headingSeen && !isHeading(p)) {
          sb.append('\n').append(p)
          p = nextPara()
        }
        opener = p
        val chunk = sb.toString
        (chunk, numTokens(chunk))
      }
    }

  /** Whole nougat path for one document: clean → paragraphs → sections →
    * pack (C3) → split oversized with heading carry (C4).
    */
  def chunkDocument(
      formName: String,
      mmdContents: String,
      tokenLimit: Int,
      numTokens: String => Int = TextFunctions.numTokens): Vector[ChunkPacker.Chunk] = {
    val secs = sections(paragraphs(formName, mmdContents, numTokens), numTokens)
    ChunkPacker.packNougat(secs.map(s => (s.chunk, s.tokenCount)), tokenLimit, numTokens)
  }
}
