package graft.operators

import graft.functions.TextFunctions

/** Greedy token-budget chunk packers — the reference's sequential-stateful
  * core (SURVEY.md §2.6, C1-C4). Pure Scala state machines consuming
  * streamed input; the distributed wrappers live in [[ChunkingJob]]
  * (repartition(form) + within-partition sort + mapPartitions over streamed
  * per-form runs), so parallelism is across documents — which is what
  * scales at 100 TB (millions of docs), per SURVEY.md §7.4.3.
  *
  * Reference-parity quirks preserved deliberately (all in
  * `/root/reference/airflow-pipeline/dags/pipeline1.py`):
  *  - the concat delimiter is prepended even to a fresh buffer
  *    (`buffer = buffer + delim + line` with buffer == "", :92);
  *  - the fit test concatenates WITHOUT the delimiter (`num_tokens(buffer+line)`,
  *    :91) — adjacent word chars can merge into one token;
  *  - a line of exactly TOKEN_LIMIT tokens flushes an EMPTY buffer into the
  *    chunk list (:96-98 else-branch appends unconditionally);
  *  - the section packer recomputes buffer tokens from scratch after every
  *    append (:208) — here O(1) per step via the same observable value;
  *  - the oversized-section splitter carries a `#` heading prefix into every
  *    emitted chunk with NO separator before the first sentence (:238).
  */
object ChunkPacker {

  final case class Chunk(content: String, tokenCount: Int)

  final case class PackResult(chunks: Vector[String], oversized: Vector[String])

  /** C1 — `chunkCreator(contents, delim)` (`pipeline1.py:75-104`).
    * Lines are stripped; blanks dropped (P1). Oversized lines are routed
    * aside and flush the buffer.
    */
  def packLines(
      lines: IterableOnce[String],
      delim: String,
      tokenLimit: Int,
      numTokens: String => Int = TextFunctions.numTokens): PackResult = {
    val chunks = Vector.newBuilder[String]
    val oversized = Vector.newBuilder[String]
    var buffer = ""
    for (raw <- lines.iterator) {
      val line = raw.trim
      if (line.nonEmpty) {
        if (numTokens(line) > tokenLimit) {
          oversized += line
          if (buffer.nonEmpty) { chunks += buffer; buffer = "" }
        } else if (numTokens(buffer + line) < tokenLimit) {
          buffer = buffer + delim + line
        } else {
          chunks += buffer // parity: appended even when empty
          buffer = line
        }
      }
    }
    if (buffer.nonEmpty) chunks += buffer
    PackResult(chunks.result(), oversized.result())
  }

  /** C1+C2 — the PyPDF path (`pipeline1.py:689-697`): pack lines with "\n";
    * re-pack oversized lines word-by-word with " ". Returns the two passes
    * separately (ChunkId minting needs the first-pass count — the pandas
    * index restarts between passes, `pipeline1.py:700`).
    */
  def packPyPdfPasses(
      lines: IterableOnce[String],
      tokenLimit: Int,
      numTokens: String => Int = TextFunctions.numTokens): (Vector[String], Vector[String]) = {
    val first = packLines(lines, "\n", tokenLimit, numTokens)
    val secondPass =
      if (first.oversized.nonEmpty) {
        val words = first.oversized.flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
        packLines(words, " ", tokenLimit, numTokens).chunks
      } else Vector.empty[String]
    (first.chunks, secondPass)
  }

  def packPyPdf(
      lines: Iterable[String],
      tokenLimit: Int,
      numTokens: String => Int = TextFunctions.numTokens): Vector[Chunk] = {
    val (first, second) = packPyPdfPasses(lines, tokenLimit, numTokens)
    (first ++ second).map(c => Chunk(c, numTokens(c)))
  }

  /** ChunkIds as pipeline 1 mints them (`pipeline1.py:700`): the pandas index
    * after a concat of the two passes RESTARTS at 0, so ids can repeat within
    * a form. `parityIds = false` numbers the combined list globally instead.
    */
  def pyPdfChunkIds(
      firstPassCount: Int, totalCount: Int, formName: String,
      parityIds: Boolean = true): Vector[String] =
    if (parityIds)
      ((0 until firstPassCount) ++ (0 until totalCount - firstPassCount))
        .map(i => s"${formName}_$i").toVector
    else (0 until totalCount).map(i => s"${formName}_$i").toVector

  /** C3 — Nougat section packer (`pipeline1.py:190-216`). Input: sections in
    * section-number order with their token counts. The buffer token count is
    * re-derived after every step from the buffer itself (reference behavior);
    * incremental bookkeeping here observes the same values because tokens
    * never span the "\n" joins with the engine tokenizer — we still recompute
    * to stay observably identical under ANY injected tokenizer.
    */
  def packSections(
      sections: IterableOnce[(String, Int)],
      tokenLimit: Int,
      numTokens: String => Int = TextFunctions.numTokens): PackResult = {
    val chunks = Vector.newBuilder[String]
    val oversized = Vector.newBuilder[String]
    var buffer = ""
    var bufferTokens = 0
    for ((section, sectionTokens) <- sections.iterator) {
      if (sectionTokens > tokenLimit) {
        oversized += section
        if (buffer.nonEmpty) { chunks += buffer; buffer = "" }
      } else if (sectionTokens + bufferTokens < tokenLimit) {
        buffer = buffer + "\n" + section
      } else {
        chunks += buffer // parity: appended even when empty
        buffer = section
      }
      bufferTokens = numTokens(buffer)
    }
    if (buffer.nonEmpty) chunks += buffer
    PackResult(chunks.result(), oversized.result())
  }

  /** C4 — oversized-section splitter with heading carry
    * (`pipeline1.py:218-248`): if the section's first line is a `#` heading
    * it is held out and prefixed (no separator) to every chunk emitted from
    * that section. Lines over the limit become their own oversize chunks —
    * the reference does not re-route here.
    */
  def splitOversizedSection(
      section: String,
      tokenLimit: Int,
      numTokens: String => Int = TextFunctions.numTokens): Vector[String] = {
    val sentences = section.split("\n").map(_.trim).filter(_.nonEmpty).toVector
    val (heading, body) = sentences match {
      case h +: rest if h.startsWith("#") => (h, rest)
      case other => ("", other)
    }
    val chunks = Vector.newBuilder[String]
    var buffer = heading
    var bufferTokens = 0
    for (sentence <- body) {
      val t = numTokens(sentence)
      if (t + bufferTokens < tokenLimit) {
        buffer = buffer + "\n" + sentence
      } else {
        chunks += buffer
        buffer = heading + sentence
      }
      bufferTokens = numTokens(buffer)
    }
    if (buffer.nonEmpty) chunks += buffer
    chunks.result()
  }

  /** C3+C4 composed — the Nougat chunk list for one document
    * (`pipeline1.py:190-253`): packed sections first, then each oversized
    * section split with heading carry, appended in order.
    */
  def packNougat(
      sections: IterableOnce[(String, Int)],
      tokenLimit: Int,
      numTokens: String => Int = TextFunctions.numTokens): Vector[Chunk] = {
    val first = packSections(sections, tokenLimit, numTokens)
    val split = first.oversized.flatMap(splitOversizedSection(_, tokenLimit, numTokens))
    (first.chunks ++ split).map(c => Chunk(c, numTokens(c)))
  }
}
