package org.apache.spark.sql.graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch expressions evaluated as ONE compiled JVM loop per row.
  *
  * The same sketches expressed with Spark's higher-order functions
  * (transform/aggregate lambdas) are interpreted per ELEMENT — ~2 µs per
  * lambda application, which at 300 shingles × 8 hashes per document
  * dominates the scan. These expressions keep per-row granularity
  * (CodegenFallback costs one virtual call per row), with the inner loops in
  * compiled Scala, and produce bit-identical values to the HOF formulation —
  * the DuckDB oracles are unchanged.
  */
private object SketchHash {
  val Modulus = 2147483647L

  /** First 60 bits of md5 as a non-negative long — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)` (HashFunctions.stableHash64).
    */
  def stable60(md: MessageDigest, bytes: Array[Byte], from: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, from, len)
    val d = md.digest()
    // 15 hex chars = 60 bits = 7.5 bytes: bytes 0-6 fully, high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }
}

/** MinHash signature over character shingles:
  * `sig[j] = min over shingles s of ((stable60(md5(s)) % M) * A_j + B_j) % M`.
  * Texts shorter than the shingle length hash the whole text (matching
  * `Dedup.shinglesCol`). NOTE: shingles are CHARACTER windows; byte offsets
  * are computed per window from the UTF8 string, so ASCII-heavy corpora pay
  * no decode.
  */
case class MinHashSig(child: Expression, numHashes: Int, shingleLen: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val as: Array[Long] = Array.tabulate(numHashes)(j => (1000003L * (j + 1)) % SketchHash.Modulus)
  private val bs: Array[Long] = Array.tabulate(numHashes)(j => 12345L + 7919L * j)

  override def nullSafeEval(input: Any): Any = {
    // Round 16: one UTF-8 encode per ROW (round-tripped through String so
    // invalid input bytes take the same replacement-char path as before),
    // windows sliced by code-point BYTE boundaries (no per-shingle String
    // + getBytes), and duplicate windows deduped with an open-addressed
    // offset table BEFORE hashing — absorb() is idempotent on the min, so
    // hashing each distinct shingle once is value-identical and skips an
    // md5 per repeated window (SketchSpec pins parity vs the HOF form).
    val s = input.asInstanceOf[UTF8String].toString
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val md = MessageDigest.getInstance("MD5")
    val sig = Array.fill(numHashes)(Long.MaxValue)
    def absorb(from: Int, len: Int): Unit = {
      val base = SketchHash.stable60(md, bytes, from, len) % SketchHash.Modulus
      var j = 0
      while (j < numHashes) {
        val v = (base * as(j) + bs(j)) % SketchHash.Modulus
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
    // code-point start offsets (UTF-8 continuation bytes are 10xxxxxx),
    // matching Spark's length()/substring and the DuckDB oracle
    val cpOff = new Array[Int](bytes.length + 1)
    var ncp = 0
    var p = 0
    while (p < bytes.length) {
      if ((bytes(p) & 0xc0) != 0x80) { cpOff(ncp) = p; ncp += 1 }
      p += 1
    }
    cpOff(ncp) = bytes.length
    if (ncp < shingleLen) absorb(0, bytes.length)
    else {
      val m = ncp - shingleLen + 1
      var cap = 8
      while (cap < m * 2) cap <<= 1
      val table = new Array[Int](cap)
      java.util.Arrays.fill(table, -1)
      val mask = cap - 1
      var i = 0
      while (i <= ncp - shingleLen) {
        val from = cpOff(i)
        val len = cpOff(i + shingleLen) - from
        // open-addressed dedupe keyed on window bytes
        var h = 1
        var k = from
        while (k < from + len) { h = h * 31 + bytes(k); k += 1 }
        h ^= (h >>> 16); h *= 0x85ebca6b
        h &= mask
        var fresh = false
        var done = false
        while (!done) {
          val off = table(h)
          if (off == -1) { table(h) = i; fresh = true; done = true }
          else {
            val oFrom = cpOff(off)
            val oLen = cpOff(off + shingleLen) - oFrom
            if (oLen == len && java.util.Arrays.equals(
                bytes, oFrom, oFrom + oLen, bytes, from, from + len)) done = true
            else h = (h + 1) & mask
          }
        }
        if (fresh) absorb(from, len)
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** Fraction of positions where two long arrays agree — the MinHash
  * estimated-Jaccard verifier. Full codegen: runs inside WholeStageCodegen
  * on millions of candidate pairs (the zip_with+aggregate form interprets
  * two lambdas per element).
  */
case class ArrayAgreeRatio(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) 0.0
    else {
      var eq = 0; var i = 0
      while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
      eq.toDouble / x.numElements()
    }
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = ($n == 0) ? 0.0 : ((double) $eq) / $a.numElements();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAgreeRatio =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_agree_ratio"
}

/** Character n-gram shingles as one compiled loop (the `transform(sequence)`
  * + `substr` lambda formulation is interpreted per shingle). Matches
  * `Dedup.shinglesCol`: texts shorter than n yield [text].
  */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray // code-point windows (oracle parity)
    if (cps.length < n) new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    else {
      val out = new Array[Any](cps.length - n + 1)
      var i = 0
      while (i <= cps.length - n) {
        out(i) = UTF8String.fromString(new String(cps, i, n))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)

  override def prettyName: String = "char_shingles"
}

/** Word-3-gram min-hash fingerprint in one compiled loop — identical values
  * to `TextAnalysis.fingerprintFromTokens(tokensCol(text))`: lowercased
  * whitespace tokens; < 3 tokens hashes the space-joined token string.
  */
case class WordFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val md = MessageDigest.getInstance("MD5")
    val tokens = input.asInstanceOf[UTF8String].toString.trim.toLowerCase
      .split("\\s+").filter(_.nonEmpty)
    def h(s: String): Long = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      SketchHash.stable60(md, b, 0, b.length)
    }
    if (tokens.length < 3) h(tokens.mkString(" "))
    else {
      var min = Long.MaxValue
      var i = 0
      while (i + 2 < tokens.length) {
        val v = h(tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2))
        if (v < min) min = v
        i += 1
      }
      min
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordFingerprint =
    copy(child = newChild)

  override def prettyName: String = "word_fingerprint"
}

/** Space-joined lowercase word n-grams as `array<string>` — the unit of
  * eval-set decontamination (remove training docs sharing any n-gram with a
  * held-out benchmark). Tokens are whitespace-split lowercased words; a text
  * with 1 to n-1 tokens contributes its whole token run as one gram (so
  * short docs are still decontaminatable), an empty/blank text none. One
  * compiled loop per row; the HOF formulation (transform over sequence with
  * slice+array_join per element) interprets two lambdas per gram.
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[UTF8String].toString.trim.toLowerCase
      .split("\\s+").filter(_.nonEmpty)
    val grams: Array[UTF8String] =
      if (tokens.isEmpty) Array.empty
      else if (tokens.length < n) Array(UTF8String.fromString(tokens.mkString(" ")))
      else {
        val out = new Array[UTF8String](tokens.length - n + 1)
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i <= tokens.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(tokens(i + j))
            j += 1
          }
          out(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        out
      }
    new GenericArrayData(grams.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

/** Space-joined n-gram windows over an EXISTING token array — the native
  * twin of `QualitySignals.ngramsStrict`'s HOF formulation, value-identical:
  * fewer than `n` tokens yield an EMPTY array (unlike [[WordNGrams]]'s
  * whole-run fallback), otherwise one gram per window position.
  *
  * Round-16 motivation: the HOF form `transform(sequence(1, sz-n+1),
  * i -> array_join(slice(tokens, i, n), " "))` embeds the TOKENS argument
  * inside the lambda body, so when a caller passes a computed expression
  * (q148 passed the whole tokenizer) it re-evaluates once PER GRAM — 46×
  * redundant tokenization per document — and even over a bound attribute
  * it interprets two lambdas per gram. One compiled loop, tokens
  * evaluated exactly once.
  */
case class ArrayNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(n >= 1, s"array_ngrams: n must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sz = arr.numElements()
    val m = sz - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val toks = new Array[UTF8String](sz)
      var i = 0
      while (i < sz) { toks(i) = arr.getUTF8String(i); i += 1 }
      val out = new Array[Any](m)
      i = 0
      while (i < m) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = toks(i + k); k += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayNGrams =
    copy(child = newChild)

  override def prettyName: String = "array_ngrams"
}

/** Exact character-shingle Jaccard between two strings in one compiled pass:
  * distinct n-gram sets of both sides (code-point windows; texts shorter
  * than n contribute themselves), then |A∩B| / |A∪B| — value-identical to
  * `size(array_intersect(distinct a, distinct b)) / size(array_union(...))`
  * over [[CharShingles]] without materializing four intermediate arrays
  * per pair.
  */
case class ShingleJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def shingleSet(s: String): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val cps = s.codePoints().toArray
    if (cps.length < n) out.add(s)
    else {
      var i = 0
      while (i <= cps.length - n) { out.add(new String(cps, i, n)); i += 1 }
    }
    out
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = shingleSet(a.asInstanceOf[UTF8String].toString)
    val sb = shingleSet(b.asInstanceOf[UTF8String].toString)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    inter.toDouble / union
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "shingle_jaccard"
}

/** Broder CONTAINMENT C(left, right) = |S_left ∩ S_right| / |S_left| over
  * the same distinct n-gram shingle sets as [[ShingleJaccard]] — the
  * asymmetric near-superset measure (quote/inclusion detection). One
  * compiled pass per pair; same shingle semantics (codepoint n-grams,
  * whole-string fallback under length n) so the two measures are always
  * computed over identical sets.
  */
case class ShingleContainment(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def shingleSet(s: String): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val cps = s.codePoints().toArray
    if (cps.length < n) out.add(s)
    else {
      var i = 0
      while (i <= cps.length - n) { out.add(new String(cps, i, n)); i += 1 }
    }
    out
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = shingleSet(a.asInstanceOf[UTF8String].toString)
    val sb = shingleSet(b.asInstanceOf[UTF8String].toString)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / sa.size
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleContainment =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "shingle_containment"
}

/** Both containments AND Jaccard of one pair in ONE pass:
  * `struct<cont_ab, cont_ba, jac>`. Evaluating the three measures as
  * separate expressions builds the two shingle sets three times each and
  * walks the intersection three times; on a candidate-pair verifier
  * (hundreds of thousands of pairs per corpus) that constant is the
  * difference between a 2 s and a 29 s stage (q115 at sf0.1). Values are
  * bit-identical to [[ShingleContainment]]/[[ShingleJaccard]] — same
  * sets, same |∩|, same divisions (spec-pinned).
  */
case class ShinglePairScores(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("cont_ab", DoubleType, nullable = false),
    StructField("cont_ba", DoubleType, nullable = false),
    StructField("jac", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  // Round 16: allocation-free evaluator. The candidate verifier runs on
  // every LSH pair (1.4M pairs at sf0.1), and the HashSet<String>
  // formulation allocated one String per window per side per pair. This
  // version dedupes windows with open-addressed offset tables directly
  // over the code-point arrays — same sets, same |∩|, same divisions
  // (SketchSpec pins value parity against the HOF formulation).

  /** Open-addressed table of distinct window START OFFSETS over `cps`.
    * Returns (table, mask, distinctCount); empty slots hold -1.
    */
  private def buildTable(cps: Array[Int], m: Int): (Array[Int], Int, Int) = {
    var cap = 8
    while (cap < m * 2) cap <<= 1
    val table = new Array[Int](cap)
    java.util.Arrays.fill(table, -1)
    val mask = cap - 1
    var distinct = 0
    var i = 0
    while (i < m) {
      var h = windowHash(cps, i) & mask
      var done = false
      while (!done) {
        val off = table(h)
        if (off == -1) { table(h) = i; distinct += 1; done = true }
        else if (windowEq(cps, off, cps, i)) done = true // dup window
        else h = (h + 1) & mask
      }
      i += 1
    }
    (table, mask, distinct)
  }

  private def windowHash(cps: Array[Int], off: Int): Int = {
    var h = 1
    var k = 0
    while (k < n) { h = h * 31 + cps(off + k); k += 1 }
    // finalizer: spread the polynomial hash before masking
    h ^= (h >>> 16)
    h * 0x85ebca6b
  }

  private def windowEq(a: Array[Int], ao: Int, b: Array[Int], bo: Int): Boolean = {
    var k = 0
    while (k < n) {
      if (a(ao + k) != b(bo + k)) return false
      k += 1
    }
    true
  }

  /** Distinct windows of `probe` found in `base`'s table. */
  private def intersect(base: Array[Int], baseTable: Array[Int], mask: Int,
      probe: Array[Int], probeTable: Array[Int], probeMask: Int): Int = {
    var inter = 0
    var s = 0
    while (s <= probeMask) {
      val off = probeTable(s) // each DISTINCT probe window exactly once
      if (off != -1) {
        var h = windowHash(probe, off) & mask
        var done = false
        while (!done) {
          val boff = baseTable(h)
          if (boff == -1) done = true
          else if (windowEq(base, boff, probe, off)) { inter += 1; done = true }
          else h = (h + 1) & mask
        }
      }
      s += 1
    }
    inter
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = a.asInstanceOf[UTF8String].toString
    val sb = b.asInstanceOf[UTF8String].toString
    val cpa = sa.codePoints().toArray
    val cpb = sb.codePoints().toArray
    // whole-string fallback (< n code points = one shingle, the string
    // itself): an under-length string can only ever match another
    // under-length EQUAL string — n-length windows are never that short
    if (cpa.length < n || cpb.length < n) {
      val na = if (cpa.length < n) 1 else cpa.length - n + 1
      val nb = if (cpb.length < n) 1 else cpb.length - n + 1
      // distinct counts still needed on the long side
      val (da, db) =
        if (cpa.length >= n) (buildTable(cpa, na)._3, 1)
        else if (cpb.length >= n) (1, buildTable(cpb, nb)._3)
        else (1, 1)
      val inter =
        if (cpa.length < n && cpb.length < n) (if (sa == sb) 1 else 0)
        else 0
      val union = da + db - inter
      return org.apache.spark.sql.catalyst.InternalRow(
        inter.toDouble / da, inter.toDouble / db, inter.toDouble / union)
    }
    val ma = cpa.length - n + 1
    val mb = cpb.length - n + 1
    val (ta, maskA, da) = buildTable(cpa, ma)
    val (tb, maskB, db) = buildTable(cpb, mb)
    val inter = intersect(cpa, ta, maskA, cpb, tb, maskB)
    val union = da + db - inter
    org.apache.spark.sql.catalyst.InternalRow(
      inter.toDouble / da, inter.toDouble / db, inter.toDouble / union)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShinglePairScores =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "shingle_pair_scores"
}

/** Language-ID + quality score in ONE compiled loop per row, returning
  * `struct<lang_pred: string, quality: double>` — value-identical to the
  * HOF formulation in `TextAnalysis.languageIdFromTokens` /
  * `qualityScoreFromTokens` (which interprets 4 marker-set filters plus an
  * aggregate lambda per row). Semantics pinned:
  *  - tokens = lowercased trimmed text split on \s+, empties dropped;
  *  - lang = alphabetically-first argmax of marker-hit counts, "und" if 0;
  *  - quality = floor((lenScore + alphaRatio + stopScore + wordLenScore)
  *    / 4 * 1e4) / 1e4 with the exact same operand order (floor-quantize,
  *    not round — cross-engine bit-stability).
  */
case class LangQuality(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  // marker lookup tables compiled once per expression instance
  private val langs: Array[String] = markers.map(_._1).sorted.toArray
  private val sets: Array[Set[String]] =
    langs.map(l => markers.toMap.apply(l).toSet)
  private val allMarkers: Set[String] = sets.foldLeft(Set.empty[String])(_ ++ _)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val tokens = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

    // one pass over tokens: per-language hits, union hits, summed lengths
    val hits = new Array[Int](langs.length)
    var unionHits = 0
    var tokLenSum = 0L
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      tokLenSum += tok.codePointCount(0, tok.length)
      var j = 0
      while (j < langs.length) {
        if (sets(j).contains(tok)) hits(j) += 1
        j += 1
      }
      if (allMarkers.contains(tok)) unionHits += 1
      t += 1
    }
    var best = 0
    var bestJ = -1
    var j = 0
    while (j < langs.length) {
      if (hits(j) > best) { best = hits(j); bestJ = j } // first (alphabetical) max
      j += 1
    }
    val lang = if (best <= 0) "und" else langs(bestJ)

    // one pass over characters: code-point length + [a-zA-Z ] count
    val nChars = s.codePointCount(0, s.length).toDouble
    var alpha = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == ' ') alpha += 1
      i += 1
    }

    val nTok = tokens.length.toDouble
    val lenScore = math.min(nChars / 500.0, 1.0)
    val alphaRatio = alpha.toDouble / math.max(nChars, 1.0)
    val stopScore = math.min(unionHits.toDouble / math.max(nTok, 1.0) * 5.0, 1.0)
    val meanWordLen = tokLenSum.toDouble / math.max(nTok, 1.0)
    val wordLenScore = if (meanWordLen >= 3.0 && meanWordLen <= 12.0) 1.0 else 0.5
    val quality =
      math.floor((lenScore + alphaRatio + stopScore + wordLenScore) / 4.0 * 10000.0) / 10000.0
    org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(lang), quality)
  }

  override protected def withNewChildInternal(newChild: Expression): LangQuality =
    copy(child = newChild)

  override def prettyName: String = "lang_quality"
}

/** 32-bit SimHash over whitespace tokens of the trimmed text: bit k is set
  * iff the ±1 sum of bit k across `stable60(md5(token))` values is positive
  * (identical to the HOF formulation in Dedup.simhash32).
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](32)
    val tokens = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (tok.nonEmpty) {
        val b = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val h = SketchHash.stable60(md, b, 0, b.length)
        var k = 0
        while (k < 32) {
          if (((h >> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
      }
      t += 1
    }
    var out = 0L
    var k = 0
    while (k < 32) { if (counts(k) > 0) out |= 1L << k; k += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}
