package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream, ZipEntry,
  ZipInputStream, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Compressed-text ingestion on the codecs a Spark executor actually
  * has — `java.util.zip` (gzip/deflate/zip) plus the zstd codec jars
  * every Spark distribution bundles for its own shuffle/parquet
  * compression (aircompressor pure-Java decode, zstd-jni encode) —
  * REAL compression both ways, no stub: web dumps and
  * document archives arrive as gzip members and zip containers, and a
  * training-data pipeline's first operator is "get the text back out,
  * verifiably". The reference ingests only uncompressed PDF bytes
  * (`pipeline1.py:605-612`); this is the archive half of the multimodal
  * ingestion story next to [[PdfTextExtractor]]'s filter chain.
  *
  * Scale shape (the [[graft.operators.ContainerMeta]] contract): bytes
  * never leave their scan task — only fixed-width metadata and the
  * round-tripped text columns shuffle; per-row codec work is spread by an
  * explicit pre-codec repartition at the call site (the q90 lesson).
  *
  * Oracle contract: compression output is deflate-implementation-specific
  * (NOT replayable in SQL), so oracle-checked columns are all functions of
  * the DECOMPRESSED text (lengths, md5, substrings) — an engine that
  * corrupts one byte anywhere in compress→store→decompress fails the
  * hash. Compressed sizes/ratios are spec-asserted, not oracle columns.
  */
object CompressedText {

  // ---------------------------------------------------------------------
  // gzip members (RFC 1952)
  // ---------------------------------------------------------------------

  def gzip(text: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream(text.length / 2 + 32)
    val gz = new GZIPOutputStream(bos)
    gz.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    gz.close()
    bos.toByteArray
  }

  /** Decompress one gzip member; None on anything that is not a valid
    * gzip stream (magic, flags, or CRC failure — GZIPInputStream checks
    * the trailer CRC32, so corruption cannot yield silent garbage).
    */
  /** Initial growth-buffer size: proportional to the input but clamped —
    * `bytes.length * 3` overflows Int for entities past ~715 MB, and the
    * ctor's IllegalArgumentException would crash the scan task instead
    * of taking the skip-not-crash fallback the WARC split documents.
    */
  private def bufSize(n: Int): Int = math.max(64, math.min(n, Int.MaxValue / 4))

  def gunzip(bytes: Array[Byte]): Option[String] =
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream(bufSize(bytes.length))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      Some(new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => None }

  /** Decompress one gzip stream to BYTES — the HTTP `Content-Encoding:
    * gzip` entity shape ([[WarcReader]]'s inline decode); None on any
    * framing/CRC violation (GZIPInputStream verifies the trailer CRC32,
    * so corruption can never yield silent garbage).
    */
  def gunzipBytes(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream(bufSize(bytes.length))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      Some(out.toByteArray)
    } catch { case _: Throwable => None }

  /** Inflate an HTTP `Content-Encoding: deflate` entity. RFC 9110 §8.4.1.2
    * defines `deflate` as ZLIB-wrapped (RFC 1950), but raw-deflate senders
    * are a notorious interop reality every browser accommodates — try the
    * zlib framing first, fall back to nowrap. None on corruption or
    * truncation (the stream must end exactly where the data does).
    */
  def inflateBytes(bytes: Array[Byte]): Option[Array[Byte]] = {
    def tryInflate(nowrap: Boolean): Option[Array[Byte]] = {
      val inf = new java.util.zip.Inflater(nowrap)
      try {
        inf.setInput(bytes)
        val out = new ByteArrayOutputStream(bufSize(bytes.length))
        val buf = new Array[Byte](8192)
        var n = inf.inflate(buf)
        while (n > 0) { out.write(buf, 0, n); n = inf.inflate(buf) }
        if (inf.finished()) Some(out.toByteArray) else None
      } catch { case scala.util.control.NonFatal(_) => None }
      finally inf.end()
    }
    tryInflate(false).orElse(tryInflate(true))
  }

  // ---------------------------------------------------------------------
  // zstd frames (RFC 8878)
  // ---------------------------------------------------------------------

  /** Decode one zstd frame sequence (`Content-Encoding: zstd`,
    * RFC 8878) with the PURE-JAVA decoder every Spark distribution
    * already ships (aircompressor — Spark's own parquet/orc zstd
    * codec), so scan tasks never depend on native-library extraction.
    * None on any framing/checksum violation or trailing garbage —
    * the skip-not-crash contract [[gunzipBytes]]/[[inflateBytes]] set.
    */
  def unzstdBytes(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new io.airlift.compress.zstd.ZstdInputStream(
        new ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream(bufSize(bytes.length))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      Some(out.toByteArray)
    } catch { case _: Throwable => None }

  /** FIXTURE-side zstd compression, deliberately through the OTHER
    * implementation (zstd-jni — the upstream C library via JNI, Spark's
    * shuffle codec): every fixture round-trip crosses implementations,
    * so a self-consistent encode/decode bug in either cannot pass
    * (the same two-implementation argument as the AES-256 R6 vectors).
    */
  def zstdCompress(bytes: Array[Byte], level: Int = 3): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(bytes, level)

  /** Attach a real-gzip column compressing `textCol` (partition-local,
    * REAL `GZIPOutputStream` bytes).
    */
  def gzipCorpus(df: DataFrame, textCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("gz", BinaryType, nullable = false))
    val txtIdx = inSchema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          Row.fromSeq(row.toSeq :+ gzip(row.getString(txtIdx)))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Round-trip audit: decompress `binCol` and emit oracle-checkable
    * functions of the recovered text — is_gzip, recovered char count, and
    * the md5 of the recovered text (any single corrupted byte flips it).
    * n_comp_bytes is disclosed for ratio analysis but is
    * implementation-specific (spec-asserted, excluded from oracle
    * queries).
    */
  def gunzipAudit(df: DataFrame, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("is_gzip", IntegerType, nullable = false),
      StructField("rt_n_chars", LongType, nullable = false),
      StructField("rt_md5", StringType, nullable = false),
      StructField("n_comp_bytes", LongType, nullable = false)))
    val binIdx = inSchema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          gunzip(bytes) match {
            case Some(txt) =>
              // CODEPOINT count, not UTF-16 units — matches SQL length()
              Row.fromSeq(row.toSeq ++ Seq[Any](1,
                txt.codePointCount(0, txt.length).toLong,
                md5Hex(txt), bytes.length.toLong))
            case None =>
              Row.fromSeq(row.toSeq ++ Seq[Any](0, 0L, "",
                bytes.length.toLong))
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Attach a real-zstd column compressing `textCol` (partition-local
    * zstd-jni frames — the cross-implementation fixture side; see
    * [[unzstdBytes]]). The `.jsonl.zst` convention's storage shape:
    * modern public text corpora ship zstd-framed members.
    */
  def zstdCorpus(df: DataFrame, textCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("zs", BinaryType, nullable = false))
    val txtIdx = inSchema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          Row.fromSeq(row.toSeq :+ zstdCompress(row.getString(txtIdx)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** [[gunzipAudit]]'s contract for zstd frames: decode `binCol` with
    * the PURE-JAVA decoder (the other implementation than the one that
    * compressed) and emit oracle-checkable functions of the recovered
    * text — is_zstd, codepoint count, md5. A single corrupted byte
    * anywhere in compress→store→decode flips the hash.
    */
  def unzstdAudit(df: DataFrame, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("is_zstd", IntegerType, nullable = false),
      StructField("rt_n_chars", LongType, nullable = false),
      StructField("rt_md5", StringType, nullable = false),
      StructField("n_comp_bytes", LongType, nullable = false)))
    val binIdx = inSchema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          unzstdBytes(bytes) match {
            case Some(b) =>
              val txt = new String(b, java.nio.charset.StandardCharsets.UTF_8)
              Row.fromSeq(row.toSeq ++ Seq[Any](1,
                txt.codePointCount(0, txt.length).toLong,
                md5Hex(txt), bytes.length.toLong))
            case None =>
              Row.fromSeq(row.toSeq ++ Seq[Any](0, 0L, "",
                bytes.length.toLong))
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString

  /** Split a CONCATENATED-member gzip stream (RFC 1952 §2.2 — "a gzip
    * file consists of a series of members") into one decompressed byte
    * array per member, each member's trailer CRC32 and ISIZE verified.
    * This is the decode shape `.warc.gz` crawls standardize on (one gzip
    * member per WARC record, so a reader can split work at member
    * boundaries without inflating the whole file): `GZIPInputStream`
    * transparently concatenates members and loses the boundaries, so
    * this walks headers by hand and inflates each member with a raw
    * `Inflater(nowrap)`, using `getRemaining` to find where the next
    * member starts. Any malformed member (bad magic, CRC, or truncated
    * trailer) ends the walk — members already decoded are returned, the
    * tail is dropped (never silent garbage).
    */
  def gzipMembers(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var pos = 0
    var ok = true
    while (ok && pos + 18 <= bytes.length &&
      (bytes(pos) & 0xFF) == 0x1f && (bytes(pos + 1) & 0xFF) == 0x8b &&
      (bytes(pos + 2) & 0xFF) == 8) {
      val flg = bytes(pos + 3) & 0xFF
      var ds = pos + 10 // fixed header: magic, CM, FLG, MTIME(4), XFL, OS
      try {
        if ((flg & 4) != 0) { // FEXTRA: XLEN little-endian + payload
          val xlen = (bytes(ds) & 0xFF) | ((bytes(ds + 1) & 0xFF) << 8)
          ds += 2 + xlen
        }
        if ((flg & 8) != 0) { while (bytes(ds) != 0) ds += 1; ds += 1 } // FNAME
        if ((flg & 16) != 0) { while (bytes(ds) != 0) ds += 1; ds += 1 } // FCOMMENT
        if ((flg & 2) != 0) ds += 2 // FHCRC
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(bytes, ds, bytes.length - ds)
        val bo = new ByteArrayOutputStream(8192)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n > 0) bo.write(buf, 0, n)
          else if (inf.needsInput() || inf.needsDictionary())
            throw new java.util.zip.DataFormatException("truncated member")
        }
        val deflateEnd = ds + (bytes.length - ds - inf.getRemaining)
        inf.end()
        if (deflateEnd + 8 > bytes.length)
          throw new java.util.zip.DataFormatException("truncated trailer")
        val member = bo.toByteArray
        val crc = new java.util.zip.CRC32
        crc.update(member)
        def le32(i: Int): Long =
          (bytes(i) & 0xFFL) | ((bytes(i + 1) & 0xFFL) << 8) |
            ((bytes(i + 2) & 0xFFL) << 16) | ((bytes(i + 3) & 0xFFL) << 24)
        if (le32(deflateEnd) != crc.getValue ||
          le32(deflateEnd + 4) != (member.length & 0xFFFFFFFFL))
          throw new java.util.zip.DataFormatException("CRC/ISIZE mismatch")
        out += member
        pos = deflateEnd + 8
      } catch { case _: Exception => ok = false }
    }
    out.result()
  }

  /** [[gzipMembers]] made LAZY over an `InputStream`: one decompressed
    * member per `next()`, the trailer CRC32 + ISIZE of each verified, a
    * malformed member ending the iteration with everything already
    * decoded kept (the same skip-not-crash tail contract). Peak memory
    * is O(largest member), never O(stream) — the property that lets a
    * scan task walk a multi-GB `.warc.gz` (whose members are single
    * records, KBs to MBs) without ever materializing the archive. The
    * caller owns closing `in`; this never reads past the byte after the
    * last well-formed member's trailer plus one internal buffer.
    */
  def streamMembers(in: java.io.InputStream): Iterator[Array[Byte]] =
    new scala.collection.AbstractIterator[Array[Byte]] {
      private val buf = new Array[Byte](64 * 1024)
      private var bufLen = 0 // valid bytes in buf
      private var bufPos = 0 // next unconsumed byte
      private var finished = false
      private var pending: Array[Byte] = null
      private var computed = false

      private def refill(): Boolean = {
        if (bufPos < bufLen) return true
        bufPos = 0
        bufLen = in.read(buf)
        bufLen > 0
      }
      private def readByte(): Int =
        if (!refill()) -1 else { val b = buf(bufPos) & 0xFF; bufPos += 1; b }
      private def skipN(n: Int): Boolean = {
        var k = n
        while (k > 0) { if (readByte() < 0) return false; k -= 1 }
        true
      }
      private def skipZeroTerminated(): Boolean = {
        var b = readByte()
        while (b > 0) b = readByte()
        b == 0
      }
      private def readLe32(): Long = {
        var v = 0L
        var i = 0
        while (i < 4) {
          val b = readByte()
          if (b < 0) return -1L
          v |= b.toLong << (8 * i); i += 1
        }
        v
      }

      /** Decode the next member into `pending`, or mark finished (clean
        * EOF at a member boundary, or any malformed/truncated member).
        */
      private def advance(): Unit = {
        pending = null
        if (finished) return
        val b0 = readByte()
        if (b0 < 0) { finished = true; return } // clean EOF
        val b1 = readByte(); val b2 = readByte()
        if (b0 != 0x1f || b1 != 0x8b || b2 != 8) { finished = true; return }
        val flg = readByte()
        if (flg < 0 || !skipN(6)) { finished = true; return } // MTIME,XFL,OS
        try {
          if ((flg & 4) != 0) { // FEXTRA
            val x0 = readByte(); val x1 = readByte()
            if (x1 < 0 || !skipN(x0 | (x1 << 8))) { finished = true; return }
          }
          if ((flg & 8) != 0 && !skipZeroTerminated()) { finished = true; return }
          if ((flg & 16) != 0 && !skipZeroTerminated()) { finished = true; return }
          if ((flg & 2) != 0 && !skipN(2)) { finished = true; return }
          val inf = new java.util.zip.Inflater(true)
          try {
            val bo = new ByteArrayOutputStream(8192)
            val out = new Array[Byte](8192)
            while (!inf.finished()) {
              if (inf.needsInput()) {
                if (!refill())
                  throw new java.util.zip.DataFormatException("truncated member")
                inf.setInput(buf, bufPos, bufLen - bufPos)
                bufPos = bufLen // handed over; rewound via getRemaining below
              }
              val n = inf.inflate(out)
              if (n > 0) bo.write(out, 0, n)
              else if (n == 0 && inf.needsDictionary())
                throw new java.util.zip.DataFormatException("needs dictionary")
            }
            // hand the unconsumed tail of the last buffer back to the walk
            bufPos -= inf.getRemaining
            val member = bo.toByteArray
            val crcv = readLe32(); val isz = readLe32()
            if (crcv < 0 || isz < 0)
              throw new java.util.zip.DataFormatException("truncated trailer")
            val crc = new java.util.zip.CRC32
            crc.update(member)
            if (crcv != crc.getValue || isz != (member.length & 0xFFFFFFFFL))
              throw new java.util.zip.DataFormatException("CRC/ISIZE mismatch")
            pending = member
          } finally inf.end()
        } catch { case _: Exception => finished = true; pending = null }
      }

      override def hasNext: Boolean = {
        if (!computed) { advance(); computed = true }
        pending != null
      }
      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException("streamMembers")
        computed = false
        val m = pending
        pending = null
        m
      }
    }

  // ---------------------------------------------------------------------
  // zip containers (APPNOTE.TXT): multi-entry archives
  // ---------------------------------------------------------------------

  /** Build a real zip archive whose entries are contiguous CODEPOINT
    * slices of `text`: entry `part_k` (k in 0 until n) holds the k-th of
    * n equal-ish slices (the last takes the remainder) — the closed form
    * a SQL oracle replays with substr. Slicing is codepoint-aligned (SQL
    * substr semantics), never UTF-16-unit-aligned: a unit split could
    * sever a surrogate pair and corrupt the round-trip on non-ASCII
    * documents.
    */
  def zipOfSlices(text: String, n: Int): Array[Byte] = {
    require(n >= 1)
    val bos = new ByteArrayOutputStream(text.length / 2 + 64 * n)
    val z = new ZipOutputStream(bos)
    val cpLen = text.codePointCount(0, text.length)
    val step = math.max(1, cpLen / n)
    def at(cp: Int): Int = text.offsetByCodePoints(0, math.min(cp, cpLen))
    for (k <- 0 until n) {
      val from = math.min(k * step, cpLen)
      val until = if (k == n - 1) cpLen else math.min(from + step, cpLen)
      z.putNextEntry(new ZipEntry(s"part_$k"))
      z.write(text.substring(at(from), at(until))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** Attach a real-zip column: `1 + idCol % 3` slice entries of
    * `textCol` per row (closed-form in the id).
    */
  def zipCorpus(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("zip", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    val txtIdx = inSchema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val n = (1 + row.getLong(idIdx) % 3).toInt
          Row.fromSeq(row.toSeq :+ zipOfSlices(row.getString(txtIdx), n))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Walk a zip archive and EXPLODE one output row per entry:
    * (entry_name, entry text recovered, its char count and md5). Non-zip
    * bytes yield zero rows (never a crash). Decompression is real inflate
    * with the entry CRC checked by [[ZipInputStream]] on close.
    */
  def zipEntriesAudit(df: DataFrame, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("entry_name", StringType, nullable = false),
      StructField("entry_n_chars", LongType, nullable = false),
      StructField("entry_md5", StringType, nullable = false)))
    val binIdx = inSchema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          zipEntries(bytes).map { case (name, txt) =>
            Row.fromSeq(row.toSeq ++ Seq[Any](name,
              txt.codePointCount(0, txt.length).toLong, md5Hex(txt)))
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  def zipEntries(bytes: Array[Byte]): Seq[(String, String)] =
    try {
      val z = new ZipInputStream(new ByteArrayInputStream(bytes))
      val out = Seq.newBuilder[(String, String)]
      var e = z.getNextEntry
      while (e != null) {
        val bo = new ByteArrayOutputStream(256)
        val buf = new Array[Byte](8192)
        var n = z.read(buf)
        while (n > 0) { bo.write(buf, 0, n); n = z.read(buf) }
        out += ((e.getName,
          new String(bo.toByteArray, java.nio.charset.StandardCharsets.UTF_8)))
        e = z.getNextEntry
      }
      z.close()
      out.result()
    } catch { case _: Throwable => Seq.empty }
}
