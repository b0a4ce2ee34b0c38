package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Container-level media metadata WITHOUT codecs — the mp4/aac analog of
  * [[Multimodal.MpegFrameParser]] (q243): the JDK ships no mp4/aac/video
  * decoders, but container structure is public bit-layout, so duration /
  * track counts / dimensions / codec fourcc need only a header walk.
  * Payload decode stays honestly stubbed behind [[Multimodal]]'s seam.
  *
  * Reference analog: the reference ingests PDFs only
  * (`pipeline1.py:605-612`); multimodal container plumbing is this
  * engine's extension per SURVEY §2 (multimodal columns as opaque binary
  * + typed metadata).
  *
  * Scale shape: bytes never leave their scan task — only the fixed-width
  * meta struct shuffles; per-row parse work is spread by an explicit
  * pre-parse repartition at the call site (the q90 lesson).
  */
object ContainerMeta {

  // ---------------------------------------------------------------------
  // MP4 / ISO-BMFF (ISO/IEC 14496-12): size+fourcc box walk.
  // ---------------------------------------------------------------------

  final case class Mp4Meta(isMp4: Boolean, brand: String, timescale: Int,
      durationMs: Long, nTracks: Int, nVideo: Int, nAudio: Int,
      width: Int, height: Int, videoCodec: String)

  /** Pure-JVM ISO-BMFF box walker. Boxes are `[u32 size][fourcc]` with
    * `size == 1` → u64 largesize and `size == 0` → to-end-of-enclosure;
    * containers (`moov trak mdia minf stbl`) recurse. Reads `ftyp` (major
    * brand), `mvhd` v0/v1 (timescale, duration), per-`trak` `tkhd` v0/v1
    * (16.16 fixed width/height), `hdlr` (vide/soun handler) and the first
    * `stsd` entry fourcc (codec). No sample data is touched.
    */
  object Mp4BoxParser extends Serializable {
    private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

    private def u32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
    private def u64(b: Array[Byte], i: Int): Long =
      (u32(b, i) << 32) | u32(b, i + 4)
    private def fourcc(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

    // mutable walk state — one parser instance per row, driver-free
    private final class St {
      var brand = ""
      var timescale = 0
      var duration = 0L
      var nTracks = 0
      var nVideo = 0
      var nAudio = 0
      var width = 0
      var height = 0
      var codec = ""
      // per-trak staging: tkhd dims seen before hdlr tells us the kind
      var tw = 0
      var th = 0
      var thandler = ""
      var tcodec = ""
    }

    def parse(bytes: Array[Byte]): Mp4Meta = {
      val st = new St
      if (bytes.length < 8) return Mp4Meta(isMp4 = false, "", 0, 0L, 0, 0, 0, 0, 0, "")
      walk(bytes, 0, bytes.length, st)
      if (st.brand.isEmpty || st.timescale == 0)
        Mp4Meta(isMp4 = false, "", 0, 0L, 0, 0, 0, 0, 0, "")
      else Mp4Meta(isMp4 = true, st.brand, st.timescale,
        st.duration * 1000L / st.timescale, st.nTracks, st.nVideo,
        st.nAudio, st.width, st.height, st.codec)
    }

    private def walk(b: Array[Byte], from: Int, to: Int, st: St): Unit = {
      var i = from
      while (i + 8 <= to) {
        var size = u32(b, i)
        val typ = fourcc(b, i + 4)
        var body = i + 8
        if (size == 1L && i + 16 <= to) { size = u64(b, i + 8); body = i + 16 }
        else if (size == 0L) size = (to - i).toLong
        if (size < 8L || i + size > to) return // malformed → stop this level
        val end = (i + size).toInt
        typ match {
          case t if Containers(t) =>
            if (t == "trak") { st.tw = 0; st.th = 0; st.thandler = ""; st.tcodec = "" }
            walk(b, body, end, st)
            if (t == "trak") {
              st.nTracks += 1
              if (st.thandler == "vide") {
                st.nVideo += 1
                if (st.width == 0) { st.width = st.tw; st.height = st.th; st.codec = st.tcodec }
              } else if (st.thandler == "soun") st.nAudio += 1
            }
          case "ftyp" if body + 4 <= end =>
            st.brand = fourcc(b, body)
          case "mvhd" if body + 4 <= end =>
            val v = b(body) & 0xFF
            if (v == 1 && body + 28 + 4 <= end) {
              st.timescale = u32(b, body + 20).toInt
              st.duration = u64(b, body + 24)
            } else if (v == 0 && body + 20 <= end) {
              st.timescale = u32(b, body + 12).toInt
              st.duration = u32(b, body + 16)
            }
          case "tkhd" =>
            val v = b(body) & 0xFF
            // v0: 4 (ver/flags) + 20 (times/id/rsvd/dur) + 52 (layer..matrix)
            // v1: 4 + 32 (64-bit times, 64-bit dur) + 52
            val off = if (v == 1) body + 88 else body + 76 // 16.16 fixed w/h
            if (off + 8 <= end) {
              st.tw = (u32(b, off) >> 16).toInt
              st.th = (u32(b, off + 4) >> 16).toInt
            }
          case "hdlr" if body + 12 <= end =>
            st.thandler = fourcc(b, body + 8)
          case "stsd" if body + 16 <= end =>
            st.tcodec = fourcc(b, body + 12) // first entry's fourcc
          case _ => ()
        }
        i = end
      }
    }
  }

  val mp4MetaSchema: StructType = StructType(Seq(
    StructField("is_mp4", BooleanType, nullable = false),
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("n_video", IntegerType, nullable = false),
    StructField("n_audio", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("video_codec", StringType, nullable = false)))

  /** Attach an `mp4_meta` struct by box-walking `binaryCol` partition-
    * batch-wise; non-BMFF bytes surface as `is_mp4 = false` with zeroed
    * fields (the honest fallback, like [[Multimodal.mpegMeta]]).
    */
  def mp4Meta(df: DataFrame, binaryCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("mp4_meta", mp4MetaSchema, nullable = false))
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val m = Mp4BoxParser.parse(row.getAs[Array[Byte]](binIdx))
          Row.fromSeq(row.toSeq :+ Row(m.isMp4, m.brand, m.timescale,
            m.durationMs, m.nTracks, m.nVideo, m.nAudio, m.width,
            m.height, m.videoCodec))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic minimal ISO-BMFF fixture per id — constructible without
    * a muxer: `ftyp(isom)` + `moov(mvhd + video trak [+ audio trak])`.
    * Closed-form in the id (oracle replays without parsing a byte):
    * timescale 600, duration 600·(10 + id mod 7) units → (10 + id mod 7)
    * seconds; video 320+16·(id mod 8) × 240+16·(id mod 5), codec avc1 on
    * even ids else vp09; an mp4a audio trak iff id mod 3 = 0.
    */
  def synthMp4Corpus(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("mp4", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(idIdx)
          Row.fromSeq(row.toSeq :+ synthMp4(
            durationSec = (10 + id % 7).toInt,
            width = (320 + 16 * (id % 8)).toInt,
            height = (240 + 16 * (id % 5)).toInt,
            videoCodec = if (id % 2 == 0) "avc1" else "vp09",
            withAudio = id % 3 == 0))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Build minimal ISO-BMFF bytes: ftyp + moov(mvhd + trak(s)). */
  def synthMp4(durationSec: Int, width: Int, height: Int,
      videoCodec: String, withAudio: Boolean): Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ cc(typ) ++ body

    val timescale = 600L
    val dur = timescale * durationSec
    val ftyp = box("ftyp", cc("isom") ++ be32(0L) ++ cc("isom"))
    val mvhd = box("mvhd",
      Array.fill[Byte](4)(0) ++ be32(0L) ++ be32(0L) ++ // v0, ctime, mtime
        be32(timescale) ++ be32(dur) ++ be32(0x00010000L) ++ // rate 1.0
        Array.fill[Byte](2 + 10 + 36 + 24)(0) ++ be32(3L)) // next track
    def trak(handler: String, codec: String, w: Int, h: Int): Array[Byte] = {
      val tkhd = box("tkhd",
        Array.fill[Byte](4)(0) ++ be32(0L) ++ be32(0L) ++ be32(1L) ++ // id
          be32(0L) ++ be32(dur) ++ Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++
          be32(w.toLong << 16) ++ be32(h.toLong << 16))
      val mdhd = box("mdhd",
        Array.fill[Byte](4)(0) ++ be32(0L) ++ be32(0L) ++
          be32(timescale) ++ be32(dur) ++ Array.fill[Byte](4)(0))
      val hdlr = box("hdlr",
        Array.fill[Byte](4)(0) ++ be32(0L) ++ cc(handler) ++
          Array.fill[Byte](12)(0) :+ 0.toByte) // empty name
      val entry = be32(16L) ++ cc(codec) ++ Array.fill[Byte](8)(0)
      val stsd = box("stsd", Array.fill[Byte](4)(0) ++ be32(1L) ++ entry)
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", tkhd ++ mdia)
    }
    val traks = trak("vide", videoCodec, width, height) ++
      (if (withAudio) trak("soun", "mp4a", 0, 0) else Array.emptyByteArray)
    ftyp ++ box("moov", mvhd ++ traks)
  }

  // ---------------------------------------------------------------------
  // AAC ADTS (ISO/IEC 13818-7 / 14496-3): 0xFFF-sync frame walk.
  // ---------------------------------------------------------------------

  final case class AdtsMeta(isAdts: Boolean, nFrames: Int, sampleRate: Int,
      channels: Int, profile: Int, durationUs: Long, nJunkBytes: Int)

  /** ADTS header walk (pure JVM, no codec): 12-bit 0xFFF sync, layer must
    * be 0, sampling-frequency index against the public 13-entry table,
    * 13-bit frame length spanning bytes 3–5, 1024·(blocks+1) samples per
    * frame. First frame pins rate/channels; a disagreeing header is a
    * false sync (resync byte-by-byte) — the [[Multimodal.MpegFrameParser]]
    * contract applied to AAC.
    */
  object AdtsParser extends Serializable {
    private[operators] val Rates = Array(96000, 88200, 64000, 48000, 44100,
      32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

    def parse(bytes: Array[Byte]): AdtsMeta = {
      var i = 0
      var junk = 0
      var nFrames = 0
      var rate = 0
      var channels = 0
      var profile = -1
      var samples = 0L
      while (i + 7 <= bytes.length) {
        val b0 = bytes(i) & 0xFF
        val b1 = bytes(i + 1) & 0xFF
        val b2 = bytes(i + 2) & 0xFF
        val b3 = bytes(i + 3) & 0xFF
        val b4 = bytes(i + 4) & 0xFF
        val b5 = bytes(i + 5) & 0xFF
        val b6 = bytes(i + 6) & 0xFF
        val sync = b0 == 0xFF && (b1 & 0xF6) == 0xF0 // sync + layer 00
        val sfi = (b2 >> 2) & 0xF
        val prof = (b2 >> 6) & 3
        val chan = ((b2 & 1) << 2) | (b3 >> 6)
        val frameLen = ((b3 & 3) << 11) | (b4 << 3) | (b5 >> 5)
        val nBlocks = (b6 & 3) + 1
        if (sync && sfi < Rates.length && chan >= 1 && frameLen >= 7 &&
            i + frameLen <= bytes.length) {
          val sr = Rates(sfi)
          if (nFrames == 0 || (sr == rate && chan == channels)) {
            if (nFrames == 0) { rate = sr; channels = chan; profile = prof }
            nFrames += 1
            samples += 1024L * nBlocks
            i += frameLen
          } else { junk += 1; i += 1 }
        } else { junk += 1; i += 1 }
      }
      if (i < bytes.length) junk += bytes.length - i
      if (nFrames == 0) AdtsMeta(isAdts = false, 0, 0, 0, 0, 0L, bytes.length)
      else AdtsMeta(isAdts = true, nFrames, rate, channels, profile,
        samples * 1000000L / rate, junk)
    }
  }

  val adtsMetaSchema: StructType = StructType(Seq(
    StructField("is_adts", BooleanType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("profile", IntegerType, nullable = false),
    StructField("duration_us", LongType, nullable = false),
    StructField("n_junk_bytes", IntegerType, nullable = false)))

  /** Attach an `adts_meta` struct by frame-walking `binaryCol` partition-
    * batch-wise; non-ADTS bytes surface as `is_adts = false`.
    */
  def adtsMeta(df: DataFrame, binaryCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("adts_meta", adtsMetaSchema, nullable = false))
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val m = AdtsParser.parse(row.getAs[Array[Byte]](binIdx))
          Row.fromSeq(row.toSeq :+ Row(m.isAdts, m.nFrames, m.sampleRate,
            m.channels, m.profile, m.durationUs, m.nJunkBytes))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic ADTS fixture per id — headers + zero payloads of the
    * exact declared frame length. Closed-form in the id: 20 + id mod 6
    * frames, sampling index id mod 9 (96000…16000 Hz), 1 + id mod 2
    * channels, profile id mod 3, frame length 17 + id mod 50 bytes.
    */
  def synthAdtsCorpus(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("aac", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(idIdx)
          Row.fromSeq(row.toSeq :+ synthAdts(
            nFrames = (20 + id % 6).toInt,
            sfi = (id % 9).toInt,
            channels = (1 + id % 2).toInt,
            profile = (id % 3).toInt,
            frameLen = (17 + id % 50).toInt))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---------------------------------------------------------------------
  // EBML / Matroska / WebM (RFC 8794 + matroska.org): vint element walk.
  // ---------------------------------------------------------------------

  final case class EbmlMeta(isEbml: Boolean, docType: String,
      durationMs: Long, nTracks: Int, nVideo: Int, nAudio: Int,
      width: Int, height: Int, videoCodec: String)

  /** EBML element walk (pure JVM, no codec): elements are
    * `[vint id][vint size][payload]` (RFC 8794 §4); ids keep their
    * length-marker bit, sizes strip it. Reads the EBML header's DocType,
    * Segment→Info's TimestampScale (default 10⁶ ns) and float Duration,
    * and Segment→Tracks' TrackEntry kind/codec/dimensions. Cluster
    * payloads (the coded media) are never touched — the same honest
    * boundary as [[Mp4BoxParser]]. Unknown-size elements and truncated
    * vints stop the walk with whatever was parsed.
    */
  object EbmlParser extends Serializable {
    // (id value, id byte length) or null at end/malformed
    private def readVint(b: Array[Byte], pos: Int, clearMarker: Boolean): (Long, Int) = {
      if (pos >= b.length) return null
      val first = b(pos) & 0xFF
      if (first == 0) return null
      val len = Integer.numberOfLeadingZeros(first) - 24 + 1 // 1..8
      if (pos + len > b.length) return null
      var v = (if (clearMarker) first ^ (1 << (8 - len)) else first).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(pos + i) & 0xFF); i += 1 }
      (v, len)
    }

    private def uint(b: Array[Byte], from: Int, len: Int): Long = {
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | (b(from + i) & 0xFF); i += 1 }
      v
    }

    private def fl(b: Array[Byte], from: Int, len: Int): Double = len match {
      case 4 => java.lang.Float.intBitsToFloat(uint(b, from, 4).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(b, from, 8))
      case _ => 0.0
    }

    private final class St {
      var docType = ""
      var scale = 1000000L // TimestampScale default: 1 ms in ns
      var duration = 0.0
      var nTracks = 0; var nVideo = 0; var nAudio = 0
      var width = 0; var height = 0
      var codec = ""
      // per-TrackEntry staging
      var tType = 0; var tCodec = ""; var tW = 0; var tH = 0
    }

    private val Containers: Set[Long] = Set(
      0x1A45DFA3L, // EBML header
      0x18538067L, // Segment
      0x1549A966L, // Info
      0x1654AE6BL, // Tracks
      0xAEL,       // TrackEntry
      0xE0L)       // Video

    def parse(bytes: Array[Byte]): EbmlMeta = {
      val bad = EbmlMeta(isEbml = false, "", 0L, 0, 0, 0, 0, 0, "")
      val head = readVint(bytes, 0, clearMarker = false)
      if (head == null || head._1 != 0x1A45DFA3L) return bad
      val st = new St
      walk(bytes, 0, bytes.length, st)
      if (st.docType.isEmpty) bad
      else EbmlMeta(isEbml = true, st.docType,
        math.round(st.duration * (st.scale.toDouble / 1e6)),
        st.nTracks, st.nVideo, st.nAudio, st.width, st.height, st.codec)
    }

    private def walk(b: Array[Byte], from: Int, until: Int, st: St): Unit = {
      var pos = from
      while (pos < until) {
        val idr = readVint(b, pos, clearMarker = false)
        if (idr == null) return
        val (id, idLen) = idr
        val szr = readVint(b, pos + idLen, clearMarker = true)
        if (szr == null) return
        val (sz, szLen) = szr
        val body = pos + idLen + szLen
        if (sz < 0 || body + sz > until) return
        val szi = sz.toInt
        if (Containers.contains(id)) {
          if (id == 0xAEL) { st.tType = 0; st.tCodec = ""; st.tW = 0; st.tH = 0 }
          walk(b, body, body + szi, st)
          if (id == 0xAEL) {
            st.nTracks += 1
            if (st.tType == 1) {
              st.nVideo += 1
              if (st.width == 0) { st.width = st.tW; st.height = st.tH }
              if (st.codec.isEmpty) st.codec = st.tCodec
            } else if (st.tType == 2) st.nAudio += 1
          }
        } else id match {
          case 0x4282L => st.docType = new String(b, body, szi,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          case 0x2AD7B1L => st.scale = uint(b, body, szi)
          case 0x4489L => st.duration = fl(b, body, szi)
          case 0x83L => st.tType = uint(b, body, szi).toInt
          case 0x86L => st.tCodec = new String(b, body, szi,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          case 0xB0L => st.tW = uint(b, body, szi).toInt
          case 0xBAL => st.tH = uint(b, body, szi).toInt
          case _ => ()
        }
        pos = body + szi
      }
    }
  }

  val ebmlMetaSchema: StructType = StructType(Seq(
    StructField("is_ebml", BooleanType, nullable = false),
    StructField("doc_type", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("n_video", IntegerType, nullable = false),
    StructField("n_audio", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("video_codec", StringType, nullable = false)))

  /** Attach an `ebml_meta` struct by element-walking `binaryCol`. */
  def ebmlMeta(df: DataFrame, binaryCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("ebml_meta", ebmlMetaSchema, nullable = false))
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val m = EbmlParser.parse(row.getAs[Array[Byte]](binIdx))
          Row.fromSeq(row.toSeq :+ Row(m.isEbml, m.docType, m.durationMs,
            m.nTracks, m.nVideo, m.nAudio, m.width, m.height, m.videoCodec))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic WebM-shaped EBML fixture per id. Closed-form:
    * duration (8 + id mod 9) s at the default 10⁶ timestamp scale
    * (stored as a WHOLE-ms double — exactly representable, so the ms
    * output is exact), video 640+16·(id mod 6) × 360+8·(id mod 4),
    * codec V_VP9 on even ids else V_AV1, an A_OPUS audio track iff
    * id mod 2 = 0.
    */
  def synthEbmlCorpus(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("webm", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(idIdx)
          Row.fromSeq(row.toSeq :+ synthEbml(
            durationMs = (8 + id % 9) * 1000.0,
            width = (640 + 16 * (id % 6)).toInt,
            height = (360 + 8 * (id % 4)).toInt,
            videoCodec = if (id % 2 == 0) "V_VP9" else "V_AV1",
            withAudio = id % 2 == 0))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Build minimal WebM-shaped EBML bytes: header(DocType webm) +
    * Segment(Info(TimestampScale, float Duration) + Tracks(entries)).
    */
  def synthEbml(durationMs: Double, width: Int, height: Int,
      videoCodec: String, withAudio: Boolean): Array[Byte] = {
    def idBytes(id: Long): Array[Byte] = {
      val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      (1 to n).map(i => ((id >> (8 * (n - i))) & 0xFF).toByte).toArray
    }
    def size(v: Int): Array[Byte] =
      if (v < 0x7F) Array((0x80 | v).toByte)
      else Array((0x40 | (v >> 8)).toByte, (v & 0xFF).toByte)
    def el(id: Long, body: Array[Byte]): Array[Byte] =
      idBytes(id) ++ size(body.length) ++ body
    def un(v: Long, n: Int): Array[Byte] =
      (1 to n).map(i => ((v >> (8 * (n - i))) & 0xFF).toByte).toArray
    val header = el(0x1A45DFA3L,
      el(0x4282L, "webm".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
    val info = el(0x1549A966L,
      el(0x2AD7B1L, un(1000000L, 3)) ++
        el(0x4489L, un(java.lang.Double.doubleToLongBits(durationMs), 8)))
    def track(tpe: Int, codec: String, vid: Array[Byte]): Array[Byte] =
      el(0xAEL, el(0x83L, un(tpe, 1)) ++
        el(0x86L, codec.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) ++ vid)
    val video = track(1, videoCodec,
      el(0xE0L, el(0xB0L, un(width, 2)) ++ el(0xBAL, un(height, 2))))
    val audio = if (withAudio) track(2, "A_OPUS", Array.emptyByteArray)
      else Array.emptyByteArray
    val tracks = el(0x1654AE6BL, video ++ audio)
    header ++ el(0x18538067L, info ++ tracks)
  }

  // ---------------------------------------------------------------------
  // FLAC (xiph.org format spec): fLaC magic + metadata-block walk.
  // ---------------------------------------------------------------------

  final case class FlacMeta(isFlac: Boolean, sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, durationUs: Long, nBlocks: Int)

  /** FLAC metadata walk (pure JVM, no codec): `fLaC` magic, then
    * metadata blocks `[1-byte last|type][u24 length]`; STREAMINFO
    * (type 0, first block per spec) packs sample rate (20 bits),
    * channels−1 (3), bits-per-sample−1 (5) and total samples (36) into
    * its bytes 10–17. Audio frames stay untouched — duration needs only
    * total samples / rate. Anything without the magic or a well-formed
    * STREAMINFO reports `is_flac = false`.
    */
  object FlacParser extends Serializable {
    def parse(bytes: Array[Byte]): FlacMeta = {
      val bad = FlacMeta(isFlac = false, 0, 0, 0, 0L, 0L, 0)
      if (bytes.length < 8 || bytes(0) != 'f' || bytes(1) != 'L' ||
        bytes(2) != 'a' || bytes(3) != 'C') return bad
      var i = 4
      var nBlocks = 0
      var meta: FlacMeta = bad
      var last = false
      while (!last && i + 4 <= bytes.length) {
        val hdr = bytes(i) & 0xFF
        last = (hdr & 0x80) != 0
        val typ = hdr & 0x7F
        val len = ((bytes(i + 1) & 0xFF) << 16) | ((bytes(i + 2) & 0xFF) << 8) |
          (bytes(i + 3) & 0xFF)
        val body = i + 4
        if (body + len > bytes.length) return meta
        nBlocks += 1
        if (typ == 0 && len >= 34 && !meta.isFlac) {
          def u(o: Int) = bytes(body + o) & 0xFF
          val rate = (u(10) << 12) | (u(11) << 4) | (u(12) >> 4)
          val chan = ((u(12) >> 1) & 0x7) + 1
          val bps = (((u(12) & 1) << 4) | (u(13) >> 4)) + 1
          val total = ((u(13) & 0xFL) << 32) | (u(14).toLong << 24) |
            (u(15).toLong << 16) | (u(16).toLong << 8) | u(17).toLong
          if (rate > 0)
            meta = FlacMeta(isFlac = true, rate, chan, bps, total,
              total * 1000000L / rate, nBlocks)
        }
        i = body + len
      }
      if (meta.isFlac) meta.copy(nBlocks = nBlocks) else meta
    }
  }

  val flacMetaSchema: StructType = StructType(Seq(
    StructField("is_flac", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("total_samples", LongType, nullable = false),
    StructField("duration_us", LongType, nullable = false),
    StructField("n_blocks", IntegerType, nullable = false)))

  /** Attach a `flac_meta` struct by block-walking `binaryCol`. */
  def flacMeta(df: DataFrame, binaryCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("flac_meta", flacMetaSchema, nullable = false))
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val m = FlacParser.parse(row.getAs[Array[Byte]](binIdx))
          Row.fromSeq(row.toSeq :+ Row(m.isFlac, m.sampleRate, m.channels,
            m.bitsPerSample, m.totalSamples, m.durationUs, m.nBlocks))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic FLAC fixture per id (STREAMINFO + a PADDING block).
    * Closed-form in the id: rate table idx id mod 9 (8000…96000 Hz),
    * channels 1 + id mod 8, bits 16 + 8·(id mod 2), total samples
    * rate·(5 + id mod 11) — so duration is exactly (5 + id mod 11) s.
    */
  def synthFlacCorpus(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("flac", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(idIdx)
          val rate = FlacRates((id % 9).toInt)
          Row.fromSeq(row.toSeq :+ synthFlac(
            sampleRate = rate,
            channels = (1 + id % 8).toInt,
            bitsPerSample = (16 + 8 * (id % 2)).toInt,
            totalSamples = rate.toLong * (5 + id % 11)))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  private[operators] val FlacRates =
    Array(8000, 16000, 22050, 24000, 32000, 44100, 48000, 88200, 96000)

  /** Build FLAC header bytes: magic + STREAMINFO + final PADDING block. */
  def synthFlac(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20) &&
      channels >= 1 && channels <= 8 &&
      bitsPerSample >= 4 && bitsPerSample <= 32 &&
      totalSamples >= 0 && totalSamples < (1L << 36))
    val si = new Array[Byte](34)
    // min/max blocksize 4096, min/max framesize 0 (unknown)
    si(0) = 0x10; si(1) = 0; si(2) = 0x10; si(3) = 0
    si(10) = ((sampleRate >> 12) & 0xFF).toByte
    si(11) = ((sampleRate >> 4) & 0xFF).toByte
    si(12) = (((sampleRate & 0xF) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    si(13) = ((((bitsPerSample - 1) & 0xF) << 4) |
      ((totalSamples >> 32) & 0xF)).toInt.toByte
    si(14) = ((totalSamples >> 24) & 0xFF).toByte
    si(15) = ((totalSamples >> 16) & 0xFF).toByte
    si(16) = ((totalSamples >> 8) & 0xFF).toByte
    si(17) = (totalSamples & 0xFF).toByte
    // bytes 18-33: md5 of the (absent) audio stream — zeros
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.write(0); out.write(0); out.write(0); out.write(34) // STREAMINFO hdr
    out.write(si)
    out.write(0x81); out.write(0); out.write(0); out.write(4) // last PADDING
    out.write(new Array[Byte](4))
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // ID3v2 (id3.org: id3v2.3.0 / id3v2.4.0): tag + text-frame walk.
  // ---------------------------------------------------------------------

  final case class Id3Meta(isId3: Boolean, version: Int, tagSize: Int,
      nFrames: Int, title: String, artist: String, album: String,
      year: String, track: String, audioOffset: Int)

  /** ID3v2 tag walk (pure JVM) — the bytes in FRONT of q243's mp3 frames,
    * completing the mp3 container picture: header `ID3 vmaj vrev flags
    * size(syncsafe-28)`, then frames `[4-char id][size][2-byte flags]`
    * where the size is plain big-endian in v2.3 and syncsafe in v2.4 (the
    * classic interop trap, handled per version byte). Text frames (`T…`)
    * carry an encoding byte (0 = ISO-8859-1, 1 = UTF-16+BOM, 2 = UTF-16BE,
    * 3 = UTF-8) and NUL-padded text. Reads TIT2/TPE1/TALB/TRCK and
    * TYER (v2.3) / TDRC (v2.4); `audio_offset` = first byte after the tag
    * (where [[Multimodal.MpegFrameParser]] takes over). Padding (a zero
    * id byte) ends the frame walk; v2.2 (3-byte ids) and encrypted/
    * unsynchronised tags report `is_id3 = false` — the honest fallback.
    */
  object Id3Parser extends Serializable {
    private def syncsafe(b: Array[Byte], i: Int): Int =
      ((b(i) & 0x7F) << 21) | ((b(i + 1) & 0x7F) << 14) |
        ((b(i + 2) & 0x7F) << 7) | (b(i + 3) & 0x7F)
    private def u32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
        ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

    private def text(b: Array[Byte], from: Int, len: Int): String = {
      if (len <= 1) return ""
      val enc = b(from) & 0xFF
      val cs = enc match {
        case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
        case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM-led
        case 2 => java.nio.charset.StandardCharsets.UTF_16BE
        case 3 => java.nio.charset.StandardCharsets.UTF_8
        case _ => return ""
      }
      var end = from + len
      // strip trailing NUL padding (1 byte latin/utf8, 2 bytes utf16)
      val nulw = if (enc == 1 || enc == 2) 2 else 1
      while (end - nulw >= from + 1 &&
        (0 until nulw).forall(k => b(end - 1 - k) == 0)) end -= nulw
      new String(b, from + 1, end - (from + 1), cs)
    }

    def parse(bytes: Array[Byte]): Id3Meta = {
      val bad = Id3Meta(isId3 = false, 0, 0, 0, "", "", "", "", "", 0)
      if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
        bytes(2) != '3') return bad
      val vmaj = bytes(3) & 0xFF
      val flags = bytes(5) & 0xFF
      // v2.2 layout and unsynchronisation are out of scope — disclose
      if ((vmaj != 3 && vmaj != 4) || (flags & 0x80) != 0) return bad
      val tagSize = syncsafe(bytes, 6)
      val tagEnd = math.min(10 + tagSize, bytes.length)
      var pos = 10
      // extended header: v2.3 size excludes its own 4 bytes; v2.4
      // syncsafe size includes them
      if ((flags & 0x40) != 0 && pos + 4 <= tagEnd)
        pos += (if (vmaj == 3) 4 + u32(bytes, pos) else syncsafe(bytes, pos))
      var nFrames = 0
      var title = ""; var artist = ""; var album = ""
      var year = ""; var track = ""
      while (pos + 10 <= tagEnd && bytes(pos) != 0) {
        val id = new String(bytes, pos, 4,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val fsize = if (vmaj == 4) syncsafe(bytes, pos + 4) else u32(bytes, pos + 4)
        val body = pos + 10
        if (fsize < 0 || body + fsize > tagEnd) return bad
        nFrames += 1
        if (id.startsWith("T")) {
          val t = text(bytes, body, fsize)
          id match {
            case "TIT2" => title = t
            case "TPE1" => artist = t
            case "TALB" => album = t
            case "TYER" | "TDRC" => year = t
            case "TRCK" => track = t
            case _ => ()
          }
        }
        pos = body + fsize
      }
      val footer = if ((flags & 0x10) != 0) 10 else 0
      Id3Meta(isId3 = true, vmaj, tagSize, nFrames, title, artist, album,
        year, track, 10 + tagSize + footer)
    }
  }

  val id3MetaSchema: StructType = StructType(Seq(
    StructField("is_id3", BooleanType, nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("tag_size", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("artist", StringType, nullable = false),
    StructField("album", StringType, nullable = false),
    StructField("year", StringType, nullable = false),
    StructField("track", StringType, nullable = false),
    StructField("audio_offset", IntegerType, nullable = false)))

  /** Attach an `id3_meta` struct by tag-walking `binaryCol`. */
  def id3Meta(df: DataFrame, binaryCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("id3_meta", id3MetaSchema, nullable = false))
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val m = Id3Parser.parse(row.getAs[Array[Byte]](binIdx))
          Row.fromSeq(row.toSeq :+ Row(m.isId3, m.version, m.tagSize,
            m.nFrames, m.title, m.artist, m.album, m.year, m.track,
            m.audioOffset))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic ID3v2-tagged-mp3 fixture per id: an ID3v2.3 (even id)
    * or ID3v2.4 (odd id — syncsafe frame sizes) tag, then real MPEG
    * frames from [[Multimodal.synthMpeg]]'s layout via the caller.
    * Closed-form: title `t<id>`, artist `artist<id mod 13>`, album
    * `album<id mod 7>`, year 1990 + id mod 35, track 1 + id mod 12,
    * 5 text frames, 16 + id mod 49 bytes of padding.
    */
  def synthId3Corpus(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("id3", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(idIdx)
          Row.fromSeq(row.toSeq :+ synthId3(
            vmaj = if (id % 2 == 0) 3 else 4,
            title = s"t$id",
            artist = s"artist${id % 13}",
            album = s"album${id % 7}",
            year = (1990 + id % 35).toString,
            track = (1 + id % 12).toString,
            padding = (16 + id % 49).toInt))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Build ID3v2.3/2.4 tag bytes: 5 ISO-8859-1 text frames + padding. */
  def synthId3(vmaj: Int, title: String, artist: String, album: String,
      year: String, track: String, padding: Int): Array[Byte] = {
    require(vmaj == 3 || vmaj == 4)
    def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def ss28(v: Int): Array[Byte] =
      Array(((v >> 21) & 0x7F).toByte, ((v >> 14) & 0x7F).toByte,
        ((v >> 7) & 0x7F).toByte, (v & 0x7F).toByte)
    def frame(id: String, body: String): Array[Byte] = {
      val b = 0.toByte +: cc(body) // encoding 0 = ISO-8859-1
      cc(id) ++ (if (vmaj == 4) ss28(b.length) else be32(b.length)) ++
        Array[Byte](0, 0) ++ b
    }
    val yearId = if (vmaj == 4) "TDRC" else "TYER"
    val frames = frame("TIT2", title) ++ frame("TPE1", artist) ++
      frame("TALB", album) ++ frame(yearId, year) ++ frame("TRCK", track) ++
      new Array[Byte](padding)
    cc("ID3") ++ Array[Byte](vmaj.toByte, 0, 0) ++ ss28(frames.length) ++ frames
  }

  // ---------------------------------------------------------------------
  // Ogg (RFC 3533) + Vorbis I headers (xiph.org): CRC-checked page walk.
  // ---------------------------------------------------------------------

  final case class OggMeta(isOgg: Boolean, nPages: Int, channels: Int,
      sampleRate: Int, durationUs: Long, title: String, artist: String,
      vendor: String, nComments: Int)

  /** Ogg page + Vorbis header walk (pure JVM, no codec): pages are
    * `OggS ver htype granule(8 LE) serial(4 LE) seq(4 LE) crc(4 LE)
    * nsegs lacing… payload` (RFC 3533 §6); every page's CRC32 (poly
    * 0x04C11DB7, init 0, unreflected, no final xor — the Ogg variant) is
    * VERIFIED, a failing page resyncs byte-wise like
    * [[Multimodal.MpegFrameParser]]. Packets reassemble across lacing
    * boundaries (255 = continue) and pages (continued-packet flag); the
    * Vorbis identification packet (`vorbis`, channels u8 @11, rate
    * u32 LE @12) and comment packet (`vorbis`, vendor + KEY=value
    * list, keys case-insensitive per spec) feed the meta; duration is
    * the final granule position (PCM sample count for Vorbis) over the
    * rate. Audio packets are never decoded — the honest stub boundary.
    */
  object OggParser extends Serializable {
    private[operators] lazy val CrcTable: Array[Int] = {
      val t = new Array[Int](256)
      var i = 0
      while (i < 256) {
        var r = i << 24
        var k = 0
        while (k < 8) {
          r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
          k += 1
        }
        t(i) = r
        i += 1
      }
      t
    }

    private[operators] def crc(b: Array[Byte], from: Int, len: Int): Int = {
      var r = 0
      var i = from
      val end = from + len
      while (i < end) {
        r = (r << 8) ^ CrcTable(((r >>> 24) ^ (b(i) & 0xFF)) & 0xFF)
        i += 1
      }
      r
    }

    /** Page CRC per RFC 3533 §6: the 4 CRC-field bytes are fed as zeros
      * WITHOUT mutating the caller's buffer — the input may be a shared
      * Spark-row byte array parsed concurrently, and in-place zero/restore
      * is neither thread- nor exception-safe. `zeroFrom` is the absolute
      * offset of the CRC field (page start + 22).
      */
    private[operators] def crcZeroed(
        b: Array[Byte], from: Int, len: Int, zeroFrom: Int): Int = {
      var r = 0
      var i = from
      val end = from + len
      while (i < end) {
        val v = if (i >= zeroFrom && i < zeroFrom + 4) 0 else b(i) & 0xFF
        r = (r << 8) ^ CrcTable(((r >>> 24) ^ v) & 0xFF)
        i += 1
      }
      r
    }

    private def leU32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
    private def leU64(b: Array[Byte], i: Int): Long =
      leU32(b, i) | (leU32(b, i + 4) << 32)

    def parse(bytes: Array[Byte]): OggMeta = {
      val bad = OggMeta(isOgg = false, 0, 0, 0, 0L, "", "", "", 0)
      var pos = 0
      var nPages = 0
      var lastGranule = -1L
      var channels = 0
      var rate = 0
      var title = ""; var artist = ""; var vendor = ""
      var nComments = -1
      val packet = new java.io.ByteArrayOutputStream()
      var headersDone = false

      def finishPacket(): Unit = {
        val p = packet.toByteArray
        packet.reset()
        if (headersDone || p.length < 7) return
        val tag = new String(p, 1, math.min(6, p.length - 1),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        if (tag != "vorbis") return
        (p(0) & 0xFF) match {
          case 1 if p.length >= 16 && leU32(p, 7) == 0L =>
            channels = p(11) & 0xFF
            rate = leU32(p, 12).toInt
          case 3 =>
            var i = 7
            if (i + 4 <= p.length) {
              val vl = leU32(p, i).toInt; i += 4
              if (vl >= 0 && i + vl <= p.length) {
                vendor = new String(p, i, vl,
                  java.nio.charset.StandardCharsets.UTF_8)
                i += vl
                if (i + 4 <= p.length) {
                  val n = leU32(p, i).toInt; i += 4
                  nComments = n
                  var k = 0
                  while (k < n && i + 4 <= p.length) {
                    val cl = leU32(p, i).toInt; i += 4
                    if (cl < 0 || i + cl > p.length) { k = n }
                    else {
                      val c = new String(p, i, cl,
                        java.nio.charset.StandardCharsets.UTF_8)
                      i += cl
                      val eq = c.indexOf('=')
                      if (eq > 0) {
                        val key = c.substring(0, eq).toUpperCase(java.util.Locale.ROOT)
                        val v = c.substring(eq + 1)
                        if (key == "TITLE") title = v
                        else if (key == "ARTIST") artist = v
                      }
                      k += 1
                    }
                  }
                }
              }
            }
            headersDone = true // comment header is the last one we read
          case _ => ()
        }
      }

      while (pos + 27 <= bytes.length) {
        if (bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
          bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S' &&
          bytes(pos + 4) == 0) {
          val nSegs = bytes(pos + 26) & 0xFF
          val hdrLen = 27 + nSegs
          if (pos + hdrLen > bytes.length) { pos += 1 }
          else {
            var payload = 0
            var s = 0
            while (s < nSegs) { payload += bytes(pos + 27 + s) & 0xFF; s += 1 }
            if (pos + hdrLen + payload > bytes.length) { pos += 1 }
            else {
              // CRC check with the crc field zeroed (RFC 3533 §6) —
              // computed without touching the caller's buffer
              val want = leU32(bytes, pos + 22).toInt
              val got = crcZeroed(bytes, pos, hdrLen + payload, pos + 22)
              if (got != want) { pos += 1 }
              else {
                nPages += 1
                val htype = bytes(pos + 5) & 0xFF
                val granule = leU64(bytes, pos + 6)
                if (granule != -1L) lastGranule = math.max(lastGranule, granule)
                // a fresh (non-continued) page starts a fresh packet
                if ((htype & 1) == 0) packet.reset()
                var off = pos + hdrLen
                s = 0
                while (s < nSegs) {
                  val lace = bytes(pos + 27 + s) & 0xFF
                  packet.write(bytes, off, lace)
                  off += lace
                  if (lace < 255) finishPacket()
                  s += 1
                }
                pos = pos + hdrLen + payload
              }
            }
          }
        } else pos += 1
      }
      if (nPages == 0) bad
      else OggMeta(isOgg = true, nPages, channels, rate,
        if (rate > 0 && lastGranule > 0) lastGranule * 1000000L / rate else 0L,
        title, artist, vendor, math.max(nComments, 0))
    }
  }

  val oggMetaSchema: StructType = StructType(Seq(
    StructField("is_ogg", BooleanType, nullable = false),
    StructField("n_pages", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("duration_us", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("artist", StringType, nullable = false),
    StructField("vendor", StringType, nullable = false),
    StructField("n_comments", IntegerType, nullable = false)))

  /** Attach an `ogg_meta` struct by CRC-checked page-walking `binaryCol`. */
  def oggMeta(df: DataFrame, binaryCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("ogg_meta", oggMetaSchema, nullable = false))
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val m = OggParser.parse(row.getAs[Array[Byte]](binIdx))
          Row.fromSeq(row.toSeq :+ Row(m.isOgg, m.nPages, m.channels,
            m.sampleRate, m.durationUs, m.title, m.artist, m.vendor,
            m.nComments))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic Ogg-Vorbis-header fixture per id: three CRC-correct
    * pages (BOS identification / comments / EOS "audio"). Closed-form:
    * channels 1 + id mod 2, rate table idx id mod 9 ([[FlacRates]]),
    * final granule rate·(3 + id mod 7) → duration exactly (3 + id mod 7)
    * s, TITLE `t<id>`, ARTIST `artist<id mod 13>`, one extra
    * GENRE comment iff id mod 5 = 0, vendor `graft`.
    */
  def synthOggCorpus(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("ogg", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(idIdx)
          val rate = FlacRates((id % 9).toInt)
          Row.fromSeq(row.toSeq :+ synthOgg(
            channels = (1 + id % 2).toInt,
            sampleRate = rate,
            totalSamples = rate.toLong * (3 + id % 7),
            title = s"t$id",
            artist = s"artist${id % 13}",
            extraGenre = id % 5 == 0))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Build Ogg-Vorbis header bytes: 3 pages with real RFC 3533 CRCs. */
  def synthOgg(channels: Int, sampleRate: Int, totalSamples: Long,
      title: String, artist: String, extraGenre: Boolean): Array[Byte] = {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le64(v: Long): Array[Byte] = le32(v) ++ le32(v >> 32)
    def utf8(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

    def page(htype: Int, granule: Long, seq: Int, packetBody: Array[Byte]): Array[Byte] = {
      val lacing = {
        val full = packetBody.length / 255
        val rem = packetBody.length % 255
        Array.fill(full)(255.toByte) :+ rem.toByte // rem 0 ends the packet too
      }
      val hdr = utf8("OggS") ++ Array[Byte](0, htype.toByte) ++
        le64(granule) ++ le32(0x67726166L) /* serial 'graf' */ ++
        le32(seq.toLong) ++ le32(0L) /* crc slot */ ++
        Array(lacing.length.toByte) ++ lacing
      val all = hdr ++ packetBody
      val c = OggParser.crc(all, 0, all.length)
      all(22) = (c & 0xFF).toByte
      all(23) = ((c >> 8) & 0xFF).toByte
      all(24) = ((c >> 16) & 0xFF).toByte
      all(25) = ((c >> 24) & 0xFF).toByte
      all
    }

    val idPkt = Array[Byte](1) ++ utf8("vorbis") ++ le32(0L) ++
      Array(channels.toByte) ++ le32(sampleRate.toLong) ++
      le32(0L) ++ le32(0L) ++ le32(0L) ++ Array[Byte](0xB8.toByte, 1)
    val comments =
      Seq(s"TITLE=$title", s"ARTIST=$artist") ++
        (if (extraGenre) Seq("GENRE=synthetic") else Nil)
    val cmtPkt = Array[Byte](3) ++ utf8("vorbis") ++
      le32(5L) ++ utf8("graft") ++ le32(comments.length.toLong) ++
      comments.toArray.flatMap(c => le32(utf8(c).length.toLong) ++ utf8(c)) ++
      Array[Byte](1) // framing bit
    val audioPkt = new Array[Byte](64) // never decoded
    page(2, 0L, 0, idPkt) ++ page(0, 0L, 1, cmtPkt) ++
      page(4, totalSamples, 2, audioPkt)
  }

  /** Build ADTS frame bytes (7-byte headers + zero payload). */
  def synthAdts(nFrames: Int, sfi: Int, channels: Int, profile: Int,
      frameLen: Int): Array[Byte] = {
    require(sfi >= 0 && sfi < 13 && channels >= 1 && channels <= 7 &&
      profile >= 0 && profile <= 3 && frameLen >= 7 && frameLen < 8192)
    val out = new Array[Byte](nFrames * frameLen)
    (0 until nFrames).foreach { f =>
      val o = f * frameLen
      out(o) = 0xFF.toByte
      out(o + 1) = 0xF1.toByte // MPEG-4, layer 00, no CRC
      out(o + 2) = ((profile << 6) | (sfi << 2) | (channels >> 2)).toByte
      out(o + 3) = (((channels & 3) << 6) | (frameLen >> 11)).toByte
      out(o + 4) = ((frameLen >> 3) & 0xFF).toByte
      out(o + 5) = (((frameLen & 7) << 5) | 0x1F).toByte // fullness hi
      out(o + 6) = 0xFC.toByte // fullness lo, 1 raw block (field 0)
    }
    out
  }
}
