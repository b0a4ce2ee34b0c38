package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Golden tests for the REAL image path: `ImageIO.write` fixtures built
  * in-test, decoded back through the ImageIO-first decoder, and hashed
  * with hand-computed expectations. The md5 stub must survive only as the
  * fallback for undecodable bytes.
  */
class MultimodalImageSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("ImageIoDecoder: real dimensions for a PNG, md5-stub fallback for text bytes") {
    // non-square so width/height transposition would fail loudly
    val img = new java.awt.image.BufferedImage(
      12, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 2, 0xff8040)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val (len, md5, w, h) = Multimodal.ImageIoDecoder.decode(png)
    assert((len, w, h) == ((png.length.toLong, 12, 5)))
    assert(md5.length == 32)
    val text = "not an image at all".getBytes("UTF-8")
    assert(Multimodal.ImageIoDecoder.decode(text) == Multimodal.StubDecoder.decode(text))
  }

  test("decodeLumaGrid: grayscale PNG roundtrip recovers exact pixels; raw samples, not the CS_GRAY->sRGB gamma of getRGB") {
    val px = Array.tabulate(64)(i => (i * 4 + 1) % 256) // includes mid-grays the gamma curve remaps
    val bytes = Multimodal.synthGrayPng(px, 8)
    val Some((w, h, got)) = Multimodal.decodeLumaGrid(bytes, 8)
    assert((w, h) == ((8, 8)))
    assert(got.toSeq == px.toSeq) // exact: lossless PNG + raw raster samples
    assert(Multimodal.decodeLumaGrid("nope".getBytes("UTF-8"), 8).isEmpty)
  }

  test("decodeLumaGrid: 16x16 image block-averages to 8x8 with integer div") {
    // 2x2 blocks of (v, v, v+2, v+4) -> mean (4v+6)/4 = v+1 (integer div)
    val px16 = Array.tabulate(256) { i =>
      val (y, x) = (i / 16, i % 16)
      val v = ((y / 2) * 8 + (x / 2)) % 250
      v + (y % 2) * 2 * (x % 2 + 1) // block holds v, v, v+2, v+4
    }
    val bytes = Multimodal.synthGrayPng(px16, 16)
    val Some((w, h, got)) = Multimodal.decodeLumaGrid(bytes, 8)
    assert((w, h) == ((16, 16)))
    val want = Array.tabulate(64)(i => ((i / 8) * 8 + (i % 8)) % 250 + 1)
    assert(got.toSeq == want.toSeq)
  }

  test("perceptualHashes: hand-computed aHash/dHash bands on a known image; stub bands flagged is_real=0") {
    import spark.implicits._
    // half dark (0), half bright (200): aHash = bright half exactly
    val px = Array.tabulate(64)(i => if (i % 8 < 4) 0 else 200)
    val bytes = Multimodal.synthGrayPng(px, 8)
    val df = Seq((1L, bytes), (2L, "junk bytes".getBytes("UTF-8")))
      .toDF("id", "img")
    val rows = Multimodal.perceptualHashes(df, "img")
      .select("id", "width", "height", "is_real", "a0", "a1", "a2", "a3", "d0", "d1", "d2", "d3")
      .collect().map(r => r.getLong(0) -> r).toMap
    val real = rows(1L)
    assert((real.getInt(1), real.getInt(2), real.getInt(3)) == ((8, 8, 1)))
    // per row: bits 4..7 set -> 0xf0; two rows per 16-bit band -> 0xf0f0
    assert((4 to 7).map(real.getLong) == Seq(0xf0f0L, 0xf0f0L, 0xf0f0L, 0xf0f0L))
    // dHash: within a row only col 3 -> 4 rises (0 < 200, bit NOT set;
    // px[c] > px[c+1] false everywhere) -> all zero
    assert((8 to 11).map(real.getLong) == Seq(0L, 0L, 0L, 0L))
    val stub = rows(2L)
    assert(stub.getInt(3) == 0)
    assert((4 to 7).map(stub.getLong).forall(v => v >= 0L && v <= 0xffffL))
    assert((8 to 11).map(stub.getLong).forall(v => v >= 0L && v <= 0x3fffL))
  }

  test("synthWav/decodeWav: 16-bit PCM roundtrips bit-exactly through the real WAV codec") {
    val samples = Array.tabulate(64)(i => (i * 997 - 30000).toShort)
    val wav = Multimodal.synthWav(samples, 8000)
    val Some((rate, ch, got)) = Multimodal.decodeWav(wav)
    assert((rate, ch) == ((8000, 1)))
    assert(got.toSeq == samples.toSeq)
    assert(Multimodal.decodeWav("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("audioFeatures: hand-computed energy/zero-crossings/peak; undecodable rows emit nothing") {
    import spark.implicits._
    // window 0: alternating ±100 -> 3 crossings, energy 4*10000, peak 100
    // window 1: ramp 1..4 (no crossing), energy 1+4+9+16, peak 4
    val samples = Array[Short](100, -100, 100, -100, 1, 2, 3, 4)
    val wav = Multimodal.synthWav(samples, 16000)
    val df = Seq((1L, wav), (2L, "junk".getBytes("UTF-8"))).toDF("id", "wav")
    val rows = Multimodal.audioFeatures(df, "wav", windowSize = 4)
      .select("id", "sample_rate", "n_samples", "win", "energy", "n_zc", "peak")
      .collect()
    assert(rows.forall(_.getLong(0) == 1L)) // undecodable row 2 dropped
    val byWin = rows.map(r => r.getLong(3) ->
      (r.getInt(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(byWin(0L) == ((16000, 8L, 40000L, 3L, 100L)))
    assert(byWin(1L) == ((16000, 8L, 30L, 0L, 4L)))
  }

  test("extractMeta: real raster dimensions for decodable media, md5 pseudo-dims otherwise") {
    import spark.implicits._
    val png = Multimodal.synthGrayPng(Array.fill(64)(7), 8)
    val df = Seq((1L, png), (2L, "plain text".getBytes("UTF-8"))).toDF("id", "media")
    val got = Multimodal.extractMeta(df, "media")
      .select($"id", $"media_meta.width", $"media_meta.height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got(1L) == ((8, 8)))
    val (_, _, sw, sh) = Multimodal.StubDecoder.decode("plain text".getBytes("UTF-8"))
    assert(got(2L) == ((sw, sh)))
  }

  test("MpegFrameParser: hand-computed frame walk — CBR, padded frames, junk-prefix resync, non-MPEG fallback") {
    // 20 frames, 128 kbps (brIdx 9), 44100 Hz (srIdx 0), mono:
    // frameLen = 144*128000/44100 = 417; duration = 20*1152*1e6/44100
    val clean = Multimodal.synthMp3(nFrames = 20, brIdx = 9, srIdx = 0, mono = true)
    assert(clean.length == 20 * 417)
    val m = Multimodal.MpegFrameParser.parse(clean)
    assert(m == Multimodal.MpegMeta(isMpeg = true, 20, 44100, 1, 128,
      20L * 1152L * 1000000L / 44100L, 0))
    // padding bit every 4th frame lengthens THOSE frames by one byte —
    // a walker ignoring padding desyncs after the first padded frame
    val padded = Multimodal.synthMp3(nFrames = 12, brIdx = 1, srIdx = 1,
      mono = false, padEvery = 4)
    // 32 kbps @ 48000: frameLen = 96 (+1 on frames 0,4,8)
    assert(padded.length == 12 * 96 + 3)
    val mp = Multimodal.MpegFrameParser.parse(padded)
    assert(mp == Multimodal.MpegMeta(isMpeg = true, 12, 48000, 2, 32,
      12L * 1152L * 1000000L / 48000L, 0))
    // junk prefix (ID3-tag stand-in: ASCII never carries the 0xFFE sync)
    // must resync to the full frame count and be disclosed as junk bytes
    val tagged = "TAG-JUNK-PREFIX".getBytes("UTF-8") ++ clean
    val mt = Multimodal.MpegFrameParser.parse(tagged)
    assert(mt.isMpeg && mt.nFrames == 20 && mt.nJunkBytes == 15)
    // non-MPEG bytes: honest fallback, zeroed fields, all bytes junk
    val text = "definitely not audio".getBytes("UTF-8")
    assert(Multimodal.MpegFrameParser.parse(text) ==
      Multimodal.MpegMeta(isMpeg = false, 0, 0, 0, 0, 0L, text.length))
  }

  test("mpegMeta: batch-wise struct attach — parsed fields for framed bytes, is_mpeg=false fallback otherwise") {
    import spark.implicits._
    val mp3 = Multimodal.synthMp3(nFrames = 18, brIdx = 14, srIdx = 2, mono = false)
    val df = Seq((1L, mp3), (2L, "payload-free".getBytes("UTF-8"))).toDF("id", "media")
    val got = Multimodal.mpegMeta(df, "media")
      .select($"id", $"mpeg_meta.is_mpeg", $"mpeg_meta.n_frames",
        $"mpeg_meta.sample_rate", $"mpeg_meta.avg_bitrate_kbps",
        $"mpeg_meta.duration_us")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))).toMap
    assert(got(1L) == ((true, 18, 32000, 320, 18L * 1152L * 1000000L / 32000L)))
    assert(got(2L) == ((false, 0, 0, 0, 0L)))
  }
}
