package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ContainerMeta
import graft.operators.ContainerMeta.{AdtsParser, EbmlParser, FlacParser, Id3Parser, Mp4BoxParser, OggParser}

/** Golden tests for the codec-free container walks (mp4 box tree, AAC
  * ADTS frames): synth fixtures parse back to their construction
  * parameters, hand-built variants exercise the branches the synth path
  * never takes (64-bit largesize, v1 mvhd/tkhd, junk resync, non-media
  * fallback), and a real muxer-shaped corner (size=0 to-end box) walks
  * cleanly.
  */
class ContainerMetaSpec extends AnyFunSuite {

  test("Mp4BoxParser: synth roundtrip — every closed-form field") {
    val b = ContainerMeta.synthMp4(durationSec = 12, width = 336,
      height = 256, videoCodec = "vp09", withAudio = true)
    val m = Mp4BoxParser.parse(b)
    assert(m.isMp4)
    assert(m.brand == "isom")
    assert(m.timescale == 600)
    assert(m.durationMs == 12000L)
    assert(m.nTracks == 2 && m.nVideo == 1 && m.nAudio == 1)
    assert(m.width == 336 && m.height == 256)
    assert(m.videoCodec == "vp09")
    val solo = Mp4BoxParser.parse(ContainerMeta.synthMp4(10, 320, 240, "avc1", withAudio = false))
    assert(solo.nTracks == 1 && solo.nAudio == 0 && solo.videoCodec == "avc1")
  }

  test("Mp4BoxParser: non-BMFF bytes and truncated boxes fall back to is_mp4=false") {
    assert(!Mp4BoxParser.parse("not a movie at all".getBytes).isMp4)
    assert(!Mp4BoxParser.parse(Array[Byte](0, 0, 0, 9)).isMp4)
    // well-formed ftyp but no moov → no timescale → not claimed as mp4
    val ftypOnly = ContainerMeta.synthMp4(10, 320, 240, "avc1", withAudio = false).take(20)
    assert(!Mp4BoxParser.parse(ftypOnly).isMp4)
  }

  test("Mp4BoxParser: 64-bit largesize and version-1 mvhd/tkhd variants") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def cc(s: String) = s.getBytes("ISO-8859-1")
    def box(t: String, body: Array[Byte]) = be32(body.length + 8L) ++ cc(t) ++ body
    // largesize box: size=1 + 64-bit length
    def bigBox(t: String, body: Array[Byte]) =
      be32(1L) ++ cc(t) ++ be64(body.length + 16L) ++ body

    val ftyp = box("ftyp", cc("iso6") ++ be32(0L) ++ cc("iso6"))
    val mvhdV1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0L) ++ be64(0L) ++ // v1: 64-bit times
        be32(1000L) ++ be64(90000L) ++ be32(0x00010000L) ++
        Array.fill[Byte](2 + 10 + 36 + 24)(0) ++ be32(2L))
    val tkhdV1 = box("tkhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0L) ++ be64(0L) ++ be32(1L) ++
        be32(0L) ++ be64(90000L) ++ Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++
        be32(640L << 16) ++ be32(480L << 16))
    val hdlr = box("hdlr", Array.fill[Byte](4)(0) ++ be32(0L) ++ cc("vide") ++
      Array.fill[Byte](12)(0) :+ 0.toByte)
    val stsd = box("stsd", Array.fill[Byte](4)(0) ++ be32(1L) ++
      (be32(16L) ++ cc("hvc1") ++ Array.fill[Byte](8)(0)))
    val trak = box("trak", tkhdV1 ++ box("mdia", hdlr ++ box("minf", box("stbl", stsd))))
    val m = Mp4BoxParser.parse(ftyp ++ bigBox("moov", mvhdV1 ++ trak))
    assert(m.isMp4 && m.brand == "iso6")
    assert(m.timescale == 1000 && m.durationMs == 90000L)
    assert(m.nVideo == 1 && m.width == 640 && m.height == 480)
    assert(m.videoCodec == "hvc1")
  }

  test("AdtsParser: synth roundtrip, junk-prefix resync, non-ADTS fallback") {
    val clean = ContainerMeta.synthAdts(nFrames = 23, sfi = 4,
      channels = 2, profile = 1, frameLen = 31)
    val m = AdtsParser.parse(clean)
    assert(m.isAdts)
    assert(m.nFrames == 23 && m.sampleRate == 44100 && m.channels == 2)
    assert(m.profile == 1)
    assert(m.durationUs == 23L * 1024L * 1000000L / 44100L)
    assert(m.nJunkBytes == 0)

    // junk prefix (an ID3-ish tag) must resync, counting every skipped byte
    val tagged = "TAG123456".getBytes ++ clean
    val mt = AdtsParser.parse(tagged)
    assert(mt.nFrames == 23 && mt.nJunkBytes == 9)

    val text = "plain text, no sync word here".getBytes
    val ft = AdtsParser.parse(text)
    assert(!ft.isAdts && ft.nJunkBytes == text.length)
  }

  test("AdtsParser: a mid-stream header disagreeing with the pinned rate is a false sync") {
    val a = ContainerMeta.synthAdts(5, sfi = 0, channels = 1, profile = 1, frameLen = 20)
    val b = ContainerMeta.synthAdts(4, sfi = 3, channels = 1, profile = 1, frameLen = 20)
    val m = AdtsParser.parse(a ++ b)
    // first stream pins 96000 Hz; the 48000 Hz headers are resync'd as junk
    assert(m.sampleRate == 96000 && m.nFrames == 5)
    assert(m.nJunkBytes == b.length)
  }

  test("EbmlParser: synth roundtrip, non-default timestamp scale, 4-byte float duration, truncation fallbacks") {
    val m = EbmlParser.parse(ContainerMeta.synthEbml(
      durationMs = 12000.0, width = 1280, height = 720,
      videoCodec = "V_VP9", withAudio = true))
    assert(m.isEbml && m.docType == "webm")
    assert(m.durationMs == 12000L && m.width == 1280 && m.height == 720)
    assert(m.nTracks == 2 && m.nVideo == 1 && m.nAudio == 1)
    assert(m.videoCodec == "V_VP9")
    val noAudio = EbmlParser.parse(ContainerMeta.synthEbml(
      5000.0, 640, 360, "V_AV1", withAudio = false))
    assert(noAudio.nTracks == 1 && noAudio.nAudio == 0 &&
      noAudio.videoCodec == "V_AV1")
    // hand-built: TimestampScale 2e6 ns doubles the ms per duration unit,
    // and a 4-byte float duration must read through intBitsToFloat
    def el(id: Array[Byte], body: Array[Byte]): Array[Byte] =
      id ++ Array((0x80 | body.length).toByte) ++ body
    val hdr = el(Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte),
      el(Array(0x42.toByte, 0x82.toByte), "matroska".getBytes))
    val f4 = java.lang.Float.floatToIntBits(1500.0f)
    val info = el(Array(0x15.toByte, 0x49.toByte, 0xA9.toByte, 0x66.toByte),
      el(Array(0x2A.toByte, 0xD7.toByte, 0xB1.toByte),
        Array(0x1E.toByte, 0x84.toByte, 0x80.toByte)) ++ // 2,000,000
        el(Array(0x44.toByte, 0x89.toByte),
          Array((f4 >> 24).toByte, (f4 >> 16).toByte, (f4 >> 8).toByte, f4.toByte)))
    val seg = el(Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte), info)
    val hm = EbmlParser.parse(hdr ++ seg)
    assert(hm.isEbml && hm.docType == "matroska")
    assert(hm.durationMs == 3000L) // 1500 units x 2 ms/unit
    // truncation mid-element and non-EBML bytes: never a crash
    val whole = ContainerMeta.synthEbml(9000.0, 640, 360, "V_VP9", withAudio = false)
    assert(EbmlParser.parse(whole.take(whole.length / 2)).isEbml) // header survives
    assert(!EbmlParser.parse("plain text".getBytes).isEbml)
    assert(!EbmlParser.parse(Array[Byte](0x1A, 0x45)).isEbml)
  }

  test("FlacParser: synth roundtrip incl. 36-bit sample counts; truncated and non-FLAC fallbacks") {
    val clean = ContainerMeta.synthFlac(sampleRate = 44100, channels = 2,
      bitsPerSample = 16, totalSamples = 44100L * 7)
    val m = FlacParser.parse(clean)
    assert(m.isFlac)
    assert(m.sampleRate == 44100 && m.channels == 2 && m.bitsPerSample == 16)
    assert(m.totalSamples == 44100L * 7 && m.durationUs == 7000000L)
    assert(m.nBlocks == 2) // STREAMINFO + PADDING
    // field-boundary extremes: 8 channels, 24 bits, a >2^32 sample count
    val big = ContainerMeta.synthFlac(96000, 8, 24, (1L << 35) + 12345L)
    val mb = FlacParser.parse(big)
    assert(mb.channels == 8 && mb.bitsPerSample == 24 &&
      mb.totalSamples == (1L << 35) + 12345L)
    // truncated STREAMINFO body: never a crash, is_flac = false
    assert(!FlacParser.parse(clean.take(20)).isFlac)
    assert(!FlacParser.parse("not a flac stream at all".getBytes).isFlac)
    // magic alone with no parsable STREAMINFO
    assert(!FlacParser.parse("fLaC".getBytes).isFlac)
  }

  test("Id3Parser: v2.3 and v2.4 synth roundtrips — size encodings differ, fields agree") {
    for (vmaj <- Seq(3, 4)) {
      val b = ContainerMeta.synthId3(vmaj, title = "My Song",
        artist = "An Artist", album = "The Album", year = "2003",
        track = "7", padding = 40)
      val m = Id3Parser.parse(b)
      assert(m.isId3 && m.version == vmaj, m.toString)
      assert(m.nFrames == 5)
      assert(m.title == "My Song" && m.artist == "An Artist" &&
        m.album == "The Album" && m.year == "2003" && m.track == "7")
      assert(m.audioOffset == b.length) // tag is the whole fixture
      assert(m.tagSize == b.length - 10)
    }
    // the size encodings genuinely differ: a frame body >127 bytes makes
    // v2.3 (plain u32) and v2.4 (syncsafe) tags different lengths
    val long3 = ContainerMeta.synthId3(3, "t" * 200, "a", "b", "1999", "1", 0)
    val long4 = ContainerMeta.synthId3(4, "t" * 200, "a", "b", "1999", "1", 0)
    assert(Id3Parser.parse(long3).title == "t" * 200)
    assert(Id3Parser.parse(long4).title == "t" * 200)
  }

  test("Id3Parser: UTF-16/UTF-8 text, the mp3-after-the-tag composition, and fallbacks") {
    def cc(s: String) = s.getBytes("ISO-8859-1")
    def ss28(v: Int) = Array(((v >> 21) & 0x7F).toByte, ((v >> 14) & 0x7F).toByte,
      ((v >> 7) & 0x7F).toByte, (v & 0x7F).toByte)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // hand-built v2.3 tag with a UTF-16(BOM) TIT2 and a UTF-8-in-v2.4 TIT2
    val u16 = "naïve…".getBytes("UTF-16") // BOM-led
    val f16 = cc("TIT2") ++ be32(u16.length + 1) ++ Array[Byte](0, 0) ++
      (1.toByte +: u16)
    val tag16 = cc("ID3") ++ Array[Byte](3, 0, 0) ++ ss28(f16.length) ++ f16
    assert(Id3Parser.parse(tag16).title == "naïve…")
    val u8 = "naïve…".getBytes("UTF-8")
    val f8 = cc("TIT2") ++ ss28(u8.length + 1) ++ Array[Byte](0, 0) ++
      (3.toByte +: u8)
    val tag8 = cc("ID3") ++ Array[Byte](4, 0, 0) ++ ss28(f8.length) ++ f8
    assert(Id3Parser.parse(tag8).title == "naïve…")
    // audio_offset hands over exactly where MpegFrameParser's frames begin
    val tag = ContainerMeta.synthId3(3, "t", "a", "b", "2001", "2", 16)
    val mp3 = graft.operators.Multimodal.synthMp3(nFrames = 4, brIdx = 9,
      srIdx = 0, mono = false)
    val m = Id3Parser.parse(tag ++ mp3)
    assert(m.audioOffset == tag.length)
    val audio = (tag ++ mp3).drop(m.audioOffset)
    assert(graft.operators.Multimodal.MpegFrameParser.parse(audio).nFrames == 4)
    // fallbacks: v2.2, unsynchronised flag, truncated frame, non-tag bytes
    assert(!Id3Parser.parse(cc("ID3") ++ Array[Byte](2, 0, 0) ++ ss28(0)).isId3)
    assert(!Id3Parser.parse(cc("ID3") ++ Array[Byte](3, 0, 0x80.toByte) ++ ss28(0)).isId3)
    val trunc = cc("ID3") ++ Array[Byte](3, 0, 0) ++ ss28(20) ++
      cc("TIT2") ++ be32(999) ++ Array[Byte](0, 0)
    assert(!Id3Parser.parse(trunc).isId3)
    assert(!Id3Parser.parse("no tag here".getBytes).isId3)
  }

  test("OggParser: synth roundtrip — CRC-checked pages, vorbis id + comments, granule duration") {
    val b = ContainerMeta.synthOgg(channels = 2, sampleRate = 44100,
      totalSamples = 44100L * 5, title = "Track T", artist = "Someone",
      extraGenre = true)
    val m = OggParser.parse(b)
    assert(m.isOgg, m.toString)
    assert(m.nPages == 3)
    assert(m.channels == 2 && m.sampleRate == 44100)
    assert(m.durationUs == 5000000L)
    assert(m.title == "Track T" && m.artist == "Someone")
    assert(m.vendor == "graft" && m.nComments == 3)
    val noGenre = OggParser.parse(ContainerMeta.synthOgg(1, 8000, 8000L,
      "x", "y", extraGenre = false))
    assert(noGenre.nComments == 2 && noGenre.channels == 1)
  }

  test("OggParser: a corrupted page fails its CRC and is resynced past; packets spanning lacing boundaries reassemble") {
    val good = ContainerMeta.synthOgg(2, 48000, 48000L * 3, "t", "a", extraGenre = false)
    // flip one payload byte of the LAST page (the audio page): its CRC
    // fails, the page is skipped, duration falls back to 0 (no granule)
    val bad = good.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x5A).toByte
    val m = OggParser.parse(bad)
    assert(m.isOgg && m.nPages == 2, m.toString)
    assert(m.title == "t") // headers intact
    assert(m.durationUs == 0L) // EOS granule lost with its page
    // a >255-byte comment packet spans lacing segments (255-chunks)
    val longTitle = "L" * 400
    val spanned = OggParser.parse(ContainerMeta.synthOgg(2, 48000,
      48000L, longTitle, "a", extraGenre = false))
    assert(spanned.title == longTitle)
    // non-ogg bytes and a bare magic: never a crash
    assert(!OggParser.parse("OggS but not really a page".getBytes).isOgg)
    assert(!OggParser.parse(Array.emptyByteArray).isOgg)
  }
}
