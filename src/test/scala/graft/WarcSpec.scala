package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CompressedText, WarcReader}

/** Golden tests for the WARC/1.x source: member-wise gzip splitting with
  * per-member CRC verification, the record walk (header fields,
  * Content-Length block, HTTP split), malformed-input tolerance, and the
  * fixture builder's full census.
  */
class WarcSpec extends AnyFunSuite {

  private lazy val spark: org.apache.spark.sql.SparkSession = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  private def record(tpe: String, uri: String, ct: String, block: String): Array[Byte] = {
    val blockBytes = block.getBytes(UTF_8)
    (s"WARC/1.0\r\nWARC-Type: $tpe\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Type: $ct\r\nContent-Length: ${blockBytes.length}\r\n\r\n")
      .getBytes(ISO_8859_1) ++ blockBytes ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }

  test("gzipMembers: concatenated members split at boundaries, each CRC-verified; corruption drops the tail only") {
    val a = "first member payload".getBytes(UTF_8)
    val b = "second, rather longer member payload with repetition repetition".getBytes(UTF_8)
    val c = "third".getBytes(UTF_8)
    val cat = gz(a) ++ gz(b) ++ gz(c)
    val members = CompressedText.gzipMembers(cat)
    assert(members.map(new String(_, UTF_8)) ==
      Seq(a, b, c).map(new String(_, UTF_8)))
    // corrupt a byte inside member 2's deflate data: member 1 survives,
    // 2 fails its CRC, 3 (past the unrecoverable boundary) is dropped
    val bad = cat.clone()
    bad(gz(a).length + 15) = (bad(gz(a).length + 15) ^ 0x5A).toByte
    val got = CompressedText.gzipMembers(bad)
    assert(got.length <= 2 && got.headOption.map(new String(_, UTF_8)).contains(new String(a, UTF_8)))
    assert(CompressedText.gzipMembers("not gzip at all".getBytes(UTF_8)).isEmpty)
  }

  test("record walk: warcinfo/request/response parsed with HTTP split; multi-record member and uncompressed input both work") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n<html>x</html>"
    val recs =
      record("warcinfo", "", "application/warc-fields", "software: t\r\n") ++
        record("request", "https://ex.com/p", "application/http; msgtype=request",
          "GET /p HTTP/1.1\r\nHost: ex.com\r\n\r\n") ++
        record("response", "https://ex.com/p", "application/http; msgtype=response", http)
    // one member holding all three records (legal, non-canonical), plain
    for (bytes <- Seq(gz(recs), recs)) {
      val parsed = WarcReader.parse(bytes)
      assert(parsed.map(_.warcType) == Seq("warcinfo", "request", "response"))
      val info = parsed(0)
      assert(info.httpStatus == 0 && new String(info.payload, UTF_8) == "software: t\r\n")
      val req = parsed(1)
      assert(req.httpStatus == 0 && req.targetUri == "https://ex.com/p")
      assert(new String(req.payload, UTF_8).isEmpty) // body after \r\n\r\n
      val resp = parsed(2)
      assert(resp.httpStatus == 200)
      assert(resp.httpContentType == "text/html; charset=UTF-8")
      assert(new String(resp.payload, UTF_8) == "<html>x</html>")
    }
    // member-per-record (canonical .warc.gz layout)
    val canonical = gz(record("warcinfo", "", "application/warc-fields", "s\r\n")) ++
      gz(record("response", "https://ex.com/q",
        "application/http; msgtype=response", http))
    assert(WarcReader.parse(canonical).map(_.warcType) == Seq("warcinfo", "response"))
  }

  test("malformed records: bad version line, missing Content-Length, or truncated block end the member walk without a crash") {
    assert(WarcReader.parse(gz("HTTP/1.1 200 OK\r\n\r\nnope".getBytes(UTF_8))).isEmpty)
    assert(WarcReader.parse(gz("WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes(UTF_8))).isEmpty)
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nshort".getBytes(UTF_8)
    assert(WarcReader.parse(gz(truncated)).isEmpty)
    // a good record FOLLOWED by garbage keeps the good record
    val mixed = record("metadata", "", "text/plain", "ok") ++ "garbage tail".getBytes(UTF_8)
    val got = WarcReader.parse(gz(mixed))
    assert(got.map(_.warcType) == Seq("metadata"))
    assert(new String(got.head.payload, UTF_8) == "ok")
  }

  test("fixture census end-to-end through the Dataset reader: 1 warcinfo per shard, request+response per doc, statuses and URIs closed-form") {
    val s = spark
    import s.implicits._
    val docs = (0L until 40L).map(i => (i, s"text $i & <b>bold</b>")).toDF("doc_id", "text")
    val warcs = WarcReader.buildFixture(docs, nShards = 4)
    assert(warcs.count() == 4)
    val recs = WarcReader.records(warcs, "warc").cache()
    val byType = recs.groupBy($"warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("warcinfo" -> 4L, "request" -> 40L, "response" -> 40L))
    val resp = recs.filter($"warc_type" === "response")
      .select($"target_uri", $"http_status", $"content_type").collect()
    assert(resp.length == 40)
    resp.foreach { r =>
      val id = r.getString(0).split("id=").last.toLong
      val expectStatus = if (id % 17 == 0) 404 else 200
      assert(r.getInt(1) == expectStatus, s"doc $id")
      assert(r.getString(2).startsWith(if (id % 17 == 0) "text/plain" else "text/html"))
    }
    recs.unpersist()
  }

  test("WET writer: conversion records round-trip text exactly through the same member walk") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      (0L, "https://ex.com/a", "plain text body"),
      (0L, "https://ex.com/b", "accents é and emoji 😀\nsecond line"),
      (1L, "https://ex.org/c", "")).toDF("shard", "uri", "txt")
    val wet = WarcReader.buildWet(pages, "shard", "uri", "txt")
    assert(wet.count() == 2)
    val back = WarcReader.records(wet, "wet")
    val byType = back.groupBy($"warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("warcinfo" -> 2L, "conversion" -> 3L))
    val got = back.filter($"warc_type" === "conversion")
      .select($"target_uri", $"payload").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), UTF_8)).toMap
    assert(got == Map(
      "https://ex.com/a" -> "plain text body",
      "https://ex.com/b" -> "accents é and emoji 😀\nsecond line",
      "https://ex.org/c" -> ""))
    // conversion records carry the WET content type
    assert(back.filter($"warc_type" === "conversion")
      .filter($"warc_content_type" =!= "text/plain").count() == 0)
  }

  test("streaming twin #18: digest-dedup snapshots equal the batch aggregate after every random micro-batch split") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val rnd = new scala.util.Random(7L)
    // 60 arrivals over 20 distinct bodies: mirrors share digests
    val arrivals = (0 until 60).map { i =>
      (s"digest${i % 20}", s"https://m${(i * 7) % 13}.com/u$i")
    }
    val batch = arrivals.groupBy(_._1).map { case (d, rs) =>
      d -> (rs.size.toLong, rs.map(_._2).min) }
    (0 until 3).foreach { round =>
      val cut = 1 + rnd.nextInt(arrivals.length - 1)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, String)]
      val snaps = graft.streaming.StatefulOps.runningDigestDedup(input.toDS())
      val q = snaps.writeStream.format("memory").queryName(s"dig_run$round")
        .outputMode("update").start()
      try {
        input.addData(arrivals.take(cut): _*); q.processAllAvailable()
        input.addData(arrivals.drop(cut): _*); q.processAllAvailable()
        // latest snapshot per digest = max n_urls row (counts only grow)
        val got = s.table(s"dig_run$round")
          .groupByKey(_.getString(0))
          .mapGroups { (d, it) =>
            val last = it.maxBy(_.getLong(1))
            (d, last.getLong(1), last.getString(2))
          }.collect().map(r => r._1 -> (r._2, r._3)).toMap
        assert(got == batch, s"split at $cut diverged")
      } finally q.stop()
    }
  }

  test("transfer-coding token: chunked only when FINAL listed coding; content-coding decodes inline with flagged fallback") {
    def respond(headers: String, body: Array[Byte]): WarcReader.WarcRecord = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n$headers\r\n"
        .getBytes(ISO_8859_1) ++ body
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://e.com/\r\n" +
        s"Content-Type: application/http; msgtype=response\r\nContent-Length: ${http.length}\r\n\r\n")
        .getBytes(ISO_8859_1) ++ http ++ "\r\n\r\n".getBytes(ISO_8859_1)
      WarcReader.parse(rec).head
    }
    val chunked = "5\r\nhello\r\n0\r\n\r\n".getBytes(ISO_8859_1)
    // chunked as the final coding → dechunked
    assert(new String(respond("Transfer-Encoding: chunked\r\n", chunked).payload, UTF_8) == "hello")
    assert(new String(respond("Transfer-Encoding: gzip, chunked\r\n", chunked).payload, UTF_8) == "hello")
    // merely CONTAINING the substring must not trigger a dechunk (RFC 9112 §6.1)
    assert(new String(respond("Transfer-Encoding: chunked-like-ext\r\n", chunked).payload, ISO_8859_1)
      == new String(chunked, ISO_8859_1))
    assert(new String(respond("Transfer-Encoding: chunked, gzip\r\n", chunked).payload, ISO_8859_1)
      == new String(chunked, ISO_8859_1))
    // Content-Encoding: gzip / deflate decode inline, census value carries the coding
    val body = "entity body bytes — content-coded".getBytes(UTF_8)
    val g = respond("Content-Encoding: gzip\r\n", gz(body))
    assert(new String(g.payload, UTF_8) == new String(body, UTF_8) && g.contentEncoding == "gzip")
    val dfl = { val d = new java.util.zip.Deflater(); d.setInput(body); d.finish()
      val bos = new ByteArrayOutputStream(); val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf)); d.end(); bos.toByteArray }
    val df1 = respond("Content-Encoding: deflate\r\n", dfl)
    assert(new String(df1.payload, UTF_8) == new String(body, UTF_8) && df1.contentEncoding == "deflate")
    // raw (nowrap) deflate interop fallback
    val raw = { val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(body); d.finish()
      val bos = new ByteArrayOutputStream(); val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf)); d.end(); bos.toByteArray }
    assert(new String(respond("Content-Encoding: deflate\r\n", raw).payload, UTF_8) == new String(body, UTF_8))
    // stacked codings unwind in reverse wire order: entity → gzip → chunked
    val gzBytes = gz(body)
    val framed = { val bos = new ByteArrayOutputStream()
      var i = 0
      while (i < gzBytes.length) { val n = math.min(7, gzBytes.length - i)
        bos.write((Integer.toHexString(n) + "\r\n").getBytes(ISO_8859_1))
        bos.write(gzBytes, i, n); bos.write("\r\n".getBytes(ISO_8859_1)); i += n }
      bos.write("0\r\n\r\n".getBytes(ISO_8859_1)); bos.toByteArray }
    val st = respond("Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n", framed)
    assert(new String(st.payload, UTF_8) == new String(body, UTF_8) && st.contentEncoding == "gzip")
    // broken gzip stream → raw bytes kept, FLAGGED (never a silent fallback)
    val broken = gz(body).clone(); broken(12) = (broken(12) ^ 0x5a).toByte
    val b = respond("Content-Encoding: gzip\r\n", broken)
    assert(b.contentEncoding == "gzip;undecoded" && b.payload.sameElements(broken))
    // unsupported coding (br) → flagged pass-through
    assert(respond("Content-Encoding: br\r\n", body).contentEncoding == "br;undecoded")
    // zstd decodes inline — and the round-trip crosses implementations
    // (zstd-jni C compressor here, aircompressor pure-Java decoder in the split)
    val z = respond("Content-Encoding: zstd\r\n", CompressedText.zstdCompress(body))
    assert(new String(z.payload, UTF_8) == new String(body, UTF_8) && z.contentEncoding == "zstd")
    // corrupt zstd (valid RFC 8878 magic, garbage after) → raw bytes kept, flagged
    val zBroken = Array(0x28.toByte, 0xB5.toByte, 0x2F.toByte, 0xFD.toByte) ++ body
    val zb = respond("Content-Encoding: zstd\r\n", zBroken)
    assert(zb.contentEncoding == "zstd;undecoded" && zb.payload.sameElements(zBroken))
    // identity / absent → empty census value, untouched body
    assert(respond("", body).contentEncoding == "" )
  }

  test("records is a typed flatMap: unused payload prunes out of the serializer (never enters an output row)") {
    val s = spark
    import s.implicits._
    val docs = (0L until 6L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    val warcs = WarcReader.buildFixture(docs, nShards = 2)
    val slim = WarcReader.records(warcs, "warc").select("target_uri", "http_status")
    val optimized = slim.queryExecution.optimizedPlan
    val serialized = optimized.collect {
      case so: org.apache.spark.sql.catalyst.plans.logical.SerializeFromObject =>
        so.serializer.map(_.name)
    }.flatten
    assert(serialized.nonEmpty, "expected a SerializeFromObject in the plan")
    assert(!serialized.contains("payload"),
      s"payload survived serializer pruning: $serialized")
    assert(serialized.contains("target_uri"))
    // and the full projection still round-trips the body
    val full = WarcReader.records(warcs, "warc")
      .filter($"warc_type" === "response" && $"http_status" === 200)
      .select($"payload").limit(1).collect()
    assert(new String(full.head.getAs[Array[Byte]](0), UTF_8).startsWith("<html>"))
  }
}
