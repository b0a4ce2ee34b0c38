package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.{concat, lit, md5}

import graft.sources.WarcReader

/** The DSv2 `warc` table: registration, file round-trip equality with
  * the in-memory record walk, and — the point of the table — COLUMN
  * PRUNING pushed into the scan itself (plan-asserted), so a pruned
  * read never copies a block or runs a decode.
  */
class WarcTableSpec extends AnyFunSuite {

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

  private def fixtureDir(name: String): String = {
    val s = spark
    import s.implicits._
    val docs = (0L until 24L).map(i => (i, s"body text $i")).toDF("doc_id", "text")
    val dir = s"/tmp/graft_warc_spec/$name"
    WarcReader.writeBlobs(WarcReader.buildFixture(docs, nShards = 4),
      "shard", "warc", dir)
    dir
  }

  test("table read equals the in-memory record walk, field by field") {
    val s = spark
    import s.implicits._
    val docs = (0L until 24L).map(i => (i, s"body text $i")).toDF("doc_id", "text")
    val blobs = WarcReader.buildFixture(docs, nShards = 4)
    val viaFlatMap = WarcReader.records(blobs, "warc")
      .select($"warc_type", $"target_uri", $"http_status", $"content_type",
        md5($"payload").as("pmd5"), $"content_encoding", $"http_location")
      .collect().map(_.toSeq).toSet
    val dir = fixtureDir("roundtrip")
    val viaTable = s.read.format("warc").load(dir)
      .select($"warc_type", $"target_uri", $"http_status", $"content_type",
        md5($"payload").as("pmd5"), $"content_encoding", $"http_location")
      .collect().map(_.toSeq).toSet
    assert(viaTable == viaFlatMap)
    // the provenance column points at the real file
    val paths = s.read.format("warc").load(dir).select($"path")
      .distinct().collect().map(_.getString(0))
    assert(paths.length == 4 && paths.forall(_.endsWith(".warc.gz")))
  }

  test("column pruning reaches the SCAN: a two-column read's BatchScan carries only those columns") {
    val s = spark
    import s.implicits._
    val dir = fixtureDir("pruning")
    val pruned = s.read.format("warc").load(dir)
      .select($"target_uri", $"http_status")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.length == 1)
    val readFields = scans.head.scan.readSchema().fieldNames.toSet
    assert(readFields == Set("target_uri", "http_status"),
      s"scan read schema not pruned: $readFields")
    assert(!readFields.contains("payload"))
    // and the pruned read still returns correct values
    val rows = pruned.filter($"http_status" === 200).count()
    assert(rows > 0)
    // metadata-only reads prune below the HTTP gate too
    val metaOnly = s.read.format("warc").load(dir).select($"warc_type")
    val metaScan = metaOnly.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }.head
    assert(metaScan.scan.readSchema().fieldNames.toSet == Set("warc_type"))
    assert(metaOnly.filter($"warc_type" === "response").count() == 24)
  }

  test("filter pushdown: warc_type/http_status predicates are consumed by the scan, exactly; others stay post-scan") {
    val s = spark
    import s.implicits._
    val dir = fixtureDir("pushdown")
    val q = s.read.format("warc").load(dir)
      .filter($"warc_type" === "response" && $"http_status" === 200)
      .select($"target_uri", $"http_status", md5($"payload").as("pmd5"))
    // the scan itself carries both predicates (plus Catalyst's inferred
    // IsNotNulls, consumed as accept-all)...
    val scan = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[graft.sources.warc.WarcScan]
    val pushedStr = scan.pushed.map(_.toString).toSet
    assert(pushedStr.contains("EqualTo(warc_type,response)") &&
      pushedStr.contains("EqualTo(http_status,200)"),
      s"filters not pushed: $pushedStr")
    // ...and they are CONSUMED: no post-scan Filter survives
    val residualFilters = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(residualFilters.isEmpty,
      s"pushed filters still evaluated post-scan: $residualFilters")
    // exactness: equality with the (unpushed) flatMap walk
    val docs = (0L until 24L).map(i => (i, s"body text $i")).toDF("doc_id", "text")
    val want = WarcReader.records(WarcReader.buildFixture(docs, nShards = 4), "warc")
      .filter($"warc_type" === "response" && $"http_status" === 200)
      .select($"target_uri", $"http_status", md5($"payload").as("pmd5"))
      .collect().map(_.toSeq).toSet
    assert(q.collect().map(_.toSeq).toSet == want)
    // a status filter alone rejects non-HTTP records at their output
    // value 0 (the warcinfo record carries no HTTP block)
    val nonZero = s.read.format("warc").load(dir)
      .filter($"http_status" >= 200).select($"warc_type")
      .collect().map(_.getString(0)).toSet
    assert(nonZero == Set("response"))
    val zeroOnly = s.read.format("warc").load(dir)
      .filter($"http_status" < 200).select($"warc_type")
      .collect().map(_.getString(0)).toSet
    // warcinfo carries no HTTP block; request blocks have no status line
    assert(zeroOnly == Set("warcinfo", "request"))
    // a predicate the walk cannot evaluate exactly stays a post-scan
    // Filter and still answers correctly
    val like = s.read.format("warc").load(dir)
      .filter($"warc_type" === "response" && $"target_uri".contains("id=3"))
      .select($"target_uri")
    val likeScan = like.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[graft.sources.warc.WarcScan]
    assert(likeScan.pushed.map(_.toString)
      .contains("EqualTo(warc_type,response)"))
    assert(!likeScan.pushed.exists(_.toString.contains("Contains")),
      "a StringContains predicate must not be consumed by the scan")
    val likeFilters = like.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(likeFilters.nonEmpty, "residual predicate lost its Filter node")
    assert(like.count() > 0)
  }

  test("reported statistics: scan costs its file bytes, so a small archive auto-broadcasts in a join") {
    val s = spark
    import s.implicits._
    val dir = fixtureDir("stats")
    // the scan reports the listing's byte total (default compression
    // factor 1.0) — not the Long.MaxValue a stats-less DSv2 relation costs
    val q = s.read.format("warc").load(dir).select($"target_uri")
    val scan = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[graft.sources.warc.WarcScan]
    val onDisk = new java.io.File(dir).listFiles().filter(_.isFile)
      .map(_.length).sum
    val stats = scan.estimateStatistics()
    assert(stats.sizeInBytes.isPresent && stats.sizeInBytes.getAsLong == onDisk,
      s"stats ${stats.sizeInBytes} != file bytes $onDisk")
    // and the planner USES it: a join against a big side picks a
    // broadcast with the (tiny) warc relation as the build side
    val big = s.range(0, 100000L)
      .select(concat(lit("https://Site"), ($"id" % 37),
        lit(".com/p//"), $"id").as("u"))
    val joined = big.join(s.read.format("warc").load(dir)
        .filter($"warc_type" === "response").select($"target_uri"),
      $"u" === $"target_uri")
    // (string-match: AQE wraps the join in AdaptiveSparkPlanExec, which
    // TreeNode collect does not traverse into)
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin"),
      s"small warc side was not auto-broadcast:\n${planStr.take(2000)}")
  }

  test("manifest option: a warc.paths file (plain or gzipped) selects exactly its listed archives") {
    val s = spark
    import s.implicits._
    val dir = fixtureDir("manifest")
    // only the archives: a prior run's manifests may still sit in the
    // fixture dir (they are _-prefixed, so the table listing skips them)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".warc.gz"))
      .map(_.getName).sorted
    assert(files.length == 4)
    // list only the first two shards: one relative line, one absolute,
    // plus a comment and a blank line (the warc.paths conventions)
    val manifestTxt = s"# crawl manifest\n${files(0)}\n\n$dir/${files(1)}\n"
    val mf = s"$dir/_warc.paths"
    java.nio.file.Files.write(java.nio.file.Paths.get(mf),
      manifestTxt.getBytes("UTF-8"))
    val viaManifest = s.read.format("warc").option("manifest", mf).load()
      .select($"path", $"target_uri").collect()
    val wantPaths = Set(files(0), files(1)).map(f => s"file:$dir/$f")
    assert(viaManifest.map(_.getString(0)).toSet == wantPaths,
      s"manifest read wrong files: ${viaManifest.map(_.getString(0)).toSet}")
    val wantRows = s.read.format("warc").load(dir)
      .filter($"path".isin(wantPaths.toSeq: _*))
      .select($"path", $"target_uri").collect().map(_.toSeq).toSet
    assert(viaManifest.map(_.toSeq).toSet == wantRows)
    // gzipped manifest (warc.paths.gz, the published form) reads the same
    val mfGz = s"$dir/_warc.paths.gz"
    java.nio.file.Files.write(java.nio.file.Paths.get(mfGz),
      graft.sources.CompressedText.gzip(manifestTxt))
    val viaGz = s.read.format("warc").option("manifest", mfGz).load()
      .select($"path", $"target_uri").collect().map(_.toSeq).toSet
    assert(viaGz == wantRows)
    // and the reported statistics price exactly the two listed files
    val scan = s.read.format("warc").option("manifest", mf).load()
      .select($"target_uri").queryExecution.executedPlan.collect {
        case b: BatchScanExec => b
      }.head.scan.asInstanceOf[graft.sources.warc.WarcScan]
    val wantBytes = Seq(files(0), files(1))
      .map(f => new java.io.File(dir, f).length).sum
    assert(scan.estimateStatistics().sizeInBytes.getAsLong == wantBytes)
  }

  test("streaming walk: records equal the array walk, decode lazily (first record before the stream ends), and keep the well-formed prefix of a corrupt tail") {
    val s = spark
    import s.implicits._
    // incompressible text so the archive comfortably exceeds the walk's
    // 64 KB stream buffer — otherwise "lazy" is unobservable
    val docs = (0L until 24L).map { i =>
      (i, new scala.util.Random(i).alphanumeric.take(8192).mkString)
    }.toDF("doc_id", "text")
    val blob = WarcReader.buildFixture(docs, nShards = 1)
      .select($"warc").collect().head.getAs[Array[Byte]](0)
    val want = WarcReader.parse(blob).map(r =>
      (r.warcType, r.targetUri, r.httpStatus, r.payload.toSeq))
    // equality with the array walk
    val got = WarcReader.streamRecords(
      new java.io.ByteArrayInputStream(blob), needHttp = true,
      needPayload = true).toSeq.map(r =>
      (r.warcType, r.targetUri, r.httpStatus, r.payload.toSeq))
    assert(got == want && want.size == 49) // warcinfo + 24 x (request+response)
    // LAZINESS: serving the first record must not consume the archive —
    // the bounded-memory claim, observed at the stream
    var consumed = 0L
    val counting = new java.io.InputStream {
      val in = new java.io.ByteArrayInputStream(blob)
      override def read(): Int = { val b = in.read(); if (b >= 0) consumed += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = in.read(b, off, len); if (n > 0) consumed += n; n }
    }
    val it = WarcReader.streamRecords(counting, needHttp = true, needPayload = true)
    assert(it.hasNext); it.next()
    assert(consumed < blob.length,
      s"first record consumed the whole archive ($consumed of ${blob.length})")
    // corrupt tail: flip a byte mid-archive — every member before it
    // survives, the walk never throws
    val bad = blob.clone()
    bad(blob.length / 2) = (bad(blob.length / 2) ^ 0x5a).toByte
    val prefix = WarcReader.streamRecords(
      new java.io.ByteArrayInputStream(bad), needHttp = true,
      needPayload = true).toSeq
    assert(prefix.nonEmpty && prefix.size < want.size)
    assert(prefix.map(r => (r.warcType, r.targetUri, r.httpStatus,
      r.payload.toSeq)) == want.take(prefix.size))
  }

  test("pruned reads still compute their gated fields correctly (head-only parse)") {
    val s = spark
    import s.implicits._
    val dir = fixtureDir("gates")
    val full = s.read.format("warc").load(dir)
      .filter($"warc_type" === "response")
      .select($"target_uri", $"http_status", $"content_type", $"http_location")
      .collect().map(_.toSeq).toSet
    // same columns via the flatMap walk (which always full-parses)
    val docs = (0L until 24L).map(i => (i, s"body text $i")).toDF("doc_id", "text")
    val want = WarcReader.records(WarcReader.buildFixture(docs, nShards = 4), "warc")
      .filter($"warc_type" === "response")
      .select($"target_uri", $"http_status", $"content_type", $"http_location")
      .collect().map(_.toSeq).toSet
    assert(full == want)
  }

  private def warcScansOf(df: org.apache.spark.sql.DataFrame)
      : Seq[graft.sources.warc.WarcScan] = {
    // AQE hides the inner plan from collect — unwrap it
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    plan.collect {
      case b: BatchScanExec if b.scan.isInstanceOf[graft.sources.warc.WarcScan] =>
        b.scan.asInstanceOf[graft.sources.warc.WarcScan]
    }
  }

  test("round 16: the reads the migrated queries build (q279/q292/q301/q302) " +
      "prune their read schema and push their type gates") {
    val s = spark
    import s.implicits._
    val dir = fixtureDir("migrated")
    val tbl = s.read.format("warc").load(dir)
    // q292's read: everything but warcinfo, (type, digest, payload length)
    val q292read = tbl.filter($"warc_type" =!= "warcinfo")
      .select($"warc_type", $"payload_digest",
        org.apache.spark.sql.functions.length($"payload").as("payload_len"))
    val s292 = warcScansOf(q292read)
    assert(s292.nonEmpty &&
      s292.head.readSchema().fieldNames.toSet ==
        Set("warc_type", "payload_digest", "payload"),
      s"q292 read schema: ${s292.map(_.readSchema().fieldNames.toSeq)}")
    // q301's read: responses only, redirect metadata + payload for the
    // meta-refresh probe — digest/encoding never read, type gate pushed
    val q301read = tbl.filter($"warc_type" === "response")
      .select($"target_uri", $"http_status", $"http_location", $"payload",
        $"content_type")
    val s301 = warcScansOf(q301read)
    val r301 = s301.head.readSchema().fieldNames.toSet
    assert(!r301.contains("payload_digest") && !r301.contains("content_encoding"),
      s"q301 read schema leaks: $r301")
    assert(s301.head.pushed.map(_.toString)
      .exists(_.contains("EqualTo(warc_type,response)")))
    // q302's read (no checkpoint in the query — assert the registry plan)
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val s302 = warcScansOf(SparkEntry.queries("q302_encoding_census")(s, sfDir))
    assert(s302.nonEmpty, "q302 no longer reads through the warc table")
    val r302 = s302.head.readSchema().fieldNames.toSet
    assert(!r302.contains("target_uri") && !r302.contains("http_location"),
      s"q302 read schema leaks: $r302")
    assert(s302.head.pushed.map(_.toString)
      .exists(_.contains("EqualTo(warc_type,response)")))
    // q279's WET re-read is a fresh table scan in the registry plan:
    // conversion gate pushed, encoding/digest never read
    val s279 = warcScansOf(SparkEntry.queries("q279_wet_conversion")(s, sfDir))
    assert(s279.nonEmpty, "q279 no longer re-reads WET through the warc table")
    val r279 = s279.head.readSchema().fieldNames.toSet
    assert(!r279.contains("content_encoding") && !r279.contains("payload_digest"),
      s"q279 read schema leaks: $r279")
    assert(s279.head.pushed.map(_.toString)
      .exists(_.contains("EqualTo(warc_type,conversion)")))
  }
}
