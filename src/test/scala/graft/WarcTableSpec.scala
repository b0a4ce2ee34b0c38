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
}
