package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.md5

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
