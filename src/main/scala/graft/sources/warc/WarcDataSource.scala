package graft.sources.warc

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo,
  EqualNullSafe, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull,
  LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.WarcReader

/** `spark.read.format("warc").load(dir)` — the WARC record walk as a
  * DataSourceV2 TABLE, closing the round-13/14 carry-over: with the
  * `flatMap`-based [[graft.sources.WarcReader.records]], serializer
  * pruning keeps payload bytes out of OUTPUT rows, but the walk itself
  * still decoded every record; as a DSv2 scan, Catalyst pushes the
  * REQUIRED COLUMNS into the reader (`SupportsPushDownRequiredColumns`),
  * so a `select(target_uri, http_status)` never copies a block, never
  * dechunks, never inflates a content coding — the walk reads WARC
  * headers, parses the HTTP head in place, and JUMPS over the body
  * bytes ([[graft.sources.WarcReader.parseWith]]'s `needHttp` /
  * `needPayload` gates; `content_encoding` implies the payload gate
  * because its `;undecoded` flag only exists by attempting the decode).
  * FILTERS push the same way (`SupportsPushDownFilters`, round 15):
  * `warc_type` / `http_status` predicates compile to record-level gates
  * ([[WarcFilters]]) evaluated inside the walk — a rejected record's
  * block is jumped before any copy or decode — and are CONSUMED (no
  * residual Filter node), with an equality-vs-flatMap spec pinning the
  * exactness.
  *
  * Scale shape: one InputPartition per `.warc.gz` FILE — WARC's gzip
  * members are not splittable without a side index, and the archive
  * convention (Common Crawl: ~1 GB files, `warc.paths` manifests) is
  * built around file-level parallelism. The walk STREAMS: members
  * decode lazily one at a time ([[graft.sources.WarcReader.streamRecords]]),
  * so a task's peak memory is O(largest member) — one record — never
  * O(archive); malformed members/records skip, never crash.
  *
  * Input is a directory/file path (`load(dir)`) or a Common-Crawl-style
  * manifest (`.option("manifest", "…/warc.paths[.gz]").load()` — one
  * archive path per line, relative lines resolving against the
  * manifest's directory), the convention real crawl snapshots are
  * distributed under.
  *
  * Registered under the short name `warc` via DataSourceRegister
  * (META-INF/services), like any production connector.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    val manifest = properties.get("manifest")
    require((path != null && path.nonEmpty) ||
        (manifest != null && manifest.nonEmpty),
      "the warc source needs a path (spark.read.format(\"warc\").load(dir)) " +
        "or a manifest (.option(\"manifest\", warcPathsFile).load())")
    new WarcTable(Option(path).filter(_.nonEmpty),
      Option(manifest).filter(_.nonEmpty))
  }
}

object WarcTable {
  /** `path` (file provenance, like binaryFile's) + the same nine record
    * columns [[graft.sources.WarcReader.records]] emits.
    */
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = false),
    StructField("warc_content_type", StringType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("payload_digest", StringType, nullable = false),
    StructField("content_encoding", StringType, nullable = false),
    StructField("http_location", StringType, nullable = false)))
}

class WarcTable(path: Option[String], manifest: Option[String])
    extends Table with SupportsRead {
  override def name(): String =
    s"warc:${path.getOrElse("")}${manifest.map(m => s" manifest=$m").getOrElse("")}"
  override def schema(): StructType = WarcTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(path, manifest)
}

/** V1 `Filter` → record-walk gate compiler. Only filters the walk can
  * evaluate EXACTLY are consumed (reported pushed, NOT returned as
  * residual — Catalyst drops them from the post-scan Filter, so the
  * compiled gate IS the filter's only evaluation): equality/IN on
  * `warc_type`, comparisons/IN on `http_status`, and `IsNotNull` on any
  * schema column (every column is non-null by construction, so it
  * compiles to accept-all). Everything else — URI prefixes, payload
  * predicates — stays a post-scan Filter untouched. The 100 TB case
  * this exists for: `warc_type = 'response'` skips the block work of
  * the request/metadata records that make up roughly two thirds of a
  * Common-Crawl-convention archive, and a status filter skips payload
  * copy + dechunk + content-decode for every non-matching response
  * ([[graft.sources.WarcReader.WarcGates]] documents where each gate
  * runs inside the walk).
  */
private[warc] object WarcFilters {
  sealed trait Gate
  final case class TypeGate(f: String => Boolean) extends Gate
  final case class StatusGate(f: Int => Boolean) extends Gate
  case object TrueGate extends Gate

  def compile(f: Filter): Option[Gate] = f match {
    case IsNotNull(a) if WarcTable.Schema.fieldNames.contains(a) =>
      Some(TrueGate) // all columns non-null by construction
    case EqualTo("warc_type", v: String) => Some(TypeGate(_ == v))
    case EqualNullSafe("warc_type", v: String) => Some(TypeGate(_ == v))
    case In("warc_type", vs) if vs != null =>
      // a null / non-string literal can never equal the non-null string
      // column, so dropping it from the set is the exact semantics
      val set = vs.collect { case s: String => s }.toSet
      Some(TypeGate(set.contains))
    case EqualTo("http_status", v: Int) => Some(StatusGate(_ == v))
    case EqualNullSafe("http_status", v: Int) => Some(StatusGate(_ == v))
    case In("http_status", vs) if vs != null =>
      val set = vs.collect { case i: Int => i }.toSet
      Some(StatusGate(set.contains))
    case GreaterThan("http_status", v: Int) => Some(StatusGate(_ > v))
    case GreaterThanOrEqual("http_status", v: Int) => Some(StatusGate(_ >= v))
    case LessThan("http_status", v: Int) => Some(StatusGate(_ < v))
    case LessThanOrEqual("http_status", v: Int) => Some(StatusGate(_ <= v))
    case _ => None
  }

  /** Conjunction of every compiled gate (driver-side; the resulting
    * closures ship to executors inside the reader factory).
    */
  def gates(filters: Array[Filter]): WarcReader.WarcGates = {
    val compiled = filters.flatMap(compile)
    val typeFs = compiled.collect { case TypeGate(g) => g }
    val statusFs = compiled.collect { case StatusGate(g) => g }
    WarcReader.WarcGates(
      typeOk = if (typeFs.isEmpty) _ => true else t => typeFs.forall(_(t)),
      statusOk =
        if (statusFs.isEmpty) None else Some(s => statusFs.forall(_(s))))
  }
}

/** Column pruning and filter pushdown land HERE: Catalyst hands the
  * post-pruning schema to `pruneColumns` and the predicate conjuncts to
  * `pushFilters`; the reader factory derives its decode gates from
  * exactly that field set and the compiled record gates from exactly
  * the consumed filters.
  */
class WarcScanBuilder(path: Option[String], manifest: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = WarcTable.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // an empty projection (count(*)) still needs one column to walk rows
    required =
      if (requiredSchema.isEmpty) StructType(WarcTable.Schema.take(2))
      else requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(f => WarcFilters.compile(f).isDefined)
    pushed = sup
    residual // post-scan evaluation only for what the walk can't do exactly
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new WarcScan(path, manifest, required, pushed)
}

class WarcScan(path: Option[String], manifest: Option[String],
    required: StructType, val pushed: Array[Filter] = Array.empty)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"warc ${path.getOrElse("")}" +
      manifest.map(m => s" manifest=$m").getOrElse("") +
      s" required=[${required.fieldNames.mkString(",")}] " +
      s"pushed=[${pushed.mkString(",")}]"

  /** Driver-side file listing under the session's Hadoop conf (listed
    * once per scan, shared by partition planning and statistics).
    * With a `manifest` option the listing is the MANIFEST's lines — the
    * Common Crawl distribution convention (`warc.paths`, optionally
    * gzipped: one archive path per line; blank lines and `#` comments
    * skipped; relative lines resolve against the manifest's own
    * directory, so a mirrored `warc.paths` next to its `crawl-data/`
    * tree reads verbatim) — which also prices the scan's statistics
    * without listing remote directories.
    */
  private lazy val fileStatuses: Seq[org.apache.hadoop.fs.FileStatus] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    manifest match {
      case Some(mf) =>
        val mp = new HPath(mf)
        val mfs = mp.getFileSystem(conf)
        val raw = {
          val st = mfs.open(mp)
          try st.readAllBytes() finally st.close()
        }
        val bytes =
          if (mf.endsWith(".gz"))
            graft.sources.CompressedText.gunzipBytes(raw).getOrElse(
              throw new IllegalArgumentException(s"corrupt gzip manifest: $mf"))
          else raw
        val base = mp.getParent
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").iterator.map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#"))
          .map { line =>
            val p = new HPath(line)
            val resolved = if (p.isAbsolute || line.contains("://")) p
              else new HPath(base, line)
            resolved.getFileSystem(conf).getFileStatus(resolved)
          }
          .toSeq.sortBy(_.getPath.toString)
      case None =>
        val p = new HPath(path.getOrElse(
          throw new IllegalArgumentException("warc: no path and no manifest")))
        val fs = p.getFileSystem(conf)
        val files =
          if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
          else Seq(fs.getFileStatus(p))
        files.filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
            !s.getPath.getName.startsWith("_"))
          .sortBy(_.getPath.toString)
    }
  }

  /** One partition per file (members aren't splittable — see class doc). */
  override def planInputPartitions(): Array[InputPartition] =
    fileStatuses.map(s => WarcInputPartition(s.getPath.toString): InputPartition)
      .toArray

  /** Without reported statistics a DSv2 relation costs
    * `spark.sql.defaultSizeInBytes` (Long.MaxValue) — a small archive
    * joined against anything can then never be auto-broadcast and always
    * pays a shuffle. Report the listing's byte total scaled by
    * `spark.sql.sources.fileCompressionFactor` (the same knob Spark's
    * own file sources apply to compressed inputs — gzip'd WARC members
    * inflate well beyond 1x, so deployments reading archive manifests
    * should raise it); row count stays unknown (records per member vary).
    */
  override def estimateStatistics(): Statistics = {
    val factor =
      try SparkSession.active.sessionState.conf.fileCompressionFactor
      catch { case scala.util.control.NonFatal(_) => 1.0 }
    val bytes = (fileStatuses.map(_.getLen).sum * factor).toLong
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required.fieldNames, WarcFilters.gates(pushed))
}

case class WarcInputPartition(file: String) extends InputPartition

case class WarcReaderFactory(fieldNames: Array[String],
    gates: WarcReader.WarcGates) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcInputPartition].file, fieldNames, gates)
}

class WarcPartitionReader(file: String, fieldNames: Array[String],
    gates: WarcReader.WarcGates) extends PartitionReader[InternalRow] {

  // the decode gates: payload (or the census column, whose ;undecoded
  // flag requires the decode attempt) → full block work; the three HTTP
  // head columns → head-only parse; neither → header walk + block jump
  private val needPayload =
    fieldNames.contains("payload") || fieldNames.contains("content_encoding")
  private val needHttp = needPayload || fieldNames.contains("http_status") ||
    fieldNames.contains("content_type") || fieldNames.contains("http_location")

  private var in: java.io.InputStream = _

  private lazy val records: Iterator[WarcReader.WarcRecord] = {
    val p = new HPath(file)
    // executor-side: default Hadoop conf resolves the same local/DFS
    // paths the driver listed (fixture scope is the local FS; a
    // deployment ships its conf via spark.hadoop.* properties, which
    // the default constructor picks up from core-site.xml)
    val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
    in = fs.open(p)
    // STREAMING walk (round 15): members decode lazily, so task memory
    // is O(largest member) — a multi-GB archive never materializes
    // (the previous shape read the whole file AND parsed every record
    // into one Seq before the first row was served)
    WarcReader.streamRecords(in, needHttp, needPayload, gates)
  }

  private var cur: WarcReader.WarcRecord = _

  override def next(): Boolean =
    if (records.hasNext) { cur = records.next(); true } else false

  override def get(): InternalRow =
    InternalRow.fromSeq(fieldNames.toSeq.map {
      case "path" => UTF8String.fromString(file)
      case "warc_type" => UTF8String.fromString(cur.warcType)
      case "target_uri" => UTF8String.fromString(cur.targetUri)
      case "warc_content_type" => UTF8String.fromString(cur.warcContentType)
      case "http_status" => cur.httpStatus
      case "content_type" => UTF8String.fromString(cur.httpContentType)
      case "payload" => cur.payload
      case "payload_digest" => UTF8String.fromString(cur.payloadDigest)
      case "content_encoding" => UTF8String.fromString(cur.contentEncoding)
      case "http_location" => UTF8String.fromString(cur.httpLocation)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })

  override def close(): Unit = if (in != null) in.close()
}
