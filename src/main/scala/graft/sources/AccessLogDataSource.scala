package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.Locale

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.logs.{AccessLogSchema, LogLineParser}

/** DataSource V2 provider for raw S3 server-side access logs:
  *
  * {{{ spark.read.format("accesslog").load(dir) }}}
  *
  * yields the canonical 19-column frame of `AccessLogSchema` directly from
  * raw log text — the reference's read-then-parse two-step
  * (`scripts/oss_s3_server_side_logging_compacter.py:154-171,214-218`)
  * collapsed into ONE Spark scan node, so the parse participates in
  * Catalyst planning instead of running above it:
  *
  *  - '''column pruning''' reaches the parser ([[SupportsPushDownRequiredColumns]]):
  *    `select(operation)` materializes one field per line, not 19 — the
  *    slides' "19 columns stored, ~7 referenced" observation applied to the
  *    RAW-text path, which the reference could never prune;
  *  - '''size-balanced splits''': files are first-fit bin-packed into
  *    partitions capped at `spark.sql.files.maxPartitionBytes` (many tiny
  *    log objects per task, big objects alone), the same strategy Spark's
  *    own `FilePartition` uses — at 100 TB this is what keeps a million
  *    small S3 objects from becoming a million tasks;
  *  - '''driver memory''': listing streams through `RemoteIterator`
  *    (pagination, slides "Clue #3") — only (path, size) pairs are held;
  *  - semantics are bit-identical to [[LogLineParser.parse]] over
  *    `spark.read.text` (PERMISSIVE `error_line`, sentinel nulls, naive-UTC
  *    second-precision timestamps) — asserted cross-path in the spec.
  *
  * Registered as short name `accesslog` via META-INF/services.
  */
final class AccessLogDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "accesslog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AccessLogSchema.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new AccessLogTable(AccessLogDataSource.paths(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object AccessLogDataSource {
  /** `load(path)` puts a single `path`; `load(p1, p2, …)` a JSON-array
    * `paths`. Both may appear together.
    */
  private[sources] def paths(props: java.util.Map[String, String]): Seq[String] = {
    val one = Option(props.get("path")).toSeq
    val many = Option(props.get("paths")).toSeq.flatMap { json =>
      // the value is produced by Spark itself (JacksonGenerator over
      // Array[String]) — a flat array of strings, no nesting
      org.json4s.jackson.JsonMethods.parse(json) match {
        case org.json4s.JArray(vs) => vs.collect { case org.json4s.JString(s) => s }
        case _ => Seq.empty
      }
    }
    val all = one ++ many
    require(all.nonEmpty, "accesslog source requires a path")
    all
  }
}

final class AccessLogTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"accesslog(${paths.mkString(",")})"
  override def schema(): StructType = AccessLogSchema.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AccessLogScanBuilder(paths)
}

final class AccessLogScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = AccessLogSchema.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty pruned schema (pure count) still needs row multiplicity: keep
    // zero fields and emit empty rows — GenericInternalRow(0) per line
    required = requiredSchema

  override def build(): Scan = new AccessLogScan(paths, required)
}

final class AccessLogScan(paths: Seq[String], required: StructType)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"accesslog ${paths.mkString(",")} ReadSchema: ${required.fieldNames.mkString("[", ",", "]")}"

  /** Driver-side listing + bin-packing; hidden files (`_`/`.` prefixes,
    * Spark convention) skipped.
    */
  private lazy val files: Seq[(String, Long)] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val out = mutable.ArrayBuffer.empty[(String, Long)]
    paths.foreach { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val statuses: Iterator[FileStatus] =
        if (fs.getFileStatus(path).isDirectory) {
          val it = fs.listFiles(path, true)
          Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        } else Iterator(fs.getFileStatus(path))
      statuses.foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith("."))
          out += ((st.getPath.toString, st.getLen))
      }
    }
    out.toSeq
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val confMap = {
      val hc = spark.sessionState.newHadoopConf()
      val it = hc.iterator()
      val m = mutable.Map.empty[String, String]
      while (it.hasNext) { val e = it.next(); m += (e.getKey -> e.getValue) }
      m.toMap
    }
    // first-fit-decreasing bin-packing by size (compressed files count
    // whole: they can't split anyway)
    val bins = mutable.ArrayBuffer.empty[(mutable.ArrayBuffer[(String, Long)], Long)]
    files.sortBy(-_._2).foreach { case f @ (_, len) =>
      bins.indexWhere(_._2 + len <= maxBytes) match {
        case -1 => bins += ((mutable.ArrayBuffer(f), len))
        case i => val (b, tot) = bins(i); b += f; bins(i) = (b, tot + len)
      }
    }
    if (bins.isEmpty) Array.empty
    else bins.map(b => AccessLogInputPartition(b._1.map(_._1).toArray, confMap)
      : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    AccessLogReaderFactory(required)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(files.map(_._2).sum)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }
}

final case class AccessLogInputPartition(files: Array[String],
                                         conf: Map[String, String])
    extends InputPartition

final case class AccessLogReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AccessLogPartitionReader(partition.asInstanceOf[AccessLogInputPartition], required)
}

/** Streams each file line-by-line through the compiled reference regex and
  * emits only the pruned fields. One compiled Pattern + one Matcher reused
  * across all lines of the partition.
  */
final class AccessLogPartitionReader(part: AccessLogInputPartition,
                                     required: StructType)
    extends PartitionReader[InternalRow] {

  private val hadoopConf = {
    val c = new Configuration(false)
    part.conf.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val codecs = new CompressionCodecFactory(hadoopConf)
  private val pattern = java.util.regex.Pattern.compile(LogLineParser.Pattern)
  private val matcher = pattern.matcher("")
  // canonical-name → group-extractor, computed once; the row builder walks
  // the pruned schema only
  private val extractors: Array[(java.util.regex.Matcher, String) => Any] =
    required.fieldNames.map(AccessLogPartitionReader.extractorFor)

  private var fileIdx = -1
  private var reader: BufferedReader = _
  private var line: String = _

  private def nextReader(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    fileIdx += 1
    if (fileIdx >= part.files.length) false
    else {
      val path = new Path(part.files(fileIdx))
      val fs = path.getFileSystem(hadoopConf)
      val raw = fs.open(path)
      val in = Option(codecs.getCodec(path))
        .map(_.createInputStream(raw).asInstanceOf[java.io.InputStream])
        .getOrElse(raw)
      reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      true
    }
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !nextReader()) return false
      line = reader.readLine()
      if (line == null) { reader.close(); reader = null }
      else if (AccessLogPartitionReader.hasNonWhitespace(line)) return true
      // blank lines dropped (reference strips + skips empties, :165-167)
    }
    false
  }

  override def get(): InternalRow = {
    val m = matcher.reset(line)
    val matched = m.find()
    val vals = new Array[Any](extractors.length)
    var i = 0
    while (i < vals.length) {
      vals(i) = extractors(i)(if (matched) m else null, line)
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}

object AccessLogPartitionReader {

  private def hasNonWhitespace(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (!Character.isWhitespace(s.charAt(i))) return true; i += 1 }
    false
  }

  private val tsFormat = DateTimeFormatter.ofPattern("dd/MMM/yyyy:HH:mm:ss", Locale.US)

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)
  private def dashNull(s: String): UTF8String = if (s == "-") null else utf8(s)
  private def quotedDashNull(s: String): UTF8String = if (s == "\"-\"") null else utf8(s)
  /** Matches LogLineParser.dashNullAs: numeric with conservative digit cap
    * (9/18 < max-value widths) or null — never an overflow error.
    */
  private def numOrNull(s: String, maxDigits: Int): Option[Long] = {
    var i = 0
    val neg = s.nonEmpty && s.charAt(0) == '-'
    if (neg) i = 1
    val digits = s.length - i
    if (digits < 1 || digits > maxDigits) return None
    var v = 0L
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return None
      v = v * 10 + (c - '0'); i += 1
    }
    Some(if (neg) -v else v)
  }
  /** Reference time munging (`:37-42`): text between '[' and the first
    * space, second-precision naive UTC; any failure → null.
    */
  private def tsMicros(timeGroup: String): Any = {
    val sp = timeGroup.indexOf(' ')
    if (sp < 2) return null
    try {
      val ldt = LocalDateTime.parse(timeGroup.substring(1, sp), tsFormat)
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    } catch { case _: java.time.format.DateTimeParseException => null }
  }

  /** Group numbers follow LogLineParser.Pattern order (reference `:21-25`). */
  private[sources] def extractorFor(field: String): (java.util.regex.Matcher, String) => Any =
    field match {
      case "bucket_owner"     => (m, _) => if (m == null) null else utf8(m.group(1))
      case "s3_bucket"        => (m, _) => if (m == null) null else utf8(m.group(2))
      case "request_time"     => (m, _) => if (m == null) null else tsMicros(m.group(3))
      case "remote_ip"        => (m, _) => if (m == null) null else utf8(m.group(4))
      case "requester"        => (m, _) => if (m == null) null else utf8(m.group(5))
      case "request_id"       => (m, _) => if (m == null) null else utf8(m.group(6))
      case "operation"        => (m, _) => if (m == null) null else utf8(m.group(7))
      case "key"              => (m, _) => if (m == null) null else dashNull(m.group(8))
      case "request"          => (m, _) => if (m == null) null else utf8(m.group(9))
      case "http_status"      => (m, _) =>
        if (m == null) null else numOrNull(m.group(10), 9).map(_.toInt).orNull
      case "error_code"       => (m, _) => if (m == null) null else dashNull(m.group(11))
      case "bytes_sent"       => (m, _) =>
        if (m == null) null else numOrNull(m.group(12), 18).map(Long.box).orNull
      case "object_size"      => (m, _) =>
        if (m == null) null else numOrNull(m.group(13), 18).map(Long.box).orNull
      case "total_time"       => (m, _) =>
        if (m == null) null else numOrNull(m.group(14), 18).map(Long.box).orNull
      case "turn_around_time" => (m, _) =>
        if (m == null) null else numOrNull(m.group(15), 18).map(Long.box).orNull
      case "referrer"         => (m, _) => if (m == null) null else quotedDashNull(m.group(16))
      case "user_agent"       => (m, _) => if (m == null) null else quotedDashNull(m.group(17))
      case "version_id"       => (m, _) => if (m == null) null else dashNull(m.group(18))
      case "error_line"       => (m, raw) => if (m == null) utf8(raw) else null
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
}
