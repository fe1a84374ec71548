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

import graft.logs.AccessLogSchema

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
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AccessLogScanBuilder(paths)
}

final class AccessLogScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = AccessLogSchema.schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty pruned schema (pure count) still needs row multiplicity: keep
    // zero fields and emit empty rows — GenericInternalRow(0) per line
    required = requiredSchema

  /** Filters the reader can evaluate are applied PRE-materialization (a
    * failing row never becomes an InternalRow), but every filter is also
    * returned for Spark-side re-evaluation — the reader's apply is an
    * optimization, never the only line of defense, so partial/conservative
    * evaluation (unknown → keep) is always safe.
    */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(f => AccessLogFilterEval.compile(f).isDefined)
    filters
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = new AccessLogScan(paths, required, pushed)
}

/** Driver-side listing + split planning shared by the batch and
  * micro-batch paths.
  */
private[graft] object AccessLogFiles {

  /** Streams RemoteIterator listings; hidden files AND files under hidden
    * directories (`_`/`.` prefixed path segments below the load root —
    * `_temporary`, `.staging`, Spark's convention, matched by
    * InMemoryFileIndex) are skipped. Only (path, size) pairs are held.
    */
  def list(paths: Seq[String]): Seq[(String, Long)] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val out = mutable.ArrayBuffer.empty[(String, Long)]
    paths.foreach { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val root = fs.getFileStatus(path)
      // every path segment strictly below the root must be visible
      def visibleUnderRoot(f: Path): Boolean = {
        var cur = f
        while (cur != null && cur.toString != root.getPath.toString) {
          val n = cur.getName
          if (n.startsWith("_") || n.startsWith(".")) return false
          cur = cur.getParent
        }
        cur != null
      }
      val statuses: Iterator[FileStatus] =
        if (root.isDirectory) {
          val it = fs.listFiles(path, true)
          Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        } else Iterator(root)
      statuses.foreach { st =>
        if (st.isFile && (!root.isDirectory || visibleUnderRoot(st.getPath)))
          out += ((st.getPath.toString, st.getLen))
      }
    }
    out.toSeq
  }

  def hadoopConfMap(): Map[String, String] = {
    val hc = SparkSession.active.sessionState.newHadoopConf()
    val it = hc.iterator()
    val m = mutable.Map.empty[String, String]
    while (it.hasNext) { val e = it.next(); m += (e.getKey -> e.getValue) }
    m.toMap
  }

  /** Reader factory capturing the per-query driver state (Hadoop conf,
    * session timezone, pushed filters) ONCE — the factory serializes once
    * per stage, so partitions stay paths-only instead of each dragging a
    * ~1000-entry conf map through the scheduler.
    */
  def readerFactory(required: StructType,
                    pushed: Seq[org.apache.spark.sql.sources.Filter])
      : AccessLogReaderFactory =
    AccessLogReaderFactory(required, pushed, hadoopConfMap(),
      SparkSession.active.sessionState.conf.sessionLocalTimeZone)

  /** Best-fit-decreasing bin-packing by size (compressed files count
    * whole: they can't split anyway). Bins index by REMAINING CAPACITY
    * in a TreeMap — each file lands in the fullest bin that still fits
    * (smallest remaining ≥ len) in O(log bins), so a 10⁶-key day packs
    * in n·log n driver time. The first-fit linear bin scan this
    * replaces was O(n·bins): measured 18 s for 10⁵ files across 5×10⁴
    * bins (tools.ListerBench's many-bins probe), which at the
    * reference's >1M-key regime would be a ~30-minute driver stall.
    * Ties on remaining capacity break by bin creation index —
    * deterministic packing for any input order (the input is sorted by
    * (size desc, path) first).
    */
  def binPack(files: Seq[(String, Long)]): Array[InputPartition] = {
    val maxBytes = SparkSession.active.sessionState.conf.filesMaxPartitionBytes
    val bins = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[(String, Long)]]
    // (remaining, binIdx) — ceiling lookup finds the tightest fit
    val byRemaining = new java.util.TreeMap[(Long, Int), Int](
      Ordering.Tuple2[Long, Int])
    files.sortBy { case (p, len) => (-len, p) }.foreach { case f @ (_, len) =>
      val key = byRemaining.ceilingKey((len, Int.MinValue))
      if (key == null) {
        bins += mutable.ArrayBuffer(f)
        if (maxBytes - len > 0)
          byRemaining.put((maxBytes - len, bins.size - 1), bins.size - 1)
      } else {
        val idx = byRemaining.remove(key)
        bins(idx) += f
        val rem = key._1 - len
        if (rem > 0) byRemaining.put((rem, idx), idx)
      }
    }
    bins.map(b => AccessLogInputPartition(b.map(_._1).toArray)
      : InputPartition).toArray
  }
}

final class AccessLogScan(paths: Seq[String], required: StructType,
                          pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"accesslog ${paths.mkString(",")} ReadSchema: ${required.fieldNames.mkString("[", ",", "]")}" +
      (if (pushed.isEmpty) "" else s" PushedFilters: ${pushed.mkString("[", ",", "]")}")

  private lazy val files: Seq[(String, Long)] = AccessLogFiles.list(paths)

  override def planInputPartitions(): Array[InputPartition] =
    AccessLogFiles.binPack(files)

  override def createReaderFactory(): PartitionReaderFactory =
    AccessLogFiles.readerFactory(required, pushed.toSeq)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AccessLogMicroBatchStream(paths, required)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(files.map(_._2).sum)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }
}

/** Streaming (micro-batch) ingest of a growing log directory:
  *
  * {{{ spark.readStream.format("accesslog").load(dir) }}}
  *
  * Offset model: the HIGH-WATERMARK OF FILE PATHS in lexicographic order.
  * S3 server-side access-log objects are named
  * `YYYY-MM-DD-HH-MM-SS-<id>` (FIXTURES.md §1; the reference lists them
  * by date prefix, `scripts/...:212-213`), so path order IS arrival
  * order and a name watermark is a legal, restart-stable offset: a batch
  * is the files in `(startWatermark, endWatermark]`, reprocessing after
  * a crash replans exactly the same file set, and no per-file seen-map
  * has to grow without bound (the failure mode of Spark's generic
  * FileStreamSource at millions of files). Files that appear with names
  * BELOW the watermark are ignored by design — same contract as the
  * reference's per-day prefix listing.
  */
final class AccessLogMicroBatchStream(paths: Seq[String], required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class NameWatermark(w: String) extends Offset {
    override def json(): String = w
  }

  override def initialOffset(): Offset = NameWatermark("")

  // Offsets must never regress: a transiently empty/short listing (S3
  // eventual consistency, directory momentarily recreated) would
  // otherwise move the watermark backwards and make a later trigger
  // replan — and re-emit — already-committed files.
  private var highWater: String = ""

  override def latestOffset(): Offset = {
    val fs = AccessLogFiles.list(paths)
    if (fs.nonEmpty) highWater = Ordering[String].max(highWater, fs.map(_._1).max)
    NameWatermark(highWater)
  }

  override def deserializeOffset(json: String): Offset = {
    // restart path: re-arm the monotonic guard from the checkpoint
    highWater = Ordering[String].max(highWater, json)
    NameWatermark(json)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[NameWatermark].w
    val hi = end.asInstanceOf[NameWatermark].w
    val batch = AccessLogFiles.list(paths)
      .filter { case (p, _) => p > lo && p <= hi }
    AccessLogFiles.binPack(batch)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    AccessLogFiles.readerFactory(required, Seq.empty)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class AccessLogInputPartition(files: Array[String])
    extends InputPartition

final case class AccessLogReaderFactory(required: StructType,
    pushed: Seq[org.apache.spark.sql.sources.Filter],
    conf: Map[String, String], sessionTimeZone: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AccessLogPartitionReader(partition.asInstanceOf[AccessLogInputPartition],
      required, pushed, conf, sessionTimeZone)
}

/** Streams each file line-by-line through [[LogLineTokenizer]] (fast walk
  * + regex fallback, identical capture semantics) and emits only the
  * pruned fields.
  */
final class AccessLogPartitionReader(part: AccessLogInputPartition,
                                     required: StructType,
                                     pushed: Seq[org.apache.spark.sql.sources.Filter],
                                     conf: Map[String, String],
                                     sessionTimeZone: String)
    extends PartitionReader[InternalRow] {

  private val hadoopConf = {
    val c = new Configuration(false)
    conf.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val codecs = new CompressionCodecFactory(hadoopConf)
  // canonical-name → group-extractor, computed once; the row builder walks
  // the pruned schema only. Timestamps resolve in the SESSION timezone,
  // matching what try_to_timestamp does on the text+parse path.
  private val zone = java.time.ZoneId.of(sessionTimeZone)
  private val extractors: Array[(Array[String], String) => Any] =
    required.fieldNames.map(f => AccessLogPartitionReader.extractorFor(f, zone))

  // compiled keep-predicates over the capture groups: a row failing one
  // is skipped before any InternalRow materializes
  private val keeps: Array[(Array[String], String) => Boolean] =
    pushed.flatMap(AccessLogFilterEval.compile).toArray

  private var fileIdx = -1
  private var reader: BufferedReader = _
  private var line: String = _
  private var groups: Array[String] = _

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
      else if (AccessLogPartitionReader.hasNonWhitespace(line)) {
        // blank lines dropped (reference strips + skips empties, :165-167);
        // parse here so pushed filters can reject pre-materialization
        groups = graft.logs.LogLineTokenizer.parseGroups(line)
        var keep = true
        var k = 0
        while (keep && k < keeps.length) { keep = keeps(k)(groups, line); k += 1 }
        if (keep) return true
      }
    }
    false
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](extractors.length)
    var i = 0
    while (i < vals.length) {
      vals(i) = extractors(i)(groups, line)
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}

/** Conservative reader-side evaluation of pushed-down filters over the raw
  * capture groups (sentinel/null/typed semantics applied, matching the
  * canonical projection). Unsupported filters compile to None and are left
  * entirely to Spark; supported ones ALSO remain Spark-evaluated (see
  * [[AccessLogScanBuilder.pushFilters]]), so this only ever has to be
  * sound on the rows it DROPS: a dropped row must be one the equivalent
  * Catalyst predicate would reject (null comparisons reject in SQL).
  */
private[sources] object AccessLogFilterEval {
  import org.apache.spark.sql.sources._

  private val StringCols: Map[String, (Array[String], String) => String] = {
    def plain(i: Int): (Array[String], String) => String =
      (g, _) => if (g == null) null else g(i)
    def sent(i: Int, s: String): (Array[String], String) => String =
      (g, _) => if (g == null) null else { val v = g(i); if (v == s) null else v }
    Map(
      "bucket_owner" -> plain(0), "s3_bucket" -> plain(1),
      "remote_ip" -> plain(3), "requester" -> plain(4),
      "request_id" -> plain(5), "operation" -> plain(6),
      "key" -> sent(7, "-"), "request" -> plain(8),
      "error_code" -> sent(10, "-"), "referrer" -> sent(15, "\"-\""),
      "user_agent" -> sent(16, "\"-\""), "version_id" -> sent(17, "-"),
      "error_line" -> ((g, raw) => if (g == null) raw else null))
  }

  private val NumCols: Map[String, (Array[String], String) => java.lang.Long] = {
    def num(i: Int, maxDigits: Int): (Array[String], String) => java.lang.Long =
      (g, _) => if (g == null) null
        else AccessLogPartitionReader.numOrNull(g(i), maxDigits).map(Long.box).orNull
    Map("http_status" -> num(9, 9), "bytes_sent" -> num(11, 18),
      "object_size" -> num(12, 18), "total_time" -> num(13, 18),
      "turn_around_time" -> num(14, 18))
  }

  private def toLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  def compile(f: Filter): Option[(Array[String], String) => Boolean] = f match {
    case EqualTo(c, v: String) if StringCols.contains(c) =>
      Some((g, r) => StringCols(c)(g, r) == v)
    case In(c, vs) if StringCols.contains(c) && vs.forall(_.isInstanceOf[String]) =>
      val set = vs.map(_.asInstanceOf[String]).toSet
      Some((g, r) => { val x = StringCols(c)(g, r); x != null && set.contains(x) })
    case StringStartsWith(c, p) if StringCols.contains(c) =>
      Some((g, r) => { val x = StringCols(c)(g, r); x != null && x.startsWith(p) })
    case IsNotNull(c) if StringCols.contains(c) =>
      Some((g, r) => StringCols(c)(g, r) != null)
    case IsNull(c) if StringCols.contains(c) =>
      Some((g, r) => StringCols(c)(g, r) == null)
    case IsNotNull(c) if NumCols.contains(c) =>
      Some((g, r) => NumCols(c)(g, r) != null)
    case IsNull(c) if NumCols.contains(c) =>
      Some((g, r) => NumCols(c)(g, r) == null)
    case EqualTo(c, v) if NumCols.contains(c) =>
      toLong(v).map(lv => (g, r) => { val x = NumCols(c)(g, r); x != null && x.longValue == lv })
    case GreaterThan(c, v) if NumCols.contains(c) =>
      toLong(v).map(lv => (g, r) => { val x = NumCols(c)(g, r); x != null && x.longValue > lv })
    case GreaterThanOrEqual(c, v) if NumCols.contains(c) =>
      toLong(v).map(lv => (g, r) => { val x = NumCols(c)(g, r); x != null && x.longValue >= lv })
    case LessThan(c, v) if NumCols.contains(c) =>
      toLong(v).map(lv => (g, r) => { val x = NumCols(c)(g, r); x != null && x.longValue < lv })
    case LessThanOrEqual(c, v) if NumCols.contains(c) =>
      toLong(v).map(lv => (g, r) => { val x = NumCols(c)(g, r); x != null && x.longValue <= lv })
    case _ => None
  }
}

object AccessLogPartitionReader {

  // Java regex \S semantics (the canonical path's rlike("\\S")), NOT
  // Character.isWhitespace — they disagree on U+001C..1F/U+2028/U+2029,
  // and such lines must become error_line rows, not be dropped
  private def hasNonWhitespace(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (!ws) return true
      i += 1
    }
    false
  }

  private val tsFormat = DateTimeFormatter.ofPattern("dd/MMM/yyyy:HH:mm:ss", Locale.US)

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)
  private def dashNull(s: String): UTF8String = if (s == "-") null else utf8(s)
  private def quotedDashNull(s: String): UTF8String = if (s == "\"-\"") null else utf8(s)
  /** Matches LogLineParser.dashNullAs: numeric with conservative digit cap
    * (9/18 < max-value widths) or null — never an overflow error.
    */
  private[sources] def numOrNull(s: String, maxDigits: Int): Option[Long] = {
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
    * space, second precision, resolved in the session timezone (matching
    * try_to_timestamp on the canonical path); any failure → null.
    */
  private def tsMicros(timeGroup: String, zone: java.time.ZoneId): Any = {
    val sp = timeGroup.indexOf(' ')
    if (sp < 2) return null
    try {
      val ldt = LocalDateTime.parse(timeGroup.substring(1, sp), tsFormat)
      ldt.atZone(zone).toEpochSecond * 1000000L
    } catch { case _: java.time.format.DateTimeParseException => null }
  }

  /** Group indices follow LogLineParser.Pattern order (reference `:21-25`);
    * `g` is the 18-element capture array or null for a corrupt line.
    */
  private[sources] def extractorFor(field: String, zone: java.time.ZoneId)
      : (Array[String], String) => Any =
    field match {
      case "bucket_owner"     => (g, _) => if (g == null) null else utf8(g(0))
      case "s3_bucket"        => (g, _) => if (g == null) null else utf8(g(1))
      case "request_time"     => (g, _) => if (g == null) null else tsMicros(g(2), zone)
      case "remote_ip"        => (g, _) => if (g == null) null else utf8(g(3))
      case "requester"        => (g, _) => if (g == null) null else utf8(g(4))
      case "request_id"       => (g, _) => if (g == null) null else utf8(g(5))
      case "operation"        => (g, _) => if (g == null) null else utf8(g(6))
      case "key"              => (g, _) => if (g == null) null else dashNull(g(7))
      case "request"          => (g, _) => if (g == null) null else utf8(g(8))
      case "http_status"      => (g, _) =>
        if (g == null) null else numOrNull(g(9), 9).map(_.toInt).orNull
      case "error_code"       => (g, _) => if (g == null) null else dashNull(g(10))
      case "bytes_sent"       => (g, _) =>
        if (g == null) null else numOrNull(g(11), 18).map(Long.box).orNull
      case "object_size"      => (g, _) =>
        if (g == null) null else numOrNull(g(12), 18).map(Long.box).orNull
      case "total_time"       => (g, _) =>
        if (g == null) null else numOrNull(g(13), 18).map(Long.box).orNull
      case "turn_around_time" => (g, _) =>
        if (g == null) null else numOrNull(g(14), 18).map(Long.box).orNull
      case "referrer"         => (g, _) => if (g == null) null else quotedDashNull(g(15))
      case "user_agent"       => (g, _) => if (g == null) null else quotedDashNull(g(16))
      case "version_id"       => (g, _) => if (g == null) null else dashNull(g(17))
      case "error_line"       => (g, raw) => if (g == null) utf8(raw) else null
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
}
