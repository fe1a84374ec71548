package graft.ext

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Archive container formats a crawl pipeline meets before any document
  * exists: tar bundles (dataset drops, wikis, code dumps) and gzip
  * members (every WARC/WET file on disk is gzip-framed). Both parsers
  * are real byte-level implementations of the public specs (POSIX ustar
  * / RFC 1952) over binary columns — per-row `mapPartitions` kernels,
  * embarrassingly parallel, no shuffle, the image-codec execution shape.
  */
object Archives {

  // ------------------------------------------------------------- tar

  final case class TarMember(
      archive_id: Long, member_index: Int, name: String,
      size: Long, type_flag: String)

  /** Parse a POSIX ustar octal field: ASCII octal digits, space/NUL
    * terminated.
    */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end) {
      val c = b(i) & 0xFF
      if (c >= '0' && c <= '7') v = v * 8 + (c - '0')
      else if (c != ' ' && c != 0)
        throw new IllegalArgumentException(
          s"bad octal byte $c in tar header field at $off")
      i += 1
    }
    v
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, StandardCharsets.US_ASCII)
  }

  /** List the members of one tar archive: 512-byte headers, payloads
    * rounded up to block size, terminated by two zero blocks (or EOF).
    * Truncated headers/payloads fail loudly by name.
    */
  def listTar(archiveId: Long, data: Array[Byte]): Seq[TarMember] = {
    val out = Seq.newBuilder[TarMember]
    var off = 0
    var idx = 0
    while (off + 512 <= data.length) {
      if ((off until off + 512).forall(data(_) == 0)) return out.result()
      val name = cstr(data, off, 100)
      val size = octal(data, off + 124, 11)
      val typeFlag = (data(off + 156) & 0xFF) match {
        case 0 | '0' => "file"
        case '5' => "dir"
        case '2' => "symlink"
        case c => c.toChar.toString
      }
      val blocks = ((size + 511) / 512).toInt
      require(off + 512 + blocks * 512L <= data.length,
        s"tar member '$name' truncated: needs $size payload bytes")
      out += TarMember(archiveId, idx, name, size, typeFlag)
      off += 512 + blocks * 512
      idx += 1
    }
    require(off == data.length || (off until data.length).forall(data(_) == 0),
      "tar archive ends mid-header")
    out.result()
  }

  /** Build a minimal ustar archive from (name, payload) members. */
  def makeTar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, payload) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes(StandardCharsets.US_ASCII)
      require(nb.length <= 100, s"tar name too long: $name")
      System.arraycopy(nb, 0, h, 0, nb.length)
      def oct(off: Int, len: Int, v: Long): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes(StandardCharsets.US_ASCII), 0,
          h, off, len - 1)
      }
      oct(100, 8, 420) // mode 0644
      oct(108, 8, 0); oct(116, 8, 0) // uid/gid
      oct(124, 12, payload.length.toLong)
      oct(136, 12, 0) // mtime
      h(156) = '0' // regular file
      System.arraycopy("ustar".getBytes(StandardCharsets.US_ASCII), 0,
        h, 257, 5)
      // checksum: header with the checksum field itself as spaces
      (148 until 156).foreach(h(_) = ' ')
      val sum = h.map(_ & 0xFF).sum
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = ("0" * (6 - cs.length)) + cs
      System.arraycopy(csPad.getBytes(StandardCharsets.US_ASCII), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(payload)
      val pad = (512 - payload.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // end-of-archive
    out.toByteArray
  }

  /** Lift (id, tar_bytes) into one row per member. */
  def tarMembers(df: DataFrame, idCol: String,
                 dataCol: String): Dataset[TarMember] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(dataCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => listTar(id, bytes) }
  }

  // ------------------------------------------------------------ gzip

  final case class GzipInfo(
      record_id: Long, compressed_bytes: Long, decompressed_bytes: Long,
      decompressed_sha256: String)

  /** Compress with a deterministic Deflater setup (level 6, default
    * strategy) and standard gzip framing via JDK GZIPOutputStream.
    */
  def gzip(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(payload); gz.close()
    bos.toByteArray
  }

  /** Parse + inflate one gzip member: magic/method checked by name, the
    * stream inflated through GZIPInputStream (CRC32 + ISIZE verified by
    * the JDK), and the payload digested for external comparison.
    */
  def gunzipInfo(recordId: Long, data: Array[Byte]): GzipInfo = {
    require(data.length >= 18 &&
      (data(0) & 0xFF) == 0x1F && (data(1) & 0xFF) == 0x8B,
      "not a gzip member (bad magic)")
    require((data(2) & 0xFF) == 8, s"unsupported gzip method ${data(2)}")
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(data))
    val out = new java.io.ByteArrayOutputStream(data.length * 3)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    val payload = out.toByteArray
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val sha = md.digest(payload).map(b => f"${b & 0xFF}%02x").mkString
    GzipInfo(recordId, data.length.toLong, payload.length.toLong, sha)
  }

  /** Lift (id, gzip_bytes) into parsed member info. */
  def gzipInfos(df: DataFrame, idCol: String,
                dataCol: String): Dataset[GzipInfo] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(dataCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => gunzipInfo(id, bytes) })
  }

  // ------------------------------------------------------------ zstd

  /** Zstandard frame compress (zstd-jni, on the Spark classpath — Spark
    * itself ships it for shuffle/parquet codecs). Level 3 is the zstd
    * default; the simple-API path writes the frame content size into the
    * header, which [[unzstdInfo]] relies on to pre-size the output.
    */
  def zstd(payload: Array[Byte], level: Int = 3): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(payload, level)

  /** Parse + decompress one zstd frame: magic checked by name, content
    * size read from the frame header (frames without it — streaming
    * writers — fail loudly rather than guess a buffer), payload digested
    * for external comparison. Same info shape as [[gunzipInfo]] so the
    * two codecs are interchangeable downstream.
    */
  def unzstdInfo(recordId: Long, data: Array[Byte]): GzipInfo = {
    require(data.length >= 4 &&
      (data(0) & 0xFF) == 0x28 && (data(1) & 0xFF) == 0xB5 &&
      (data(2) & 0xFF) == 0x2F && (data(3) & 0xFF) == 0xFD,
      "not a zstd frame (bad magic)")
    val size = com.github.luben.zstd.Zstd.getFrameContentSize(data)
    require(size >= 0, s"zstd frame lacks a content-size header ($size)")
    require(size <= Int.MaxValue, s"zstd frame too large ($size bytes)")
    val payload = com.github.luben.zstd.Zstd.decompress(data, size.toInt)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val sha = md.digest(payload).map(b => f"${b & 0xFF}%02x").mkString
    GzipInfo(recordId, data.length.toLong, payload.length.toLong, sha)
  }

  /** Lift (id, zstd_bytes) into parsed member info. */
  def zstdInfos(df: DataFrame, idCol: String,
                dataCol: String): Dataset[GzipInfo] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(dataCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => unzstdInfo(id, bytes) })
  }

  // ------------------------------------- content-defined chunking (CDC)

  /** One content-defined chunk of a binary payload. */
  final case class CdcChunk(record_id: Long, chunk_index: Int,
                            offset: Long, length: Int, digest: String)

  /** Deterministic gear table: SplitMix64 over the byte value — a fixed
    * public constant table, identical on every JVM.
    */
  private[ext] val Gear: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong * 0x9E3779B97F4A7C15L + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Content-defined chunk boundaries (FastCDC-shaped gear hash): cut
    * where the rolling hash masks to zero, subject to [minSize,
    * maxSize]. Returns cut END offsets including the final partial
    * chunk.
    */
  private[ext] def cdcBoundaries(data: Array[Byte], minSize: Int,
                                 avgSize: Int, maxSize: Int): Seq[Int] = {
    val maskBits = 63 - java.lang.Long.numberOfLeadingZeros(avgSize.toLong)
    val mask = (1L << maskBits) - 1
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    while (start < data.length) {
      var h = 0L
      var i = start
      var cut = -1
      val hardEnd = math.min(start + maxSize, data.length)
      while (i < hardEnd && cut < 0) {
        h = (h << 1) + Gear(data(i) & 0xFF)
        if (i - start + 1 >= minSize && (h & mask) == 0L) cut = i + 1
        i += 1
      }
      val end = if (cut > 0) cut else hardEnd
      cuts += end
      start = end
    }
    cuts.toSeq
  }

  /** Content-defined chunking — the byte-level dedup primitive behind
    * every storage-dedup / repeated-attachment / recrawl-delta system:
    * unlike fixed-size blocks, chunk boundaries derive from CONTENT (a
    * gear rolling hash masking to zero), so inserting one byte
    * re-aligns within a chunk or two instead of shifting every block
    * boundary after the edit — shared regions across payloads keep
    * identical chunk digests and dedup by digest group-by, exactly like
    * [[Dedup.exactGroups]] one level down the stack. (Both properties
    * — edit locality and shift resistance — are spec-asserted.)
    *
    * Emits (record_id, chunk_index, offset, length, sha-256) per chunk
    * from the usual per-partition batch walk: payload bytes never leave
    * the scan task, only ~50 B/chunk rows shuffle. The avg chunk size
    * is 2^⌊log2(avgSize)⌋ in expectation; min/max clamp pathological
    * content (all-zero runs would otherwise never cut, adversarial
    * content would cut every byte).
    */
  def cdcChunks(df: DataFrame, idCol: String, dataCol: String,
                minSize: Int = 64, avgSize: Int = 256,
                maxSize: Int = 1024): Dataset[CdcChunk] = {
    require(minSize >= 1 && minSize <= avgSize && avgSize <= maxSize,
      s"need 1 <= min <= avg <= max, got $minSize/$avgSize/$maxSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(dataCol).isNotNull)
      .select(col(idCol).cast("long"), col(dataCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.flatMap { case (id, data) =>
          val ends = cdcBoundaries(data, minSize, avgSize, maxSize)
          var start = 0
          ends.zipWithIndex.map { case (end, idx) =>
            md.reset()
            md.update(data, start, end - start)
            val digest = md.digest().map(b => f"$b%02x").mkString
            val c = CdcChunk(id, idx, start.toLong, end - start, digest)
            start = end
            c
          }
        }
      }
  }
}
