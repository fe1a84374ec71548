package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * opaque `binary` payloads + typed metadata, with decode/feature-extract
  * as per-partition batch operators. North-star extension (SURVEY.md §2
  * extensions).
  *
  * Design for 100 TB:
  *  - payloads are BINARY columns in Parquet — scanned columnar, pruned
  *    away entirely by any query that doesn't touch `data` (the whole
  *    point of the reference's columnar argument, slides "Clue #2");
  *  - decode/feature-extract run via typed `mapPartitions` (the Scala
  *    equivalent of `mapInPandas`: one JVM call per BATCH, not per row),
  *    so codec init cost amortizes across a partition;
  *  - rows with multi-MB payloads make `spark.sql.files.maxPartitionBytes`
  *    the partition-size lever; `repartitionAssets` re-ranges by id so a
  *    task never holds more than ~targetRowsPerTask payloads;
  *  - decode is REAL for every format a JVM can carry alone: 24-bit BMP
  *    and 16-bit PCM WAV (pure byte arithmetic,
  *    [[decodeBmp]]/[[decodeWav]]); PNG across gray/truecolor/palette/
  *    alpha color types, sub-byte depths, and Adam7 interlace
  *    ([[decodePng]]: chunk walk + CRC32 check, `java.util.zip.Inflater`
  *    for IDAT, all five scanline unfilters); baseline AND progressive
  *    JPEG ([[Jpeg]]); GIF87a/89a ([[Gif]]) — each oracle-gated
  *    end-to-end. Only COMPRESSED AUDIO (MP3/Vorbis) remains
  *    environment-blocked — no codec libs in this container — so
  *    [[decodeAudio]]-style dispatch throws a clearly-marked
  *    NotImplementedError there, with `fakeDecode` as the deterministic
  *    stand-in behind the generic gates. The Spark-side plumbing —
  *    schema, encoders, batch shape, partitioning — is real throughout.
  */
object Multimodal {

  /** Typed asset row: opaque payload + discriminator. */
  final case class Asset(asset_id: Long, kind: String, data: Array[Byte])

  /** Extracted image-ish features (what a real decoder would emit). */
  final case class ImageFeatures(
      asset_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, mean_luma: Double)

  /** Video frame-sampling output: one row per sampled frame. */
  final case class FrameSample(
      asset_id: Long, frame_index: Int, frame_offset_ms: Long, frame_hash: Long)

  // ------------------------------------------------------------- ingest

  /** Pack a string column into a BINARY asset payload (utf-8). In a real
    * pipeline the binary comes from object storage; this builder exists so
    * every downstream operator is exercisable on the testdata tables.
    */
  def packAssets(df: DataFrame, idCol: String, payloadCol: String,
                 kind: String = "image"): DataFrame = {
    // fail fast on non-numeric ids: under ANSI (the engine default) the
    // cast would abort mid-scan; with ANSI off it would produce null
    // asset_ids that kill the non-nullable Asset encoder later
    val idType = df.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packAssets needs a numeric id column; '$idCol' is ${idType.simpleString} " +
        "- derive a dense numeric id first")
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(kind).as("kind"),
      encode(col(payloadCol), "UTF-8").as("data"))
  }

  /** Range-repartition by asset id so each task holds at most
    * ~targetRowsPerTask (potentially multi-MB) payloads regardless of
    * upstream layout. Costs one count() action to size the partitioning —
    * that is the point of the operator; callers who only want layout reuse
    * should repartitionByRange themselves.
    */
  def repartitionAssets(df: DataFrame, targetRowsPerTask: Int = 1024): DataFrame = {
    require(targetRowsPerTask > 0, "targetRowsPerTask must be positive")
    val rows = df.count()
    val minParts = df.sparkSession.sparkContext.defaultParallelism
    val n = math.max(math.ceil(rows.toDouble / targetRowsPerTask).toInt, minParts)
    df.repartitionByRange(n, col("asset_id"))
  }

  // ------------------------------------------------------------- decode

  // --- REAL decoders, no codec library required, so these run
  // everywhere: BMP 24-bit and WAV 16-bit PCM (pure byte arithmetic),
  // PNG (Inflater + unfilters, all color types/depths/interlace),
  // baseline+progressive JPEG, and GIF. Only compressed AUDIO
  // (MP3/Vorbis) remains environment-blocked behind the dispatch; the
  // deterministic fakeDecode stand-in still backs the generic gates.

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** REAL 24-bit uncompressed BMP decode: header-parsed dimensions and
    * the Rec.601 mean luma. Luma accumulates as an exact integer
    * (299·R + 587·G + 114·B per pixel, summed in a long), so the result
    * is independent of pixel iteration order and bit-replicable by an
    * external engine: mean_luma = Σ/(1000·255·pixels), one double
    * division chain at the end.
    */
  def decodeBmp(assetId: Long, kind: String, data: Array[Byte]): ImageFeatures = {
    require(data.length >= 54 && data(0) == 'B' && data(1) == 'M',
      "not a BMP payload")
    val pixelOffset = leInt(data, 10)
    val width = leInt(data, 18)
    val heightRaw = leInt(data, 22)
    val height = math.abs(heightRaw)
    val bpp = leShort(data, 28)
    val compression = leInt(data, 30)
    require(bpp == 24 && compression == 0,
      s"only 24-bit uncompressed BMP supported here (bpp=$bpp, compression=$compression)")
    // malformed headers must fail loudly, not index out of bounds
    require(width > 0 && height > 0 && pixelOffset >= 54,
      s"malformed BMP header (width=$width, height=$heightRaw, offset=$pixelOffset)")
    // stride in LONG: 3*width overflows Int past ~715M and a wrapped
    // negative stride would defeat the truncation require below, turning
    // the loud malformed-header error into an index crash
    val stride = ((3L * width + 3) / 4) * 4
    require(data.length >= pixelOffset + stride * height,
      "BMP payload truncated")
    var lumaMilli = 0L
    var y = 0
    while (y < height) {
      // the require above bounds pixelOffset + stride*height by
      // data.length (an Int), so the narrowing is exact
      val row = (pixelOffset + y * stride).toInt
      var x = 0
      while (x < width) {
        val b = data(row + 3 * x) & 0xFF
        val g = data(row + 3 * x + 1) & 0xFF
        val r = data(row + 3 * x + 2) & 0xFF
        lumaMilli += 299L * r + 587L * g + 114L * b
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    val meanLuma =
      if (n == 0) 0.0 else lumaMilli.toDouble / (1000.0 * 255.0 * n)
    ImageFeatures(assetId, kind, data.length.toLong, width, height, 3, meanLuma)
  }

  /** REAL RIFF/WAVE 16-bit PCM decode: fmt/data chunks walked, RMS over
    * int16 samples accumulated as an exact integer sum of squares —
    * rms = √(Σs²/n)/32768 (√ is correctly rounded on every IEEE engine,
    * so the value is bit-replicable).
    */
  def decodeWav(assetId: Long, data: Array[Byte]): AudioFeatures = {
    require(data.length >= 44 &&
      data(0) == 'R' && data(1) == 'I' && data(2) == 'F' && data(3) == 'F' &&
      data(8) == 'W' && data(9) == 'A' && data(10) == 'V' && data(11) == 'E',
      "not a WAV payload")
    var off = 12
    var sampleRate = 0
    var channels = 0
    var audioFmt = 0
    var blockAlign = 0
    var samplesPerBlock = 0
    var factSamples = -1
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= data.length && (sampleRate == 0 || dataOff < 0)) {
      val id = new String(data.slice(off, off + 4), "US-ASCII")
      val len = leInt(data, off + 4)
      // a corrupt negative/oversized length would loop forever or read
      // past the payload — fail loudly instead
      require(len >= 0 && off + 8 + len.toLong <= data.length,
        s"malformed WAV chunk '$id' (len=$len at offset $off)")
      if (id == "fmt ") {
        // the fields below sit at +8..+23: a shorter declared fmt chunk
        // would read the NEXT chunk's bytes as sampleRate/bitsPerSample
        // (or run off the buffer) instead of failing loudly
        require(len >= 16, s"malformed WAV fmt chunk (len=$len, need >= 16)")
        audioFmt = leShort(data, off + 8)
        require(audioFmt == 1 || audioFmt == 6 || audioFmt == 7 ||
          audioFmt == 17,
          s"only PCM/A-law/mu-law/IMA-ADPCM WAV supported here " +
            s"(format=$audioFmt)")
        channels = leShort(data, off + 10)
        sampleRate = leInt(data, off + 12)
        blockAlign = leShort(data, off + 20)
        val bits = leShort(data, off + 22)
        audioFmt match {
          case 1 => require(bits == 16, "only 16-bit PCM supported here")
          case 17 =>
            require(bits == 4, s"IMA ADPCM WAV must be 4-bit (bits=$bits)")
            require(channels == 1, "only mono IMA ADPCM supported here")
            require(len >= 20, "ADPCM fmt chunk lacks samplesPerBlock")
            samplesPerBlock = leShort(data, off + 26)
            require(samplesPerBlock >= 1,
              s"bad ADPCM samplesPerBlock $samplesPerBlock")
          case _ => require(bits == 8, s"G.711 WAV must be 8-bit (bits=$bits)")
        }
      } else if (id == "fact") {
        require(len >= 4, s"malformed WAV fact chunk (len=$len)")
        factSamples = leInt(data, off + 8)
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = len
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && channels > 0 && dataOff >= 0,
      "WAV missing fmt/data chunk")
    val nSamples = audioFmt match {
      case 1 => dataLen / 2
      case 17 =>
        if (factSamples >= 0) factSamples
        else { // no fact chunk: derive from the block structure
          val full = dataLen / blockAlign
          val rem = dataLen % blockAlign
          full * samplesPerBlock + (if (rem >= 4) 1 + 2 * (rem - 4) else 0)
        }
      case _ => dataLen
    }
    var sumSq = 0L
    if (audioFmt == 17) {
      val samples = decodeImaAdpcm(data, dataOff, dataLen, blockAlign,
        nSamples)
      var i = 0
      while (i < samples.length) {
        sumSq += samples(i).toLong * samples(i)
        i += 1
      }
    } else {
      var i = 0
      while (i < nSamples) {
        val s = audioFmt match {
          case 1 => leShort(data, dataOff + 2 * i).toShort.toInt
          case 7 => mulawToLinear(data(dataOff + i) & 0xFF)
          case _ => alawToLinear(data(dataOff + i) & 0xFF)
        }
        sumSq += s.toLong * s
        i += 1
      }
    }
    val frames = nSamples.toLong / channels
    val rms =
      if (nSamples == 0) 0.0
      else math.sqrt(sumSq.toDouble / nSamples) / 32768.0
    AudioFeatures(assetId, data.length.toLong, nSamples.toLong,
      frames * 1000L / sampleRate, rms)
  }

  // IMA/DVI ADPCM tables (public spec data: IMA "Recommended Practices
  // for Enhancing Digital Audio Compatibility", 1992)
  private val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM nibble step: returns the new (predictor, stepIndex).
    * Pure integer (the published bit-exact recipe): diff builds from the
    * step in halves/quarters/eighths per nibble bit, sign bit 8
    * subtracts, predictor clamps to int16, index clamps to [0, 88].
    */
  private def imaStep(nibble: Int, predictor: Int, index: Int): (Int, Int) = {
    val step = ImaStepTable(index)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p0 = if ((nibble & 8) != 0) predictor - diff else predictor + diff
    val p = if (p0 > 32767) 32767 else if (p0 < -32768) -32768 else p0
    val i0 = index + ImaIndexTable(nibble & 7)
    val i = if (i0 < 0) 0 else if (i0 > 88) 88 else i0
    (p, i)
  }

  /** Decode one MONO IMA ADPCM block (4-byte header: int16 predictor,
    * uint8 step index, reserved byte; then two nibbles per byte,
    * low nibble first) into `out`; returns the sample count written —
    * 1 (the header predictor IS the first sample) + 2·(blockLen−4),
    * capped at `maxSamples` (the final block of a stream may be short).
    */
  private def decodeImaBlock(data: Array[Byte], off: Int, blockLen: Int,
                             out: Array[Int], outOff: Int,
                             maxSamples: Int): Int = {
    require(blockLen >= 4, s"ADPCM block too short ($blockLen)")
    var predictor = ((data(off) & 0xFF) | ((data(off + 1) & 0xFF) << 8))
      .toShort.toInt
    var index = data(off + 2) & 0xFF
    require(index <= 88, s"ADPCM step index $index out of range")
    var n = 0
    if (n < maxSamples) { out(outOff) = predictor; n += 1 }
    var i = 4
    while (i < blockLen && n < maxSamples) {
      val b = data(off + i) & 0xFF
      var k = 0
      while (k < 2 && n < maxSamples) {
        val nib = if (k == 0) b & 0x0F else (b >> 4) & 0x0F
        val (p, ix) = imaStep(nib, predictor, index)
        predictor = p
        index = ix
        out(outOff + n) = p
        n += 1
        k += 1
      }
      i += 1
    }
    n
  }

  /** Decode a MONO IMA ADPCM (WAV format 17) data chunk: `blockAlign`-
    * sized blocks, each self-contained (header predictor + nibble
    * stream), `nSamples` total per the fact chunk (or derived). Returns
    * the decoded int16 samples.
    */
  private[ext] def decodeImaAdpcm(data: Array[Byte], dataOff: Int,
                                  dataLen: Int, blockAlign: Int,
                                  nSamples: Int): Array[Int] = {
    require(blockAlign >= 4, s"ADPCM blockAlign $blockAlign too small")
    val out = new Array[Int](nSamples)
    var off = dataOff
    var produced = 0
    while (off < dataOff + dataLen && produced < nSamples) {
      val blockLen = math.min(blockAlign, dataOff + dataLen - off)
      produced += decodeImaBlock(data, off, blockLen, out, produced,
        nSamples - produced)
      off += blockLen
    }
    require(produced == nSamples,
      s"ADPCM stream truncated: decoded $produced of $nSamples samples")
    out
  }

  /** Mono IMA ADPCM WAV (format 17) from the [[makeWav]] sample family
    * s(i) = ((seed·31 + i) mod 65536) − 32768, ENCODED with the
    * standard greedy quantizer (same tables, nibble chosen by
    * successive step subtraction) — the decoder must reproduce the
    * encoder's predictor path bit-exactly, which the spec asserts
    * against this encoder's own forward simulation.
    */
  def makeWavAdpcm(seed: Long, nSamples: Int, samplesPerBlock: Int = 505,
                   sampleRate: Int = 8000): Array[Byte] = {
    require(samplesPerBlock >= 1 && (samplesPerBlock - 1) % 2 == 0,
      "samplesPerBlock must be odd (header sample + nibble pairs)")
    val blockAlign = 4 + (samplesPerBlock - 1) / 2
    def sample(i: Int): Int =
      ((((seed * 31 + i) % 65536) + 65536) % 65536).toInt - 32768
    val nBlocks = (nSamples + samplesPerBlock - 1) / samplesPerBlock
    val body = new java.io.ByteArrayOutputStream()
    var produced = 0
    var predictor = 0
    var index = 0
    (0 until nBlocks).foreach { _ =>
      val inBlock = math.min(samplesPerBlock, nSamples - produced)
      // header: first sample verbatim + current step index
      predictor = sample(produced)
      body.write(predictor & 0xFF); body.write((predictor >> 8) & 0xFF)
      body.write(index); body.write(0)
      produced += 1
      var nibLow = -1
      (1 until inBlock).foreach { j =>
        val target = sample(produced)
        // standard greedy quantizer: sign + successive step halvings
        val step = ImaStepTable(index)
        var delta = target - predictor
        var nib = 0
        if (delta < 0) { nib = 8; delta = -delta }
        var s = step
        if (delta >= s) { nib |= 4; delta -= s }
        s >>= 1
        if (delta >= s) { nib |= 2; delta -= s }
        s >>= 1
        if (delta >= s) { nib |= 1 }
        val (p, ix) = imaStep(nib, predictor, index)
        predictor = p
        index = ix
        if (nibLow < 0) nibLow = nib
        else { body.write(nibLow | (nib << 4)); nibLow = -1 }
        produced += 1
      }
      if (nibLow >= 0) { body.write(nibLow); nibLow = -1 }
      // pad the block to blockAlign (decoder caps on sample count)
      while (body.size() % blockAlign != 0) body.write(0)
    }
    val dataBytes = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF) }
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("RIFF".getBytes); w32(52 + dataBytes.length)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(20)
    w16(17); w16(1) // IMA ADPCM, mono
    w32(sampleRate); w32(sampleRate * blockAlign / samplesPerBlock)
    w16(blockAlign); w16(4) // bits per (coded) sample
    w16(2); w16(samplesPerBlock) // cbSize, samplesPerBlock
    out.write("fact".getBytes); w32(4); w32(nSamples)
    out.write("data".getBytes); w32(dataBytes.length)
    out.write(dataBytes, 0, dataBytes.length)
    out.toByteArray
  }

  /** G.711 μ-law byte → linear sample (ITU-T G.711, the telephony /
    * speech-corpus codec): complement, then magnitude
    * ((mantissa·8 + 132) << exponent) − 132, sign from the complemented
    * high bit. Pure integer — an external SQL engine replays it with
    * shifts and mods (the q140 oracle does). Range ±32124.
    */
  private[ext] def mulawToLinear(b: Int): Int = {
    val u = (~b) & 0xFF
    val mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 A-law byte → linear sample: XOR 0x55, then the segment/
    * mantissa expansion; the (un-XORed) high bit SET means positive —
    * A-law's sign convention is inverted relative to μ-law. Range
    * ±32256.
    */
  private[ext] def alawToLinear(b: Int): Int = {
    val a = b ^ 0x55
    val exp = (a >> 4) & 0x07
    val mant = a & 0x0F
    val mag =
      if (exp == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (exp - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Mono 8-bit G.711 WAV (format 7 = μ-law, 6 = A-law) with byte i =
    * (seed·31 + i) mod 256 — the [[makeWav]] byte family, so the oracle
    * replays the expansion formula per byte in closed form.
    */
  def makeWavG711(seed: Long, nSamples: Int, mulaw: Boolean,
                  sampleRate: Int = 8000): Array[Byte] = {
    val out = new Array[Byte](44 + nSamples)
    def putInt(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putShort(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    "RIFF".getBytes.copyToArray(out, 0); putInt(4, 36 + nSamples)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12); putInt(16, 16)
    putShort(20, if (mulaw) 7 else 6); putShort(22, 1) // mono
    putInt(24, sampleRate); putInt(28, sampleRate) // byte rate = rate · 1
    putShort(32, 1); putShort(34, 8) // block align, bits
    "data".getBytes.copyToArray(out, 36); putInt(40, nSamples)
    var i = 0
    while (i < nSamples) {
      out(44 + i) = (((seed * 31 + i) % 256 + 256) % 256).toByte
      i += 1
    }
    out
  }

  // --------------------------------------------------------- PNG decode

  private val PngSignature: Array[Int] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** The Paeth predictor (PNG spec §9.4): the neighbor (left, above,
    * upper-left) closest to left + above − upper-left.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Adam7 interlace pass grid: (xStart, yStart, xStep, yStep). */
  private val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** REAL PNG decode: pure JDK — chunk walk with CRC32 validation, IDAT
    * inflate via `java.util.zip.Inflater`, per-scanline unfilter (all
    * five PNG filter types), then the same exact-integer Rec.601 luma
    * as [[decodeBmp]] over the RGB channels (alpha never enters luma).
    * Covers the web-crawl color types — grayscale (0), truecolor RGB
    * (2), palette (3, PLTE-expanded), gray+alpha (4), RGBA (6) — at bit
    * depth 8, plus the sub-byte depths 1/2/4 for grayscale and palette
    * (samples scaled by 255/(2^d−1) per the spec), and BOTH interlace
    * methods: none and Adam7 (each pass unfilters against its own rows;
    * since the output is a luma SUM, pass pixels accumulate without a
    * placement pass). 16-bit and every malformed structure fail loudly
    * with a named reason — corrupt web-scraped payloads must be a
    * per-row error a caller can quarantine, never a silent wrong number
    * or an index crash.
    */
  def decodePng(assetId: Long, kind: String, data: Array[Byte]): ImageFeatures = {
    require(data.length >= 8 &&
      (0 until 8).forall(i => (data(i) & 0xFF) == PngSignature(i)),
      "not a PNG payload")
    val crc = new java.util.zip.CRC32
    var off = 8
    var width = 0; var height = 0
    var colorType = -1; var bitDepth = 0; var interlace = 0
    var palette: Array[Int] = null // packed 0xRRGGBB
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      require(off + 8 <= data.length, "PNG truncated mid chunk header")
      val len = beInt(data, off)
      require(len >= 0 && off + 12L + len <= data.length,
        s"malformed PNG chunk length $len at offset $off")
      val chunkType = new String(data, off + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(data, off + 4, 4 + len)
      require(crc.getValue == (beInt(data, off + 8 + len).toLong & 0xFFFFFFFFL),
        s"PNG chunk '$chunkType' fails CRC — corrupt payload")
      chunkType match {
        case "IHDR" =>
          require(len == 13, s"malformed IHDR (len=$len)")
          width = beInt(data, off + 8)
          height = beInt(data, off + 12)
          bitDepth = data(off + 16) & 0xFF
          colorType = data(off + 17) & 0xFF
          interlace = data(off + 20) & 0xFF
          require(Set(0, 2, 3, 4, 6).contains(colorType),
            s"unknown PNG color type $colorType")
          if (colorType == 0 || colorType == 3)
            require(Set(1, 2, 4, 8).contains(bitDepth),
              s"PNG depth $bitDepth not supported for color type $colorType" +
                " (16-bit not supported here)")
          else
            require(bitDepth == 8,
              s"only 8-bit PNG supported for color type $colorType " +
                s"(depth=$bitDepth)")
          require(interlace <= 1, s"unknown PNG interlace method $interlace")
          require(width > 0 && height > 0,
            s"malformed PNG dimensions ${width}x$height")
          sawIhdr = true
        case "PLTE" =>
          require(sawIhdr, "PNG PLTE before IHDR")
          require(len % 3 == 0 && len >= 3 && len <= 768,
            s"malformed PLTE (len=$len)")
          palette = Array.tabulate(len / 3) { i =>
            ((data(off + 8 + 3 * i) & 0xFF) << 16) |
              ((data(off + 9 + 3 * i) & 0xFF) << 8) |
              (data(off + 10 + 3 * i) & 0xFF)
          }
        case "IDAT" =>
          require(sawIhdr, "PNG IDAT before IHDR")
          idat.write(data, off + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, tRNS, ...) — no luma
      }
      off += 12 + len
    }
    require(sawIhdr && idat.size() > 0, "PNG missing IHDR/IDAT")
    require(colorType != 3 || palette != null, "palette PNG missing PLTE")
    // samples per pixel and filter byte distance (≥1 byte per the spec)
    val cpp = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case _ => 4
    }
    val reportChannels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 3; case 4 => 2; case _ => 4
    }
    val bpp = math.max(1, cpp * bitDepth / 8)
    def rowBytesOf(w: Int): Int = (w * cpp * bitDepth + 7) / 8
    // pass geometry: one full-size pass, or the 7 Adam7 reductions
    val passes: Seq[(Int, Int)] =
      if (interlace == 0) Seq((width, height))
      else Adam7.map { case (x0, y0, dx, dy) =>
        (if (width > x0) (width - x0 + dx - 1) / dx else 0,
          if (height > y0) (height - y0 + dy - 1) / dy else 0)
      }
    val rawLen = passes.collect { case (w, h) if w > 0 && h > 0 =>
      (1L + rowBytesOf(w)) * h
    }.sum
    require(rawLen > 0 && rawLen <= Int.MaxValue - 8,
      s"PNG raw size $rawLen unsupported")
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // n == 0 before the stream end means the zlib data ran out (or
        // demands a preset dictionary, which PNG forbids): fail loudly
        // rather than spin
        require(n > 0 || inflater.finished(), "PNG IDAT stream truncated")
        got += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"PNG IDAT not valid zlib: ${e.getMessage}")
    } finally inflater.end()
    require(got == raw.length,
      s"PNG pixel data truncated: inflated $got of ${raw.length} bytes")

    val grayScale =
      if (bitDepth == 8) 1 else 255 / ((1 << bitDepth) - 1) // 255/85/17
    val depthMask = (1 << bitDepth) - 1
    var lumaMilli = 0L
    var passOff = 0
    passes.foreach { case (w, h) =>
      if (w > 0 && h > 0) {
        val rb = rowBytesOf(w)
        val stride = 1 + rb
        var y = 0
        while (y < h) {
          val rowOff = passOff + y * stride + 1
          val filter = raw(rowOff - 1) & 0xFF
          require(filter <= 4, s"PNG scanline has invalid filter $filter")
          var x = 0
          while (x < rb) {
            val left = if (x >= bpp) raw(rowOff + x - bpp) & 0xFF else 0
            val up = if (y > 0) raw(rowOff - stride + x) & 0xFF else 0
            val upLeft =
              if (y > 0 && x >= bpp) raw(rowOff - stride + x - bpp) & 0xFF
              else 0
            val recon = filter match {
              case 0 => raw(rowOff + x) & 0xFF
              case 1 => ((raw(rowOff + x) & 0xFF) + left) & 0xFF
              case 2 => ((raw(rowOff + x) & 0xFF) + up) & 0xFF
              case 3 => ((raw(rowOff + x) & 0xFF) + (left + up) / 2) & 0xFF
              case 4 => ((raw(rowOff + x) & 0xFF) + paeth(left, up, upLeft)) & 0xFF
            }
            raw(rowOff + x) = recon.toByte
            x += 1
          }
          // luma over the reconstructed row; interlace pass position is
          // irrelevant to a sum — every image pixel appears exactly once
          // across passes
          def sampleAt(px: Int): Int =
            if (bitDepth == 8) raw(rowOff + px) & 0xFF
            else {
              val bit = px * bitDepth
              ((raw(rowOff + (bit >> 3)) & 0xFF) >>
                (8 - bitDepth - (bit & 7))) & depthMask
            }
          var px = 0
          while (px < w) {
            colorType match {
              case 0 => lumaMilli += 1000L * (sampleAt(px) * grayScale)
              case 4 => lumaMilli += 1000L * (raw(rowOff + px * 2) & 0xFF)
              case 3 =>
                val idx = sampleAt(px)
                require(idx < palette.length,
                  s"PNG palette index $idx out of range (${palette.length})")
                val rgb = palette(idx)
                lumaMilli += 299L * ((rgb >> 16) & 0xFF) +
                  587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
              case _ =>
                val p = rowOff + px * cpp
                lumaMilli += 299L * (raw(p) & 0xFF) +
                  587L * (raw(p + 1) & 0xFF) + 114L * (raw(p + 2) & 0xFF)
            }
            px += 1
          }
          y += 1
        }
        passOff += stride * h
      }
    }
    val n = width.toLong * height
    val meanLuma =
      if (n == 0) 0.0 else lumaMilli.toDouble / (1000.0 * 255.0 * n)
    ImageFeatures(assetId, kind, data.length.toLong, width, height,
      reportChannels, meanLuma)
  }

  /** REAL JPEG decode via the pure-JVM [[Jpeg]] module (marker walk,
    * Huffman entropy decode, dequant + IDCT, chroma upsample,
    * YCbCr→RGB), covering BOTH baseline (SOF0) and progressive (SOF2)
    * scan scripts — same exact-integer Rec.601 luma convention as
    * [[decodeBmp]]/[[decodePng]]. 12-bit/arithmetic/CMYK payloads fail
    * loudly with named reasons.
    */
  def decodeJpeg(assetId: Long, kind: String, data: Array[Byte]): ImageFeatures = {
    val d = Jpeg.decode(data)
    ImageFeatures(assetId, kind, data.length.toLong, d.width, d.height,
      d.channels, d.lumaMilli.toDouble / (1000.0 * 255.0 *
        (d.width.toLong * d.height)))
  }

  /** Batch REAL-decode of JPEG assets (same mapPartitions shape as
    * [[bmpFeatures]]); fails loudly on non-JPEG payloads.
    */
  def jpegFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map(a => decodeJpeg(a.asset_id, a.kind, a.data)))
  }

  /** REAL GIF87a/89a decode via the pure-JVM [[Gif]] module (LZW,
    * palettes, sub-block walk) — same exact-integer Rec.601 luma
    * convention as the other decoders; first frame only.
    */
  def decodeGif(assetId: Long, kind: String, data: Array[Byte]): ImageFeatures = {
    val d = Gif.decode(data)
    ImageFeatures(assetId, kind, data.length.toLong, d.width, d.height,
      d.channels, d.lumaMilli.toDouble / (1000.0 * 255.0 *
        (d.width.toLong * d.height)))
  }

  /** Batch REAL-decode of GIF assets (same mapPartitions shape as
    * [[bmpFeatures]]); fails loudly on non-GIF payloads.
    */
  def gifFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map(a => decodeGif(a.asset_id, a.kind, a.data)))
  }

  /** Decoder dispatch: real byte-level decode for the formats this
    * library parses natively — BMP by container signature, 8-bit
    * truecolor PNG, baseline+progressive JPEG, and GIF, all pure-JVM; anything
    * else (WebP, AVIF, ...) is environment-blocked (swap in e.g.
    * ImageIO behind this signature).
    */
  def decodeImage(assetId: Long, kind: String, data: Array[Byte]): ImageFeatures =
    if (data.length >= 2 && data(0) == 'B' && data(1) == 'M')
      decodeBmp(assetId, kind, data)
    else if (data.length >= 8 &&
      (0 until 8).forall(i => (data(i) & 0xFF) == PngSignature(i)))
      decodePng(assetId, kind, data)
    else if (data.length >= 2 &&
      (data(0) & 0xFF) == 0xFF && (data(1) & 0xFF) == 0xD8)
      decodeJpeg(assetId, kind, data)
    else if (data.length >= 4 && data(0) == 'G' && data(1) == 'I' &&
      data(2) == 'F' && data(3) == '8')
      decodeGif(assetId, kind, data)
    else if (data.length >= 4 && data(0) == 'q' && data(1) == 'o' &&
      data(2) == 'i' && data(3) == 'f')
      Qoi.decode(assetId, kind, data)
    else throw new NotImplementedError(
      "image codecs beyond BMP/PNG/JPEG/GIF/QOI not available in " +
        "this environment - use fakeDecode (STUB) for other formats")

  // --- deterministic payload builders (tests + gate): exact byte layouts
  // the real decoders parse

  /** 24-bit bottom-up BMP with gray pixel v(x,y) = (seed + x + y) % 256. */
  def makeBmp(seed: Long, width: Int, height: Int): Array[Byte] = {
    val stride = ((3 * width + 3) / 4) * 4
    val size = 54 + stride * height
    val out = new Array[Byte](size)
    def putInt(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putInt(2, size); putInt(10, 54); putInt(14, 40)
    putInt(18, width); putInt(22, height)
    out(26) = 1; out(28) = 24 // planes, bpp (compression stays 0)
    var y = 0
    while (y < height) {
      val row = 54 + y * stride
      var x = 0
      while (x < width) {
        val v = (((seed + x + y) % 256 + 256) % 256).toByte
        out(row + 3 * x) = v; out(row + 3 * x + 1) = v; out(row + 3 * x + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** Deterministic TEXTURED 24-bit BMP: gray pixel
    * v(x,y) = (seed·31 + x² + (3 + seed%5)·xy + (7 + seed%11)·y) mod 256,
    * optionally with ONE pixel perturbed by +`flipDelta` (mod 256) — the
    * controlled near-duplicate generator behind the perceptual-hash
    * gates. Unlike [[makeBmp]]'s smooth gradient (whose difference hash
    * degenerates to all-ones away from the wrap diagonal), the
    * SEED-DEPENDENT xy/y coefficients change the comparison structure
    * itself between seeds (a seed-only offset would shift every pixel by
    * the same constant and leave most box comparisons untouched), so two
    * images hash close iff their seeds match — and a single-pixel flip
    * moves exactly one downsample box, i.e. at most two dHash bits.
    */
  def makeBmpTextured(seed: Long, width: Int, height: Int,
                      flip: Option[(Int, Int)] = None,
                      flipDelta: Int = 96): Array[Byte] = {
    val stride = ((3 * width + 3) / 4) * 4
    val size = 54 + stride * height
    val out = new Array[Byte](size)
    def putInt(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putInt(2, size); putInt(10, 54); putInt(14, 40)
    putInt(18, width); putInt(22, height)
    out(26) = 1; out(28) = 24 // planes, bpp (compression stays 0)
    var y = 0
    while (y < height) {
      val row = 54 + y * stride
      var x = 0
      while (x < width) {
        val base = seed * 31 + x.toLong * x +
          (3L + java.lang.Math.floorMod(seed, 5L)) * x * y +
          (7L + java.lang.Math.floorMod(seed, 11L)) * y
        val bump = if (flip.contains((x, y))) flipDelta.toLong else 0L
        val v = java.lang.Math.floorMod(base + bump, 256L).toByte
        out(row + 3 * x) = v; out(row + 3 * x + 1) = v; out(row + 3 * x + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** 24-bit BMP → per-pixel luma-milli grid (299R + 587G + 114B, exact
    * integers) in FILE-ROW order, row-major. Same header validation as
    * [[decodeBmp]]; used by the perceptual hashes, which need pixels,
    * not just the mean.
    */
  private[ext] def bmpLumaGrid(data: Array[Byte]): (Int, Int, Array[Long]) = {
    require(data.length >= 54 && data(0) == 'B' && data(1) == 'M',
      "not a BMP payload")
    val pixelOffset = leInt(data, 10)
    val width = leInt(data, 18)
    val height = math.abs(leInt(data, 22))
    val bpp = leShort(data, 28)
    val compression = leInt(data, 30)
    require(bpp == 24 && compression == 0,
      s"only 24-bit uncompressed BMP supported here (bpp=$bpp, compression=$compression)")
    require(width > 0 && height > 0 && pixelOffset >= 54,
      s"malformed BMP header (width=$width, height=$height, offset=$pixelOffset)")
    val stride = ((3L * width + 3) / 4) * 4
    require(data.length >= pixelOffset + stride * height, "BMP payload truncated")
    val grid = new Array[Long](width * height)
    var y = 0
    while (y < height) {
      val row = (pixelOffset + y * stride).toInt
      var x = 0
      while (x < width) {
        val b = data(row + 3 * x) & 0xFF
        val g = data(row + 3 * x + 1) & 0xFF
        val r = data(row + 3 * x + 2) & 0xFF
        grid(y * width + x) = 299L * r + 587L * g + 114L * b
        x += 1
      }
      y += 1
    }
    (width, height, grid)
  }

  /** Perceptual image hashes (asset_id, dhash, ahash), both 64-bit. */
  final case class ImageHash(asset_id: Long, width: Int, height: Int,
                             dhash: Long, ahash: Long)

  /** Perceptual image hashing — the image-side analogue of SimHash for
    * near-duplicate detection over a multimodal corpus:
    *
    *  - the decoded luma grid is downsampled to a (gridW × gridH) grid of
    *    EXACT INTEGER box sums. Boxes are required to tile the image
    *    exactly (width % gridW == 0, height % gridH == 0), so every box
    *    has equal area and comparing box SUMS is identical to comparing
    *    box means — no division, no rounding policy, bit-replicable by
    *    an external engine;
    *  - dHash: bit (x, y) = [S(x+1, y) > S(x, y)] over the first
    *    gridW−1 columns — 64 bits at the classic 9×8 grid. Robust to
    *    global brightness/contrast shifts (gradients survive affine
    *    luma maps);
    *  - aHash: bit (x, y) = [n·S(x, y) > ΣS] over the same
    *    (gridW−1)×gridH cells (n = their count) — the mean-threshold
    *    hash, again division-free by cross-multiplication.
    *
    * Feed the result to [[Dedup.hammingPairs]] for banded near-dup
    * pairing: the hash is 8 bytes/image, so the pairwise stage never
    * touches pixel data — the property that makes image dedup viable at
    * 100 TB (hashes shuffle; payloads stay in the scan).
    */
  def imageHashes(assets: Dataset[Asset],
                  gridW: Int = 9, gridH: Int = 8): Dataset[ImageHash] = {
    require(gridW >= 2 && gridH >= 1, s"hash grid must be at least 2×1, got $gridW×$gridH")
    require((gridW - 1) * gridH <= 64,
      s"hash grid (${gridW - 1}×$gridH comparisons) exceeds 64 bits")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val (w, h, grid) = bmpLumaGrid(a.data)
      require(w % gridW == 0 && h % gridH == 0,
        s"image ($w×$h) must tile the hash grid ($gridW×$gridH) exactly")
      val bw = w / gridW
      val bh = h / gridH
      val s = new Array[Long](gridW * gridH)
      var y = 0
      while (y < h) {
        val gy = y / bh
        var x = 0
        while (x < w) {
          s(gy * gridW + x / bw) += grid(y * w + x)
          x += 1
        }
        y += 1
      }
      var dhash = 0L
      var ahash = 0L
      var total = 0L
      val n = (gridW - 1) * gridH
      var gy = 0
      while (gy < gridH) {
        var gx = 0
        while (gx < gridW - 1) {
          total += s(gy * gridW + gx)
          gx += 1
        }
        gy += 1
      }
      gy = 0
      while (gy < gridH) {
        var gx = 0
        while (gx < gridW - 1) {
          val bit = gy * (gridW - 1) + gx
          if (s(gy * gridW + gx + 1) > s(gy * gridW + gx)) dhash |= 1L << bit
          if (s(gy * gridW + gx) * n > total) ahash |= 1L << bit
          gx += 1
        }
        gy += 1
      }
      ImageHash(a.asset_id, w, h, dhash, ahash)
    })
  }

  /** Non-interlaced 8-bit truecolor PNG with gray pixel
    * v(x,y) = (seed + x + y) % 256 — same gradient as [[makeBmp]], so
    * the decoded luma has the same closed form an external oracle can
    * recompute. Scanline y uses filter type (seed + y) % 5, so a decode
    * of one image series exercises EVERY PNG filter path (None, Sub,
    * Up, Average, Paeth), not just the trivial one. `channels` 3 = RGB,
    * 4 = RGBA (alpha = 255: luma must ignore it).
    */
  def makePng(seed: Long, width: Int, height: Int, channels: Int = 3): Array[Byte] = {
    require(width > 0 && height > 0, "PNG dimensions must be positive")
    require(channels == 3 || channels == 4, s"channels must be 3 or 4, got $channels")
    val rowBytes = width * channels
    // raw pixel grid, then per-scanline filtering into the zlib input
    val pix = Array.ofDim[Byte](height, rowBytes)
    for (y <- 0 until height; x <- 0 until width) {
      val v = (((seed + x + y) % 256 + 256) % 256).toByte
      val p = x * channels
      pix(y)(p) = v; pix(y)(p + 1) = v; pix(y)(p + 2) = v
      if (channels == 4) pix(y)(p + 3) = 0xFF.toByte
    }
    val filtered = new Array[Byte]((1 + rowBytes) * height)
    for (y <- 0 until height) {
      val fType = (((seed + y) % 5 + 5) % 5).toInt
      val rowOff = y * (1 + rowBytes)
      filtered(rowOff) = fType.toByte
      for (x <- 0 until rowBytes) {
        val cur = pix(y)(x) & 0xFF
        val left = if (x >= channels) pix(y)(x - channels) & 0xFF else 0
        val up = if (y > 0) pix(y - 1)(x) & 0xFF else 0
        val upLeft =
          if (y > 0 && x >= channels) pix(y - 1)(x - channels) & 0xFF else 0
        val out = fType match {
          case 0 => cur
          case 1 => (cur - left) & 0xFF
          case 2 => (cur - up) & 0xFF
          case 3 => (cur - (left + up) / 2) & 0xFF
          case 4 => (cur - paeth(left, up, upLeft)) & 0xFF
        }
        filtered(rowOff + 1 + x) = out.toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered)
    deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = zBuf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    PngSignature.foreach(out.write)
    def writeChunk(chunkType: String, body: Array[Byte]): Unit = {
      def be(v: Int): Array[Byte] = Array(
        (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      out.write(be(body.length))
      val typeBytes = chunkType.getBytes("US-ASCII")
      out.write(typeBytes)
      out.write(body)
      val crc = new java.util.zip.CRC32
      crc.update(typeBytes); crc.update(body)
      out.write(be(crc.getValue.toInt))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte) // bit depth
    ihdr.put((if (channels == 3) 2 else 6).toByte) // color type
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    writeChunk("IHDR", ihdr.array())
    writeChunk("IDAT", z)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Deterministic PNG across the decoder's full variant surface:
    * grayscale (0), truecolor (2), palette (3), gray+alpha (4), RGBA
    * (6); bit depths 1/2/4/8 for gray and palette; optional Adam7
    * interlace. Closed forms an external oracle can replay:
    *  - gray/truecolor/gray+alpha: sample s(x,y) = (seed+x+y) mod 2^d,
    *    luma = s · 255/(2^d−1);
    *  - palette: index i(x,y) = (seed+x+y) mod 2^d, palette entry j is
    *    the gray (seed+j) mod 256, luma = (seed + i(x,y)) mod 256.
    * Scanline y of every pass uses filter (seed+y) mod 5, so all five
    * filter paths run under every variant, including interlaced passes.
    */
  def makePngVariant(seed: Long, width: Int, height: Int, colorType: Int,
                     bitDepth: Int = 8,
                     interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "PNG dimensions must be positive")
    require(Set(0, 2, 3, 4, 6).contains(colorType),
      s"unknown color type $colorType")
    require(
      if (colorType == 0 || colorType == 3) Set(1, 2, 4, 8).contains(bitDepth)
      else bitDepth == 8,
      s"depth $bitDepth invalid for color type $colorType")
    val cpp = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case _ => 4
    }
    val depthMask = (1 << bitDepth) - 1
    def sampleVals(x: Int, y: Int): Array[Int] = {
      val s = (((seed + x + y) % (1 << bitDepth)
        + (1 << bitDepth)) % (1 << bitDepth)).toInt
      colorType match {
        case 0 => Array(s)
        case 2 => Array(s, s, s)
        case 3 => Array(s) // palette index
        case 4 => Array(s, depthMask) // opaque alpha
        case _ => Array(s, s, s, 255)
      }
    }
    def rowBytesOf(w: Int): Int = (w * cpp * bitDepth + 7) / 8
    val bpp = math.max(1, cpp * bitDepth / 8)
    val passes: Seq[(Int, Int, Int, Int, Int, Int)] =
      if (!interlaced) Seq((0, 0, 1, 1, width, height))
      else Adam7.map { case (x0, y0, dx, dy) =>
        (x0, y0, dx, dy,
          if (width > x0) (width - x0 + dx - 1) / dx else 0,
          if (height > y0) (height - y0 + dy - 1) / dy else 0)
      }
    val filtered = new java.io.ByteArrayOutputStream()
    passes.foreach { case (x0, y0, dx, dy, pw, ph) =>
      if (pw > 0 && ph > 0) {
        val rb = rowBytesOf(pw)
        var prev: Array[Byte] = null
        var j = 0
        while (j < ph) {
          // pack this pass row's samples MSB-first
          val row = new Array[Byte](rb)
          var bit = 0
          var i = 0
          while (i < pw) {
            sampleVals(x0 + i * dx, y0 + j * dy).foreach { v =>
              val b = bit >> 3
              row(b) = (row(b) | ((v & depthMask) <<
                (8 - bitDepth - (bit & 7)))).toByte
              bit += bitDepth
            }
            i += 1
          }
          val fType = (((seed + j) % 5 + 5) % 5).toInt
          filtered.write(fType)
          var x = 0
          while (x < rb) {
            val cur = row(x) & 0xFF
            val left = if (x >= bpp) row(x - bpp) & 0xFF else 0
            val up = if (prev != null) prev(x) & 0xFF else 0
            val upLeft =
              if (prev != null && x >= bpp) prev(x - bpp) & 0xFF else 0
            val out = fType match {
              case 0 => cur
              case 1 => (cur - left) & 0xFF
              case 2 => (cur - up) & 0xFF
              case 3 => (cur - (left + up) / 2) & 0xFF
              case 4 => (cur - paeth(left, up, upLeft)) & 0xFF
            }
            filtered.write(out)
            x += 1
          }
          prev = row
          j += 1
        }
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray)
    deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    PngSignature.foreach(out.write)
    def writeChunk(chunkType: String, body: Array[Byte]): Unit = {
      def be(v: Int): Array[Byte] = Array(
        (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      out.write(be(body.length))
      val typeBytes = chunkType.getBytes("US-ASCII")
      out.write(typeBytes)
      out.write(body)
      val crc = new java.util.zip.CRC32
      crc.update(typeBytes); crc.update(body)
      out.write(be(crc.getValue.toInt))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(bitDepth.toByte)
    ihdr.put(colorType.toByte)
    ihdr.put(0.toByte).put(0.toByte)
    ihdr.put((if (interlaced) 1 else 0).toByte)
    writeChunk("IHDR", ihdr.array())
    if (colorType == 3) {
      val plte = new Array[Byte](3 * (1 << bitDepth))
      (0 until (1 << bitDepth)).foreach { jj =>
        val g = (((seed + jj) % 256 + 256) % 256).toInt
        plte(3 * jj) = g.toByte; plte(3 * jj + 1) = g.toByte
        plte(3 * jj + 2) = g.toByte
      }
      writeChunk("PLTE", plte)
    }
    writeChunk("IDAT", zBuf.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Batch REAL-decode of PNG assets (same mapPartitions shape as
    * [[bmpFeatures]]); fails loudly on non-PNG payloads.
    */
  def pngFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map(a => decodePng(a.asset_id, a.kind, a.data)))
  }

  /** Mono 16-bit PCM WAV with sample i = ((seed·31 + i) % 65536) − 32768. */
  def makeWav(seed: Long, nSamples: Int, sampleRate: Int = 16000): Array[Byte] =
    makeWavFromPcm(Array.tabulate(nSamples)(i =>
      ((((seed * 31 + i) % 65536) + 65536) % 65536).toInt - 32768), sampleRate)

  /** WAV container around EXPLICIT 16-bit PCM samples — the fixture
    * builder for closed-form spectral oracles (q185): the caller picks
    * samples whose DFT is analytically known (e.g. tones at bins N/4
    * and N/2, the only bins whose sampled cosines are exactly integer-
    * valued). Samples must fit a signed 16-bit range.
    */
  def makeWavFromPcm(samples: Array[Int], sampleRate: Int = 16000): Array[Byte] = {
    val nSamples = samples.length
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    def putInt(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putShort(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    "RIFF".getBytes.copyToArray(out, 0); putInt(4, 36 + dataLen)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12); putInt(16, 16)
    putShort(20, 1); putShort(22, 1) // PCM, mono
    putInt(24, sampleRate); putInt(28, sampleRate * 2)
    putShort(32, 2); putShort(34, 16) // block align, bits
    "data".getBytes.copyToArray(out, 36); putInt(40, dataLen)
    var i = 0
    while (i < nSamples) {
      val v = samples(i)
      require(v >= -32768 && v <= 32767, s"sample $v exceeds 16-bit range")
      putShort(44 + 2 * i, v & 0xFFFF)
      i += 1
    }
    out
  }

  /** Batch REAL-decode of BMP assets (one mapPartitions pass, like every
    * decode here); fails loudly on non-BMP payloads instead of silently
    * falling back to the stub.
    */
  def bmpFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map(a => decodeBmp(a.asset_id, a.kind, a.data)))
  }

  /** Batch REAL-decode of QOI assets. */
  def qoiFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map(a => Qoi.decode(a.asset_id, a.kind, a.data)))
  }

  /** Content-type sniffing over an opaque binary column — the routing
    * step a 100 TB multimodal ingest runs BEFORE any decoder: magic-byte
    * dispatch as pure `when`-chained column expressions (codegen'd
    * binary-prefix equality, no UDF, no decode attempt, no shuffle).
    * Recognizes the in-repo codec set plus the common crawl container
    * types; anything whose bytes decode as printable UTF-8 falls through
    * to `text/plain`, the rest to `application/octet-stream`.
    */
  def sniffMime(data: Column): Column = {
    def bytesLit(bs: Int*): Column = lit(bs.map(_.toByte).toArray)
    when(data.isNull, lit(null).cast("string"))
      .when(substring(data, 1, 8) ===
        bytesLit(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A), "image/png")
      .when(substring(data, 1, 3) === bytesLit(0xFF, 0xD8, 0xFF), "image/jpeg")
      .when(substring(data, 1, 4) === bytesLit('G', 'I', 'F', '8'), "image/gif")
      .when(substring(data, 1, 2) === bytesLit('B', 'M'), "image/bmp")
      .when(substring(data, 1, 4) === bytesLit('R', 'I', 'F', 'F') &&
        substring(data, 9, 4) === bytesLit('W', 'A', 'V', 'E'), "audio/wav")
      .when(substring(data, 1, 4) === bytesLit('q', 'o', 'i', 'f'), "image/qoi")
      .when(substring(data, 1, 5) === bytesLit('%', 'P', 'D', 'F', '-'),
        "application/pdf")
      .when(substring(data, 1, 2) === bytesLit(0x1F, 0x8B), "application/gzip")
      .when(substring(data, 1, 4) === bytesLit('P', 'K', 0x03, 0x04),
        "application/zip")
      // printable-ASCII check on the HEX of the bytes (09/0A/0D/20–7E
      // pairs): `decode(_, 'UTF-8')` throws on invalid sequences under
      // ANSI, so the router must never attempt a character decode
      .when(hex(data).rlike("^(09|0A|0D|[2-6][0-9A-F]|7[0-9A-E])*$"),
        "text/plain")
      .otherwise("application/octet-stream")
  }

  /** Character-encoding sniff over an opaque binary column — the router
    * a text-ingest runs before any `decode(…, 'UTF-8')` (which throws
    * under ANSI on undeclared Latin-1): BOM dispatch first, then an
    * exact UTF-8 well-formedness check as a regex over the payload HEX
    * (pure column expressions, codegen'd, no decode attempt — the
    * [[sniffMime]] technique). Labels:
    *
    *  - `utf-8-bom` / `utf-16le` / `utf-16be`: BOM present (UTF-16 LE
    *    checked before the UTF-8 validity test — FF can never start a
    *    well-formed UTF-8 sequence);
    *  - `ascii`: every byte ≤ 0x7F;
    *  - `utf-8`: well-formed multibyte UTF-8 (RFC 3629 table: C2–DF,
    *    E0/ED half-ranges, F0/F4 quarter-ranges — overlongs and
    *    surrogates REJECTED);
    *  - `binary`: anything else (Latin-1 high bytes land here, as they
    *    must: single high bytes are indistinguishable from binary
    *    without a language model).
    */
  def sniffCharset(data: Column): Column = {
    def bytesLit(bs: Int*): Column = lit(bs.map(_.toByte).toArray)
    val asciiPair = "[0-7][0-9A-F]"
    val cont = "[89AB][0-9A-F]"
    val utf8Seq = s"(?:$asciiPair" +
      s"|(?:C[2-9A-F]|D[0-9A-F])$cont" +
      s"|E0[9AB][0-9A-F]$cont" +                 // E0 A0–BF: no overlongs
      s"|(?:E[1-9ABCEF])$cont$cont" +            // E1–EC, EE, EF
      s"|ED[89][0-9A-F]$cont" +                  // ED 80–9F: no surrogates
      s"|F0[9AB][0-9A-F]$cont$cont" +            // F0 90–BF
      s"|F[1-3]$cont$cont$cont" +
      s"|F48[0-9A-F]$cont$cont)"                 // F4 80–8F: ≤ U+10FFFF
    when(data.isNull, lit(null).cast("string"))
      .when(substring(data, 1, 3) === bytesLit(0xEF, 0xBB, 0xBF), "utf-8-bom")
      .when(substring(data, 1, 2) === bytesLit(0xFF, 0xFE), "utf-16le")
      .when(substring(data, 1, 2) === bytesLit(0xFE, 0xFF), "utf-16be")
      .when(hex(data).rlike(s"^(?:$asciiPair)*$$"), "ascii")
      .when(hex(data).rlike(s"^$utf8Seq*$$"), "utf-8")
      .otherwise("binary")
  }

  /** Batch REAL-decode of WAV assets. */
  def wavFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map(a => decodeWav(a.asset_id, a.data)))
  }

  /** 16-bit PCM samples of a plain PCM WAV (format 1) — the raw
    * sample-domain view [[Spectral]] consumes. Same chunk-walk
    * validation stance as [[decodeWav]], restricted to the one format
    * where "the samples" is well-defined without a decoder state
    * machine.
    */
  private[ext] def wavPcm(data: Array[Byte]): Array[Int] = {
    require(data.length >= 44 &&
      data(0) == 'R' && data(1) == 'I' && data(2) == 'F' && data(3) == 'F' &&
      data(8) == 'W' && data(9) == 'A' && data(10) == 'V' && data(11) == 'E',
      "not a WAV payload")
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= data.length && (!fmtOk || dataOff < 0)) {
      val id = new String(data.slice(off, off + 4), "US-ASCII")
      val len = leInt(data, off + 4)
      require(len >= 0 && off + 8 + len.toLong <= data.length,
        s"malformed WAV chunk '$id' (len=$len at offset $off)")
      if (id == "fmt ") {
        require(len >= 16, s"malformed WAV fmt chunk (len=$len)")
        require(leShort(data, off + 8) == 1, "wavPcm requires 16-bit PCM")
        require(leShort(data, off + 22) == 16, "wavPcm requires 16-bit PCM")
        fmtOk = true
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = len
      }
      off += 8 + len + (len & 1)
    }
    require(fmtOk && dataOff >= 0, "WAV missing fmt/data chunk")
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = (leShort(data, dataOff + 2 * i) << 16) >> 16 // sign-extend
      i += 1
    }
    out
  }

  /** Silence-trim summary of one PCM asset: total frame count, the
    * first/last frame whose exact-integer energy exceeds the threshold
    * (None when the whole asset is silent), the active frame count and
    * the active-region energy sum.
    */
  final case class SilenceTrim(asset_id: Long, n_frames: Int,
                               first_active: Option[Int],
                               last_active: Option[Int],
                               n_active_frames: Int,
                               active_sum_sq: Long)

  /** Leading/trailing-silence trimming over 16-bit PCM WAV assets — the
    * first edit a speech-corpus curation pass makes (dead air at the
    * ends of a recording is storage + training-token waste, and
    * length-based quality heuristics mis-rank untrimmed audio). Frames
    * of `frameSamples` samples are ACTIVE when their exact integer Σs²
    * exceeds `thresholdSumSq` (default 0: any nonzero sample); the
    * output is the per-asset active span — deterministic BIGINT
    * arithmetic end to end, so the whole operator replays in SQL when
    * the sample series has a closed form (gate q189).
    *
    * Same mapPartitions decoder-batch shape as [[wavFrameEnergy]]; one
    * summary row per asset, payload never shuffles.
    */
  def trimSilence(assets: Dataset[Asset], frameSamples: Int = 160,
                  thresholdSumSq: Long = 0L): Dataset[SilenceTrim] = {
    require(frameSamples > 0, s"frameSamples must be positive, got $frameSamples")
    require(thresholdSumSq >= 0, s"threshold must be >= 0, got $thresholdSumSq")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val pcm = wavPcm(a.data)
      val nFrames = (pcm.length + frameSamples - 1) / frameSamples
      var first = -1
      var last = -1
      var nActive = 0
      var activeSum = 0L
      var f = 0
      while (f < nFrames) {
        val start = f * frameSamples
        val end = math.min(start + frameSamples, pcm.length)
        var e = 0L
        var i = start
        while (i < end) { e += pcm(i).toLong * pcm(i); i += 1 }
        if (e > thresholdSumSq) {
          if (first < 0) first = f
          last = f
          nActive += 1
          activeSum += e
        }
        f += 1
      }
      SilenceTrim(a.asset_id, nFrames,
        if (first < 0) None else Some(first),
        if (last < 0) None else Some(last),
        nActive, activeSum)
    })
  }

  /** [[makeWav]]'s sample series with `lead` leading and `trail`
    * trailing SILENT frames (frame size 160) — the controlled input for
    * the silence-trim gate; the non-silent samples keep makeWav's
    * closed form so an external engine replays every frame energy.
    */
  def makeWavPadded(seed: Long, nSamples: Int, lead: Int, trail: Int,
                    frameSamples: Int = 160): Array[Byte] = {
    val nFrames = (nSamples + frameSamples - 1) / frameSamples
    val raw = makeWav(seed, nSamples)
    // zero out the padded frames in the data section (offset 44)
    var i = 0
    while (i < nSamples) {
      val f = i / frameSamples
      if (f < lead || f >= nFrames - trail) {
        raw(44 + 2 * i) = 0
        raw(44 + 2 * i + 1) = 0
      }
      i += 1
    }
    raw
  }

  /** One fixed-size analysis frame of a PCM asset: exact-integer energy
    * (Σs², BIGINT — order-free, oracle-replayable) plus the derived
    * frame RMS. The last frame of an asset may be short (`n_in_frame`).
    */
  final case class AudioFrame(asset_id: Long, frame_idx: Int,
                              n_in_frame: Int, sum_sq: Long, rms: Double)

  /** Windowed frame energy over 16-bit PCM WAV assets — the primitive
    * under voice-activity detection, silence trimming, and segment-level
    * speech-corpus curation: one output row per `frameSamples`-sized
    * frame (default 160 = 20 ms @ 8 kHz). Exact integer Σs² per frame;
    * rms = √(Σs²/n)/32768 derives deterministically (correctly-rounded
    * sqrt). PCM only: frame boundaries on compressed streams depend on
    * decoder state, which belongs to [[decodeWav]]'s whole-asset path.
    *
    * Scale shape: the same mapPartitions batch walk as every decoder
    * here — one task emits ~payload/2/frameSamples rows per asset, so
    * the explode happens map-side and never shuffles payload bytes.
    */
  def wavFrameEnergy(assets: Dataset[Asset],
                     frameSamples: Int = 160): Dataset[AudioFrame] = {
    require(frameSamples > 0, s"frameSamples must be positive, got $frameSamples")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.flatMap { a =>
      val data = a.data
      require(data.length >= 44 &&
        data(0) == 'R' && data(1) == 'I' && data(2) == 'F' && data(3) == 'F',
        "not a WAV payload")
      var off = 12
      var fmtOk = false
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= data.length && (!fmtOk || dataOff < 0)) {
        val id = new String(data.slice(off, off + 4), "US-ASCII")
        val len = leInt(data, off + 4)
        require(len >= 0 && off + 8 + len.toLong <= data.length,
          s"malformed WAV chunk '$id' (len=$len at offset $off)")
        if (id == "fmt ") {
          require(len >= 16, s"malformed WAV fmt chunk (len=$len)")
          require(leShort(data, off + 8) == 1,
            "wavFrameEnergy requires 16-bit PCM")
          require(leShort(data, off + 22) == 16,
            "wavFrameEnergy requires 16-bit PCM")
          fmtOk = true
        } else if (id == "data") {
          dataOff = off + 8
          dataLen = len
        }
        off += 8 + len + (len & 1)
      }
      require(fmtOk && dataOff >= 0, "WAV missing fmt/data chunk")
      val nSamples = dataLen / 2
      val nFrames = (nSamples + frameSamples - 1) / frameSamples
      (0 until nFrames).iterator.map { f =>
        val start = f * frameSamples
        val n = math.min(frameSamples, nSamples - start)
        var sumSq = 0L
        var i = 0
        while (i < n) {
          val s = leShort(data, dataOff + 2 * (start + i)).toShort.toInt
          sumSq += s.toLong * s
          i += 1
        }
        AudioFrame(a.asset_id, f, n,
          sumSq, math.sqrt(sumSq.toDouble / n) / 32768.0)
      }
    })
  }

  /** STUB decoder: deterministic features derived from the payload bytes
    * (length, first/last byte). Stands in for a real codec so the batch
    * plumbing and downstream aggregations are testable and
    * oracle-verifiable.
    */
  def fakeDecode(assetId: Long, kind: String, data: Array[Byte]): ImageFeatures = {
    val n = data.length
    val first = if (n > 0) data(0) & 0xFF else 0
    val last = if (n > 0) data(n - 1) & 0xFF else 0
    val width = 16 + (n % 240)
    val height = 16 + ((first * 7 + last) % 240)
    val meanLuma = ((width.toLong * height) % 251).toDouble / 250.0
    ImageFeatures(assetId, kind, n.toLong, width, height, 3, meanLuma)
  }

  /** Batch feature extraction: one `mapPartitions` pass, codec state (here
    * trivially none; in a real codec, the decoder instance) initialized
    * once per partition and reused across the batch.
    */
  def extractImageFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      // per-partition init happens HERE (decoder, buffers) — once per task
      batch.map(a => fakeDecode(a.asset_id, a.kind, a.data))
    }
  }

  /** Column-API convenience over a packed DataFrame. */
  def imageFeatures(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    extractImageFeatures(packed.as[Asset]).toDF()
  }

  /** Resize output: original + target-box-fitted dimensions. */
  final case class ResizedImage(
      asset_id: Long, width: Int, height: Int,
      out_width: Int, out_height: Int, out_bytes: Long)

  /** Aspect-preserving resize into a target box — the standard
    * vision-pipeline normalization step. The PIXEL work is stubbed (no
    * codecs here); the dimension math, batch shape, and schema are the
    * real contract: scale = min(tw/w, th/h), floor, clamp to >= 1.
    */
  def resizeToBox(assets: Dataset[Asset], targetW: Int = 224,
                  targetH: Int = 224): Dataset[ResizedImage] = {
    require(targetW > 0 && targetH > 0, "target box must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val f = fakeDecode(a.asset_id, a.kind, a.data)
        val scale = math.min(targetW.toDouble / f.width, targetH.toDouble / f.height)
        val ow = math.max(1, math.floor(f.width * scale).toInt)
        val oh = math.max(1, math.floor(f.height * scale).toInt)
        ResizedImage(a.asset_id, f.width, f.height, ow, oh, ow.toLong * oh * 3)
      }
    }
  }

  /** Extracted audio-ish features (what a real decoder would emit). */
  final case class AudioFeatures(
      asset_id: Long, n_bytes: Long, n_samples: Long,
      duration_ms: Long, rms: Double)

  /** STUB audio decode: deterministic features from payload bytes —
    * 16-bit mono PCM fiction (2 bytes/sample @ 16 kHz). Same role as
    * `fakeDecode`: real codec swaps in behind the signature, plumbing and
    * oracle stay valid.
    */
  def audioFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val n = a.data.length
        val first = if (n > 0) a.data(0) & 0xFF else 0
        val last = if (n > 0) a.data(n - 1) & 0xFF else 0
        val samples = n.toLong / 2
        AudioFeatures(a.asset_id, n.toLong, samples,
          samples / 16, ((first * 31 + last) % 1000).toDouble / 1000.0)
      }
    }
  }

  /** Frame sampling for video-kind assets: emit every `everyMs` offset up
    * to a stub duration derived from payload size (real pipeline: container
    * metadata). One row per frame, hash = deterministic frame fingerprint.
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L): Dataset[FrameSample] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.flatMap { a =>
      val durationMs = (a.data.length % 10) * 1000L + 1000L // STUB duration
      val n = (durationMs / everyMs).toInt
      (0 until n).iterator.map { i =>
        val off = i * everyMs
        FrameSample(a.asset_id, i, off,
          a.data.length.toLong * 1315423911L + off) // stub frame hash
      }
    }
  }
}
