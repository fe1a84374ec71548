package graft.ext

/** Pure-JVM baseline JPEG (ITU-T T.81 sequential DCT, Huffman): decoder
  * and a deterministic test encoder. No codec library — marker walk,
  * DQT/DHT/SOF0/SOS/DRI parse, canonical Huffman entropy decode with
  * byte-unstuffing and restart markers, dequantize + de-zigzag,
  * double-precision IDCT, nearest-neighbor chroma upsample, JFIF
  * YCbCr→RGB. Supports 8-bit baseline, 1 (grayscale) or 3 (YCbCr)
  * components, sampling factors 1 and 2 (4:4:4, 4:2:2, 4:2:0).
  * Progressive (SOF2), 12-bit, arithmetic coding, and CMYK fail loudly
  * with named reasons — corrupt or exotic web payloads must be a
  * quarantinable per-row error, never a silent wrong number.
  *
  * Determinism: all transcendentals go through StrictMath (fdlibm —
  * bit-identical on every JVM), so decoded pixels are reproducible
  * across machines. On DC-only blocks (the gate's closed-form images)
  * the IDCT collapses to F(0,0)/8 up to one ulp, so integer targets
  * round exactly — the q107 oracle recomputes mean luma in closed form.
  *
  * Performance note: the IDCT is the direct separable double-precision
  * form (a readable reference, ~2k flops/block); a production hot path
  * would swap in AAN fixed-point behind the same signature. Decode runs
  * inside `mapPartitions` batches like every decoder here, so the
  * per-block cost parallelizes across the corpus scan.
  */
object Jpeg {

  /** Decoded image summary: dimensions, source channel count, and the
    * exact-integer Rec.601 luma milli-sum over decoded RGB (the
    * decodeBmp/decodePng convention).
    */
  final case class Decoded(width: Int, height: Int, channels: Int,
                           lumaMilli: Long)

  // JPEG zigzag scan order: scan index -> natural (row-major) index
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cosT(x)(u) = cos((2x+1)·u·π/16); StrictMath for JVM-independence
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }
  private val InvSqrt2 = 1.0 / StrictMath.sqrt(2.0)

  // ------------------------------------------------------------ decoder

  /** Canonical Huffman table (T.81 annex C): counts per code length +
    * symbols in code order.
    */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    require(counts.length == 16, "DHT needs 16 length counts")
    require(symbols.length == counts.sum, "DHT symbol count mismatch")
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        code = (code << 1) | br.nextBit()
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return symbols(valPtr(l) + code - minCode(l))
        l += 1
      }
      throw new IllegalArgumentException("invalid JPEG Huffman code")
    }
  }

  /** MSB-first bit reader over the entropy-coded segment, with FF00
    * unstuffing. Any bare marker mid-stream fails loudly (restart
    * markers are consumed at the MCU loop, byte-aligned, not here).
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    def align(): Unit = { bitBuf = 0; bitCnt = 0 }
    def nextBit(): Int = {
      if (bitCnt == 0) {
        require(pos < data.length, "JPEG entropy stream truncated")
        val b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          require(pos < data.length, "JPEG entropy stream truncated at FF")
          val m = data(pos) & 0xFF
          require(m == 0x00,
            f"unexpected marker FF$m%02X inside entropy data")
          pos += 1 // stuffed zero: the data byte is FF
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
  }

  /** T.81 F.2.2.1 EXTEND: map the `s` received bits to the signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
    var pred: Int = 0
  }

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  /** Decode a baseline JPEG to [[Decoded]]. */
  def decode(data: Array[Byte]): Decoded = {
    require(data.length >= 4 &&
      (data(0) & 0xFF) == 0xFF && (data(1) & 0xFF) == 0xD8,
      "not a JPEG payload")
    val qt = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var off = 2
    var scanStart = -1

    while (scanStart < 0) {
      require(off + 4 <= data.length, "JPEG truncated before SOS")
      require((data(off) & 0xFF) == 0xFF,
        f"expected marker at offset $off, got ${data(off) & 0xFF}%02X")
      val marker = data(off + 1) & 0xFF
      val len = u16(data, off + 2)
      require(len >= 2 && off + 2 + len <= data.length,
        f"malformed JPEG segment FF$marker%02X (len=$len)")
      val seg = off + 4
      marker match {
        case 0xDB => // DQT: one or more tables
          var p = seg
          while (p < off + 2 + len) {
            val pq = (data(p) & 0xF0) >> 4
            val tq = data(p) & 0x0F
            require(pq == 0, "only 8-bit quantization tables supported here")
            require(tq <= 3, s"bad DQT table id $tq")
            require(p + 65 <= off + 2 + len, "DQT truncated")
            qt(tq) = Array.tabulate(64)(i => data(p + 1 + i) & 0xFF)
            p += 65
          }
        case 0xC4 => // DHT: one or more tables
          var p = seg
          while (p < off + 2 + len) {
            val tc = (data(p) & 0xF0) >> 4
            val th = data(p) & 0x0F
            require(tc <= 1 && th <= 3, s"bad DHT table class/id $tc/$th")
            val counts = Array.tabulate(16)(i => data(p + 1 + i) & 0xFF)
            val n = counts.sum
            require(p + 17 + n <= off + 2 + len, "DHT truncated")
            val symbols = Array.tabulate(n)(i => data(p + 17 + i) & 0xFF)
            val h = new Huff(counts, symbols)
            if (tc == 0) dcTables(th) = h else acTables(th) = h
            p += 17 + n
          }
        case 0xC0 => // SOF0 baseline
          require(data(seg) == 8, "only 8-bit precision supported here")
          height = u16(data, seg + 1)
          width = u16(data, seg + 3)
          val nc = data(seg + 5) & 0xFF
          require(width > 0 && height > 0, s"malformed dimensions ${width}x$height")
          require(width.toLong * height <= (1L << 28),
            s"JPEG frame too large: ${width}x$height")
          require(nc == 1 || nc == 3,
            s"only grayscale/YCbCr supported here ($nc components)")
          comps = Array.tabulate(nc) { i =>
            val p = seg + 6 + 3 * i
            val c = Component(data(p) & 0xFF,
              (data(p + 1) & 0xF0) >> 4, data(p + 1) & 0x0F, data(p + 2) & 0x0F)
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"sampling factor ${c.h}x${c.v} not supported here")
            c
          }
        case 0xC2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) not supported here")
        case m if m >= 0xC1 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          throw new IllegalArgumentException(
            f"JPEG SOF type FF$m%02X not supported here (baseline only)")
        case 0xCC => throw new IllegalArgumentException(
          "arithmetic-coded JPEG not supported here")
        case 0xDD =>
          restartInterval = u16(data, seg)
        case 0xDA => // SOS
          require(comps != null, "JPEG SOS before SOF")
          val ns = data(seg) & 0xFF
          require(ns == comps.length, "SOS component count mismatch")
          (0 until ns).foreach { i =>
            val cid = data(seg + 1 + 2 * i) & 0xFF
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"SOS references unknown component $cid"))
            c.dcTable = (data(seg + 2 + 2 * i) & 0xF0) >> 4
            c.acTable = data(seg + 2 + 2 * i) & 0x0F
          }
          scanStart = off + 2 + len
        case _ => () // APPn, COM, ... skipped
      }
      off += 2 + len
    }

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH

    // per-component pixel planes at the component's own resolution,
    // padded to the MCU grid
    val planes = comps.map { c =>
      new Array[Int](mcusX * c.h * 8 * mcusY * c.v * 8)
    }
    val planeW = comps.map(c => mcusX * c.h * 8)

    comps.foreach { c =>
      require(qt(c.tq) != null, s"component ${c.id} references missing DQT ${c.tq}")
    }

    val br = new BitReader(data, scanStart)
    val block = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-aligned RSTn between restart intervals; predictors reset.
        // T.81 B.1.1.2: any marker may be preceded by FF fill bytes
        br.align()
        while (br.pos + 2 < data.length && (data(br.pos) & 0xFF) == 0xFF &&
          (data(br.pos + 1) & 0xFF) == 0xFF) br.pos += 1
        require(br.pos + 2 <= data.length &&
          (data(br.pos) & 0xFF) == 0xFF &&
          (data(br.pos + 1) & 0xFF) >= 0xD0 && (data(br.pos + 1) & 0xFF) <= 0xD7,
          s"expected restart marker before MCU $mcu")
        br.pos += 2
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val dcT = dcTables(c.dcTable)
        val acT = acTables(c.acTable)
        require(dcT != null && acT != null,
          s"component ${c.id} references missing DHT")
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(block, 0)
            // DC
            val s = dcT.decode(br)
            require(s <= 11, s"bad DC category $s")
            c.pred += extend(br.receive(s), s)
            block(0) = c.pred
            // AC
            var k = 1
            while (k < 64) {
              val rs = acT.decode(br)
              val r = (rs & 0xF0) >> 4
              val sz = rs & 0x0F
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                require(k < 64, "AC run past end of block")
                block(k) = extend(br.receive(sz), sz)
                k += 1
              }
            }
            idctInto(block, qt(c.tq),
              planes(ci), planeW(ci),
              (mx * c.h + bx) * 8, (my * c.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // luma sum over the true (unpadded) pixel grid
    var lumaMilli = 0L
    val gray = comps.length == 1
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (gray) {
          lumaMilli += 1000L * planes(0)(y * planeW(0) + x)
        } else {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.h / hMax
            val sy = y * c.v / vMax
            planes(ci)(sy * planeW(ci) + sx)
          }
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          val r = clamp255(StrictMath.round(yy + 1.402 * cr).toInt)
          val g = clamp255(StrictMath.round(yy - 0.344136 * cb - 0.714136 * cr).toInt)
          val b = clamp255(StrictMath.round(yy + 1.772 * cb).toInt)
          lumaMilli += 299L * r + 587L * g + 114L * b
        }
        x += 1
      }
      y += 1
    }
    Decoded(width, height, comps.length, lumaMilli)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Dequantize (zigzag-ordered coefficients × zigzag-ordered table),
    * IDCT, level-shift, clamp, write the 8×8 block into the plane.
    */
  private def idctInto(zz: Array[Int], qtab: Array[Int],
                       plane: Array[Int], planeW: Int,
                       px: Int, py: Int): Unit = {
    val f = new Array[Double](64)
    var i = 0
    while (i < 64) { f(Zigzag(i)) = zz(i).toDouble * qtab(i); i += 1 }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          var u = 0
          var row = 0.0
          while (u < 8) {
            val cu = if (u == 0) InvSqrt2 else 1.0
            row += cu * f(v * 8 + u) * CosT(x)(u)
            u += 1
          }
          s += cv * row * CosT(y)(v)
          v += 1
        }
        plane((py + y) * planeW + px + x) =
          clamp255(StrictMath.round(0.25 * s + 128.0).toInt)
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------- deterministic encoder

  // Annex K (K.3.1/K.3.2) standard DC Huffman tables — public spec data
  private val StdDcLumaCounts =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcLumaSymbols = (0 to 11).toArray
  private val StdDcChromaCounts =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val StdDcChromaSymbols = (0 to 11).toArray
  // minimal AC table: EOB (0x00) code "0", ZRL (0xF0) code "10", and the
  // (run=0, size=1..8) codes — supports test patterns whose nonzero ACs
  // are adjacent or separated by exact multiples of 16 zeros, with
  // |value| <= 255; anything else fails loudly in encodeBlock
  private val TestAcCounts =
    Array(1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0)
  private val TestAcSymbols =
    Array(0x00, 0xF0, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08)

  private def canonicalCodes(counts: Array[Int], symbols: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < counts(l - 1)) {
        out(symbols(k)) = (code, l)
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    out.toMap
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xFF) out.write(0x00) // byte stuffing
          buf = 0
          cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 convention). */
    def flush(): Unit = if (cnt > 0) { put((1 << (8 - cnt)) - 1, 8 - cnt) }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode one block's coefficients (zigzag order, QUANTIZED values):
    * DC diff + run-length AC through the given code maps.
    */
  private def encodeBlock(bw: BitWriter, zz: Array[Int], pred: Int,
                          dcCodes: Map[Int, (Int, Int)],
                          acCodes: Map[Int, (Int, Int)]): Int = {
    val diff = zz(0) - pred
    val s = category(diff)
    val (dcCode, dcLen) = dcCodes(s)
    bw.put(dcCode, dcLen)
    if (s > 0) bw.put(if (diff < 0) diff - 1 + (1 << s) else diff, s)
    var k = 1
    var run = 0
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run >= 16) { val (c, l) = acCodes(0xF0); bw.put(c, l); run -= 16 }
        val sz = category(zz(k))
        require(acCodes.contains((run << 4) | sz),
          s"test AC table lacks (run=$run, size=$sz): nonzero ACs must be " +
            "adjacent or 16-zero-separated, |value| <= 255")
        val (c, l) = acCodes((run << 4) | sz)
        bw.put(c, l)
        bw.put(if (zz(k) < 0) zz(k) - 1 + (1 << sz) else zz(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acCodes(0x00); bw.put(c, l) }
    zz(0)
  }

  /** Deterministic baseline JPEG: a grid of flat 8×8 blocks with gray
    * value v(bx,by) = (seed + bx + by) % 256 — DC-only coefficients with
    * an all-8s quantization table, so each decoded pixel equals its
    * block value EXACTLY (IDCT of a DC-only block is F(0,0)/8, and
    * (v−128)·8·8/8 + 128 = v) and the mean luma has the same closed form
    * as `makeBmp`/`makePng`. Modes: grayscale (1 component), YCbCr
    * 4:4:4, or 4:2:0 (flat chroma 128 → RGB = Y exactly; blocksX/Y must
    * be even for 4:2:0). Optional `restartEvery` writes DRI + RSTn
    * markers to exercise the restart path.
    */
  def makeJpeg(seed: Long, blocksX: Int, blocksY: Int,
               mode: String = "gray", restartEvery: Int = 0): Array[Byte] = {
    require(blocksX > 0 && blocksY > 0, "block grid must be positive")
    require(Set("gray", "444", "420").contains(mode), s"unknown mode $mode")
    require(mode != "420" || (blocksX % 2 == 0 && blocksY % 2 == 0),
      "4:2:0 needs an even block grid")
    val width = blocksX * 8
    val height = blocksY * 8
    def blockVal(bx: Int, by: Int): Int =
      (((seed + bx + by) % 256 + 256) % 256).toInt

    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xFF); out.write(marker)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      body.foreach(b => out.write(b & 0xFF))
    }
    out.write(0xFF); out.write(0xD8) // SOI
    seg(0xDB, 0 +: Array.fill(64)(8)) // DQT 0: all 8s
    val nc = if (mode == "gray") 1 else 3
    if (nc == 3) seg(0xDB, 1 +: Array.fill(64)(8)) // DQT 1 (chroma)
    val (hy, vy) = if (mode == "420") (2, 2) else (1, 1)
    val sof = Array(8, height >> 8, height & 0xFF, width >> 8, width & 0xFF, nc) ++
      (if (nc == 1) Array(1, 0x11, 0)
       else Array(1, (hy << 4) | vy, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(0xC0, sof)
    seg(0xC4, (0x00 +: StdDcLumaCounts) ++ StdDcLumaSymbols)
    seg(0xC4, (0x10 +: TestAcCounts) ++ TestAcSymbols)
    if (nc == 3) {
      seg(0xC4, (0x01 +: StdDcChromaCounts) ++ StdDcChromaSymbols)
      seg(0xC4, (0x11 +: TestAcCounts) ++ TestAcSymbols)
    }
    if (restartEvery > 0)
      seg(0xDD, Array((restartEvery >> 8) & 0xFF, restartEvery & 0xFF))
    val sos = Array(nc) ++
      (if (nc == 1) Array(1, 0x00)
       else Array(1, 0x00, 2, 0x11, 3, 0x11)) ++ Array(0, 63, 0)
    seg(0xDA, sos)

    val dcLuma = canonicalCodes(StdDcLumaCounts, StdDcLumaSymbols)
    val dcChroma = canonicalCodes(StdDcChromaCounts, StdDcChromaSymbols)
    val ac = canonicalCodes(TestAcCounts, TestAcSymbols)
    val bw = new BitWriter(out)
    val zz = new Array[Int](64)
    var predY = 0
    var predCb = 0
    var predCr = 0
    // MCU grid: gray/444 → 1 block per component per MCU over the 8×8
    // grid; 420 → 2×2 luma blocks + 1 of each chroma over 16×16
    val mcusX = if (mode == "420") blocksX / 2 else blocksX
    val mcusY = if (mode == "420") blocksY / 2 else blocksY
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
        bw.flush()
        out.write(0xFF)
        out.write(0xD0 + ((mcu / restartEvery - 1) % 8))
        predY = 0; predCb = 0; predCr = 0
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      if (mode == "420") {
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            java.util.Arrays.fill(zz, 0)
            zz(0) = blockVal(mx * 2 + bx, my * 2 + by) - 128 // q=8: (v-128)*8/8
            predY = encodeBlock(bw, zz, predY, dcLuma, ac)
            bx += 1
          }
          by += 1
        }
        java.util.Arrays.fill(zz, 0)
        predCb = encodeBlock(bw, zz, predCb, dcChroma, ac)
        predCr = encodeBlock(bw, zz, predCr, dcChroma, ac)
      } else {
        java.util.Arrays.fill(zz, 0)
        zz(0) = blockVal(mx, my) - 128
        predY = encodeBlock(bw, zz, predY, dcLuma, ac)
        if (nc == 3) {
          java.util.Arrays.fill(zz, 0)
          predCb = encodeBlock(bw, zz, predCb, dcChroma, ac)
          java.util.Arrays.fill(zz, 0)
          predCr = encodeBlock(bw, zz, predCr, dcChroma, ac)
        }
      }
      mcu += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Spec-only encoder: one grayscale 8×8-block image from EXPLICIT
    * quantized zigzag coefficient blocks (row-major block order) with an
    * all-`q` quantization table — drives the full AC run/size/ZRL
    * entropy path and the general IDCT, which the flat gate images
    * cannot reach.
    */
  def makeJpegFromCoefficients(blocks: Seq[Array[Int]], blocksX: Int,
                               q: Int = 8): Array[Byte] = {
    require(blocks.nonEmpty && blocks.forall(_.length == 64),
      "need 64-coefficient zigzag blocks")
    require(blocks.length % blocksX == 0, "ragged block grid")
    val blocksY = blocks.length / blocksX
    val width = blocksX * 8
    val height = blocksY * 8
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xFF); out.write(marker)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      body.foreach(b => out.write(b & 0xFF))
    }
    out.write(0xFF); out.write(0xD8)
    seg(0xDB, 0 +: Array.fill(64)(q))
    seg(0xC0, Array(8, height >> 8, height & 0xFF, width >> 8, width & 0xFF,
      1, 1, 0x11, 0))
    seg(0xC4, (0x00 +: StdDcLumaCounts) ++ StdDcLumaSymbols)
    seg(0xC4, (0x10 +: TestAcCounts) ++ TestAcSymbols)
    seg(0xDA, Array(1, 1, 0x00, 0, 63, 0))
    val dc = canonicalCodes(StdDcLumaCounts, StdDcLumaSymbols)
    val ac = canonicalCodes(TestAcCounts, TestAcSymbols)
    val bw = new BitWriter(out)
    var pred = 0
    blocks.foreach { b => pred = encodeBlock(bw, b.clone(), pred, dc, ac) }
    bw.flush()
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  /** Reference spatial decode of one quantized coefficient block — the
    * same dequant/IDCT/shift/clamp the decoder applies, exposed for the
    * spec's coefficient-roundtrip comparison.
    */
  def referenceBlockPixels(zz: Array[Int], q: Int): Array[Int] = {
    val plane = new Array[Int](64)
    idctInto(zz, Array.fill(64)(q), plane, 8, 0, 0)
    plane
  }
}
