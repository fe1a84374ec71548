package graft.ext

/** Pure-JVM JPEG (ITU-T T.81, Huffman): decoder and deterministic test
  * encoders. No codec library — marker walk, DQT/DHT/SOF/SOS/DRI parse,
  * canonical Huffman entropy decode with byte-unstuffing and restart
  * markers, dequantize + de-zigzag, double-precision IDCT,
  * nearest-neighbor chroma upsample, JFIF YCbCr→RGB. Supports 8-bit
  * baseline (SOF0) AND progressive (SOF2) — spectral selection,
  * successive approximation (DC/AC first and refinement scans, EOB
  * runs, correction bits), interleaved DC scans, multi-scan DHT
  * updates — for 1 (grayscale) or 3 (YCbCr) components, sampling
  * factors 1 and 2 (4:4:4, 4:2:2, 4:2:0). 12-bit, arithmetic coding,
  * and CMYK fail loudly with named reasons — corrupt or exotic web
  * payloads must be a quarantinable per-row error, never a silent
  * wrong number.
  *
  * Scale note: baseline decode streams MCU by MCU, but progressive is
  * inherently whole-image (every scan revisits every block), so the
  * decoder holds one Int per coefficient; progressive frames are capped
  * at 2^26 pixels (~64 MP, ~256 MB of coefficients for 4:4:4) so one
  * hostile crawl payload cannot OOM an executor.
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

  /** One SOS header: participating components (in scan order) plus the
    * progressive parameters — spectral band [ss, se] and successive
    * approximation (ah = prior bit position + 1, 0 for a first scan;
    * al = this scan's bit position).
    */
  private final case class ScanHeader(comps: Array[Component],
                                      ss: Int, se: Int, ah: Int, al: Int)

  /** Decode a baseline (SOF0) or progressive (SOF2) JPEG to [[Decoded]]. */
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
    var progressive = false
    var off = 2
    var scanStart = -1
    var firstScan: ScanHeader = null

    def parseDqt(seg: Int, end: Int): Unit = {
      var p = seg
      while (p < end) {
        val pq = (data(p) & 0xF0) >> 4
        val tq = data(p) & 0x0F
        require(pq == 0, "only 8-bit quantization tables supported here")
        require(tq <= 3, s"bad DQT table id $tq")
        require(p + 65 <= end, "DQT truncated")
        qt(tq) = Array.tabulate(64)(i => data(p + 1 + i) & 0xFF)
        p += 65
      }
    }
    def parseDht(seg: Int, end: Int): Unit = {
      var p = seg
      while (p < end) {
        val tc = (data(p) & 0xF0) >> 4
        val th = data(p) & 0x0F
        require(tc <= 1 && th <= 3, s"bad DHT table class/id $tc/$th")
        val counts = Array.tabulate(16)(i => data(p + 1 + i) & 0xFF)
        val n = counts.sum
        require(p + 17 + n <= end, "DHT truncated")
        val symbols = Array.tabulate(n)(i => data(p + 17 + i) & 0xFF)
        val h = new Huff(counts, symbols)
        if (tc == 0) dcTables(th) = h else acTables(th) = h
        p += 17 + n
      }
    }
    def parseSos(seg: Int): ScanHeader = {
      require(comps != null, "JPEG SOS before SOF")
      val ns = data(seg) & 0xFF
      require(ns >= 1 && ns <= comps.length, "bad SOS component count")
      require(progressive || ns == comps.length,
        "baseline SOS must cover every component")
      val scanComps = Array.tabulate(ns) { i =>
        val cid = data(seg + 1 + 2 * i) & 0xFF
        val c = comps.find(_.id == cid).getOrElse(
          throw new IllegalArgumentException(
            s"SOS references unknown component $cid"))
        c.dcTable = (data(seg + 2 + 2 * i) & 0xF0) >> 4
        c.acTable = data(seg + 2 + 2 * i) & 0x0F
        c
      }
      val ss = data(seg + 1 + 2 * ns) & 0xFF
      val se = data(seg + 2 + 2 * ns) & 0xFF
      val ahal = data(seg + 3 + 2 * ns) & 0xFF
      ScanHeader(scanComps, ss, se, (ahal & 0xF0) >> 4, ahal & 0x0F)
    }
    def parseSof(seg: Int, isProgressive: Boolean): Unit = {
      require(data(seg) == 8, "only 8-bit precision supported here")
      progressive = isProgressive
      height = u16(data, seg + 1)
      width = u16(data, seg + 3)
      val nc = data(seg + 5) & 0xFF
      require(width > 0 && height > 0, s"malformed dimensions ${width}x$height")
      require(width.toLong * height <= (1L << 28),
        s"JPEG frame too large: ${width}x$height")
      require(!isProgressive || width.toLong * height <= (1L << 26),
        s"progressive JPEG frame too large: ${width}x$height " +
          "(whole-image coefficient state)")
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
    }

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
        case 0xDB => parseDqt(seg, off + 2 + len)
        case 0xC4 => parseDht(seg, off + 2 + len)
        case 0xC0 | 0xC1 => parseSof(seg, isProgressive = false)
        case 0xC2 => parseSof(seg, isProgressive = true)
        case m if m >= 0xC3 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          throw new IllegalArgumentException(
            f"JPEG SOF type FF$m%02X not supported here " +
              "(baseline/progressive Huffman only)")
        case 0xCC => throw new IllegalArgumentException(
          "arithmetic-coded JPEG not supported here")
        case 0xDD =>
          restartInterval = u16(data, seg)
        case 0xDA =>
          firstScan = parseSos(seg)
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

    /** Byte-aligned RSTn consume (T.81 B.1.1.2 allows FF fill bytes). */
    def expectRestart(br: BitReader, unit: Int): Unit = {
      br.align()
      while (br.pos + 2 < data.length && (data(br.pos) & 0xFF) == 0xFF &&
        (data(br.pos + 1) & 0xFF) == 0xFF) br.pos += 1
      require(br.pos + 2 <= data.length &&
        (data(br.pos) & 0xFF) == 0xFF &&
        (data(br.pos + 1) & 0xFF) >= 0xD0 && (data(br.pos + 1) & 0xFF) <= 0xD7,
        s"expected restart marker before unit $unit")
      br.pos += 2
    }

    if (!progressive) {
      val br = new BitReader(data, scanStart)
      val block = new Array[Int](64)
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          expectRestart(br, mcu)
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
    } else {
      // ---------------------------------------------- progressive scans
      // Whole-image coefficient state, zigzag order, on the padded MCU
      // grid (interleaved DC scans address dummy padding blocks; AC
      // scans traverse only the true per-component block grid).
      val storeW = comps.map(c => mcusX * c.h)
      val coefs = comps.indices.map(i =>
        new Array[Int](storeW(i) * (mcusY * comps(i).v) * 64)).toArray
      val trueBW = comps.map(c => ((width * c.h + hMax - 1) / hMax + 7) / 8)
      val trueBH = comps.map(c => ((height * c.v + vMax - 1) / vMax + 7) / 8)

      /** Decode one scan's entropy segment; returns the end position. */
      def decodeScan(start: Int, scan: ScanHeader): Int = {
        val br = new BitReader(data, start)
        scan.comps.foreach(_.pred = 0)
        var eobrun = 0
        val dcScan = scan.ss == 0
        require(scan.se <= 63 && scan.ss <= scan.se, "bad spectral selection")
        require(!dcScan || scan.se == 0,
          "progressive DC scan must have Se = 0")
        require(dcScan || scan.comps.length == 1,
          "progressive AC scan must be single-component")

        def decodeDc(c: Component, coef: Array[Int], off: Int): Unit =
          if (scan.ah == 0) {
            val dcT = dcTables(c.dcTable)
            require(dcT != null, s"component ${c.id} references missing DHT")
            val s = dcT.decode(br)
            require(s <= 11, s"bad DC category $s")
            c.pred += extend(br.receive(s), s)
            coef(off) = c.pred << scan.al
          } else {
            if (br.nextBit() == 1) coef(off) |= (1 << scan.al)
          }

        def decodeAcFirst(acT: Huff, coef: Array[Int], off: Int): Unit =
          if (eobrun > 0) { eobrun -= 1 }
          else {
            var k = scan.ss
            var stop = false
            while (k <= scan.se && !stop) {
              val rs = acT.decode(br)
              val r = (rs & 0xF0) >> 4
              val sz = rs & 0x0F
              if (sz == 0) {
                if (r != 15) { eobrun = (1 << r) - 1 + br.receive(r); stop = true }
                else k += 16 // ZRL
              } else {
                k += r
                require(k <= scan.se, "AC run past spectral band")
                coef(off + k) = extend(br.receive(sz), sz) << scan.al
                k += 1
              }
            }
          }

        // T.81 G.1.2.3: refinement — correction bits for history-nonzero
        // coefficients ride inline with the position walk
        def refineBit(coef: Array[Int], i: Int, p1: Int, m1: Int): Unit =
          if (br.nextBit() == 1 && (coef(i) & p1) == 0)
            coef(i) = if (coef(i) >= 0) coef(i) + p1 else coef(i) + m1

        def decodeAcRefine(acT: Huff, coef: Array[Int], off: Int): Unit = {
          val p1 = 1 << scan.al
          val m1 = -1 << scan.al
          var k = scan.ss
          if (eobrun == 0) {
            var stop = false
            while (k <= scan.se && !stop) {
              val rs = acT.decode(br)
              var r = (rs & 0xF0) >> 4
              val sz = rs & 0x0F
              var newval = 0
              if (sz == 0) {
                if (r != 15) { eobrun = (1 << r) + br.receive(r); stop = true }
                // r == 15: run over 16 zero-history positions, no new value
              } else {
                require(sz == 1, "AC refinement size must be 1")
                newval = if (br.nextBit() == 1) p1 else m1
              }
              if (!stop) {
                var placed = false
                while (k <= scan.se && !placed) {
                  if (coef(off + k) != 0) refineBit(coef, off + k, p1, m1)
                  else if (r == 0) {
                    if (sz != 0) coef(off + k) = newval
                    placed = true
                  } else r -= 1
                  k += 1
                }
                require(placed || sz == 0, "AC refinement run past band")
              }
            }
          }
          if (eobrun > 0) {
            while (k <= scan.se) {
              if (coef(off + k) != 0) refineBit(coef, off + k, p1, m1)
              k += 1
            }
            eobrun -= 1
          }
        }

        def decodeBlock(ci: Int, c: Component, off: Int): Unit =
          if (dcScan) decodeDc(c, coefs(ci), off)
          else if (scan.ah == 0) {
            val acT = acTables(c.acTable)
            require(acT != null, s"component ${c.id} references missing DHT")
            decodeAcFirst(acT, coefs(ci), off)
          } else {
            val acT = acTables(c.acTable)
            require(acT != null, s"component ${c.id} references missing DHT")
            decodeAcRefine(acT, coefs(ci), off)
          }

        if (scan.comps.length > 1) { // interleaved (DC) scan: MCU order
          var mcu = 0
          val nMcus = mcusX * mcusY
          while (mcu < nMcus) {
            if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
              expectRestart(br, mcu)
              scan.comps.foreach(_.pred = 0)
              eobrun = 0
            }
            val mx = mcu % mcusX
            val my = mcu / mcusX
            scan.comps.foreach { c =>
              val ci = comps.indexWhere(_.id == c.id)
              var by = 0
              while (by < c.v) {
                var bx = 0
                while (bx < c.h) {
                  val blockOff =
                    ((my * c.v + by) * storeW(ci) + mx * c.h + bx) * 64
                  decodeBlock(ci, c, blockOff)
                  bx += 1
                }
                by += 1
              }
            }
            mcu += 1
          }
        } else { // non-interleaved: the component's true block grid
          val c = scan.comps(0)
          val ci = comps.indexWhere(_.id == c.id)
          var b = 0
          val nb = trueBW(ci) * trueBH(ci)
          while (b < nb) {
            if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
              expectRestart(br, b)
              c.pred = 0
              eobrun = 0
            }
            val blockOff =
              ((b / trueBW(ci)) * storeW(ci) + b % trueBW(ci)) * 64
            decodeBlock(ci, c, blockOff)
            b += 1
          }
        }
        require(eobrun == 0, "EOB run past end of scan")
        br.pos
      }

      var scan = firstScan
      var pos = scanStart
      var done = false
      while (!done) {
        pos = decodeScan(pos, scan)
        // marker walk to the next SOS or EOI; DHT/DQT/DRI may update
        var next: ScanHeader = null
        while (next == null && !done) {
          require(pos + 2 <= data.length, "JPEG truncated after scan")
          while ((data(pos) & 0xFF) == 0xFF && pos + 1 < data.length &&
            (data(pos + 1) & 0xFF) == 0xFF) pos += 1 // FF fill bytes
          require((data(pos) & 0xFF) == 0xFF,
            f"expected marker after scan at offset $pos")
          val marker = data(pos + 1) & 0xFF
          if (marker == 0xD9) done = true // EOI
          else {
            val len = u16(data, pos + 2)
            require(len >= 2 && pos + 2 + len <= data.length,
              f"malformed JPEG segment FF$marker%02X (len=$len)")
            val seg = pos + 4
            marker match {
              case 0xDB => parseDqt(seg, pos + 2 + len)
              case 0xC4 => parseDht(seg, pos + 2 + len)
              case 0xDD => restartInterval = u16(data, seg)
              case 0xDA => next = parseSos(seg)
              case m if m >= 0xC0 && m <= 0xCF && m != 0xC4 =>
                throw new IllegalArgumentException(
                  f"unexpected second frame header FF$m%02X")
              case _ => () // APPn, COM
            }
            pos += 2 + len
          }
        }
        if (next != null) scan = next
      }

      // all scans absorbed: dequantize + IDCT the true block grid
      comps.indices.foreach { ci =>
        val c = comps(ci)
        val block = new Array[Int](64)
        var by = 0
        while (by < trueBH(ci)) {
          var bx = 0
          while (bx < trueBW(ci)) {
            System.arraycopy(coefs(ci), (by * storeW(ci) + bx) * 64,
              block, 0, 64)
            idctInto(block, qt(c.tq), planes(ci), planeW(ci), bx * 8, by * 8)
            bx += 1
          }
          by += 1
        }
      }
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
    // the progressive test table is a superset (every run/size pair ≤ 8
    // plus EOB and ZRL), so arbitrary coefficient layouts encode
    seg(0xC4, (0x10 +: ProgAcCounts) ++ ProgAcSymbols)
    seg(0xDA, Array(1, 1, 0x00, 0, 63, 0))
    val dc = canonicalCodes(StdDcLumaCounts, StdDcLumaSymbols)
    val ac = canonicalCodes(ProgAcCounts, ProgAcSymbols)
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

  // --------------------------------------------- progressive test encoder

  /** Progressive test AC table: EOBn (r = 0..14), ZRL, and every
    * (run, size ≤ 8) pair, all at code length 8 — 144 canonical codes,
    * enough for any scan the progressive encoders emit.
    */
  private val ProgAcSymbols: Array[Int] =
    (0 to 14).map(_ << 4).toArray ++ Array(0xF0) ++
      (for (run <- 0 to 15; sz <- 1 to 8) yield (run << 4) | sz)
  private val ProgAcCounts: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 144, 0, 0, 0, 0, 0, 0, 0, 0)

  /** AC point transform (T.81 G.1.2.2): magnitude shift, sign kept. */
  private def acPoint(v: Int, al: Int): Int =
    if (v < 0) -((-v) >> al) else v >> al

  private def putExtendBits(bw: BitWriter, v: Int, s: Int): Unit =
    if (s > 0) bw.put(if (v < 0) v - 1 + (1 << s) else v, s)

  /** Flush an accumulated EOB run as one EOBn code (+ its pending
    * refinement correction bits, emitted in block order — exactly the
    * bits the decoder's EOB-run pass will read).
    */
  private def flushEobRun(bw: BitWriter, ac: Map[Int, (Int, Int)],
                          eob: Int,
                          pendingBits: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    if (eob > 0) {
      var r = 0
      while ((2 << r) <= eob) r += 1 // r = floor(log2(eob)) <= 14
      val (c0, l0) = ac(r << 4)
      bw.put(c0, l0)
      if (r > 0) bw.put(eob - (1 << r), r)
      pendingBits.foreach(bit => bw.put(bit, 1))
      pendingBits.clear()
    }
  }

  /** Deterministic progressive (SOF2) JPEG: same flat DC-only image
    * family as [[makeJpeg]] — gray value v(bx,by) = (seed+bx+by) % 256,
    * all-8s quantization, so decoded pixels equal their block value
    * EXACTLY — but encoded as a progressive scan script: interleaved DC
    * first scan at Al=1, DC refinement to Al=0 (the successive-
    * approximation split: ((x>>1)<<1) | (x&1) = x restores every DC
    * bit-exactly), then one all-EOB-run AC scan per component. Modes:
    * grayscale or YCbCr 4:4:4 (flat chroma 128 → RGB = Y exactly).
    * `restartEvery` (MCUs / blocks per scan) exercises the progressive
    * restart path in every scan kind.
    */
  def makeProgressiveJpeg(seed: Long, blocksX: Int, blocksY: Int,
                          mode: String = "gray",
                          restartEvery: Int = 0): Array[Byte] = {
    require(blocksX > 0 && blocksY > 0, "block grid must be positive")
    require(Set("gray", "444").contains(mode), s"unknown mode $mode")
    val width = blocksX * 8
    val height = blocksY * 8
    val nc = if (mode == "gray") 1 else 3
    def blockVal(bx: Int, by: Int): Int =
      (((seed + bx + by) % 256 + 256) % 256).toInt
    def dcOf(ci: Int, b: Int): Int =
      if (ci > 0) 0 else blockVal(b % blocksX, b / blocksX) - 128

    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xFF); out.write(marker)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      body.foreach(b => out.write(b & 0xFF))
    }
    out.write(0xFF); out.write(0xD8) // SOI
    seg(0xDB, 0 +: Array.fill(64)(8))
    if (nc == 3) seg(0xDB, 1 +: Array.fill(64)(8))
    val sof = Array(8, height >> 8, height & 0xFF, width >> 8, width & 0xFF, nc) ++
      (if (nc == 1) Array(1, 0x11, 0)
       else Array(1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(0xC2, sof)
    seg(0xC4, (0x00 +: StdDcLumaCounts) ++ StdDcLumaSymbols)
    if (nc == 3) seg(0xC4, (0x01 +: StdDcChromaCounts) ++ StdDcChromaSymbols)
    seg(0xC4, (0x10 +: ProgAcCounts) ++ ProgAcSymbols)
    if (restartEvery > 0)
      seg(0xDD, Array((restartEvery >> 8) & 0xFF, restartEvery & 0xFF))
    val dcLuma = canonicalCodes(StdDcLumaCounts, StdDcLumaSymbols)
    val dcChroma = canonicalCodes(StdDcChromaCounts, StdDcChromaSymbols)
    val ac = canonicalCodes(ProgAcCounts, ProgAcSymbols)
    val nBlocks = blocksX * blocksY
    val dcScanComps =
      if (nc == 1) Array(Array(1, 0x00))
      else Array(Array(1, 0x00), Array(2, 0x10), Array(3, 0x10))

    def restartIfDue(bw: BitWriter, unit: Int, rst: Int,
                     reset: () => Unit): Int =
      if (restartEvery > 0 && unit > 0 && unit % restartEvery == 0) {
        bw.flush()
        out.write(0xFF); out.write(0xD0 + (rst % 8))
        reset()
        rst + 1
      } else rst

    // 1. interleaved DC first scan, Al = 1 (arithmetic shift per G.1.2.1)
    seg(0xDA, Array(nc) ++ dcScanComps.flatten ++ Array(0, 0, 0x01))
    locally {
      val bw = new BitWriter(out)
      val preds = new Array[Int](nc)
      var rst = 0
      var b = 0
      while (b < nBlocks) {
        rst = restartIfDue(bw, b, rst, () => java.util.Arrays.fill(preds, 0))
        var ci = 0
        while (ci < nc) {
          val v = dcOf(ci, b) >> 1
          val diff = v - preds(ci)
          preds(ci) = v
          val s = category(diff)
          val (c0, l0) = (if (ci == 0) dcLuma else dcChroma)(s)
          bw.put(c0, l0)
          putExtendBits(bw, diff, s)
          ci += 1
        }
        b += 1
      }
      bw.flush()
    }
    // 2. interleaved DC refinement scan, Ah=1 → Al=0: one bit per block
    seg(0xDA, Array(nc) ++ dcScanComps.flatten ++ Array(0, 0, 0x10))
    locally {
      val bw = new BitWriter(out)
      var rst = 0
      var b = 0
      while (b < nBlocks) {
        rst = restartIfDue(bw, b, rst, () => ())
        var ci = 0
        while (ci < nc) { bw.put(dcOf(ci, b) & 1, 1); ci += 1 }
        b += 1
      }
      bw.flush()
    }
    // 3. one AC first scan per component (1..63, Al=0): pure EOB runs
    (1 to nc).foreach { cid =>
      seg(0xDA, Array(1, cid, if (cid == 1) 0x00 else 0x10, 1, 63, 0x00))
      val bw = new BitWriter(out)
      val noBits = scala.collection.mutable.ArrayBuffer.empty[Int]
      var eob = 0
      var rst = 0
      var b = 0
      while (b < nBlocks) {
        if (restartEvery > 0 && b > 0 && b % restartEvery == 0) {
          flushEobRun(bw, ac, eob, noBits); eob = 0
          bw.flush()
          out.write(0xFF); out.write(0xD0 + (rst % 8))
          rst += 1
        }
        eob += 1
        if (eob == 0x4000) { flushEobRun(bw, ac, eob, noBits); eob = 0 }
        b += 1
      }
      flushEobRun(bw, ac, eob, noBits)
      bw.flush()
    }
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Spec-only progressive encoder: one grayscale image from EXPLICIT
    * quantized zigzag coefficient blocks (row-major block order, all-`q`
    * quantization), emitted as a full progressive scan script — DC
    * first (Al=1) + DC refinement, then per spectral band [1, bandSplit]
    * and [bandSplit+1, 63]: an AC first scan at Al=`acAl` followed by
    * successive-approximation refinement scans down to Al=0. Drives
    * every progressive decode path the flat gate images cannot reach:
    * run/size codes and ZRL inside banded first scans, EOB-run
    * accumulation across blocks, newly-significant coefficients and
    * history correction bits in refinement scans.
    */
  def makeProgressiveJpegFromCoefficients(blocks: Seq[Array[Int]],
                                          blocksX: Int, q: Int = 8,
                                          bandSplit: Int = 5,
                                          acAl: Int = 1): Array[Byte] = {
    require(blocks.nonEmpty && blocks.forall(_.length == 64),
      "need 64-coefficient zigzag blocks")
    require(blocks.length % blocksX == 0, "ragged block grid")
    require(bandSplit >= 1 && bandSplit < 63, "bandSplit must be in [1, 62]")
    require(acAl >= 0 && acAl <= 3, "acAl must be in [0, 3]")
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
    seg(0xC2, Array(8, height >> 8, height & 0xFF, width >> 8, width & 0xFF,
      1, 1, 0x11, 0))
    seg(0xC4, (0x00 +: StdDcLumaCounts) ++ StdDcLumaSymbols)
    seg(0xC4, (0x10 +: ProgAcCounts) ++ ProgAcSymbols)
    val dc = canonicalCodes(StdDcLumaCounts, StdDcLumaSymbols)
    val ac = canonicalCodes(ProgAcCounts, ProgAcSymbols)

    // DC first (Al=1): arithmetic-shift point transform, diff-coded
    seg(0xDA, Array(1, 1, 0x00, 0, 0, 0x01))
    locally {
      val bw = new BitWriter(out)
      var pred = 0
      blocks.foreach { blk =>
        val v = blk(0) >> 1
        val diff = v - pred
        pred = v
        val s = category(diff)
        val (c0, l0) = dc(s)
        bw.put(c0, l0)
        putExtendBits(bw, diff, s)
      }
      bw.flush()
    }
    // DC refinement (Ah=1 → Al=0)
    seg(0xDA, Array(1, 1, 0x00, 0, 0, 0x10))
    locally {
      val bw = new BitWriter(out)
      blocks.foreach(blk => bw.put(blk(0) & 1, 1))
      bw.flush()
    }

    def acFirstScan(ss: Int, se: Int, al: Int): Unit = {
      seg(0xDA, Array(1, 1, 0x00, ss, se, al & 0x0F))
      val bw = new BitWriter(out)
      val noBits = scala.collection.mutable.ArrayBuffer.empty[Int]
      var eob = 0
      blocks.foreach { blk =>
        val vals = Array.tabulate(se - ss + 1)(i => acPoint(blk(ss + i), al))
        val lastNz = vals.lastIndexWhere(_ != 0)
        if (lastNz < 0) {
          eob += 1
          if (eob == 0x4000) { flushEobRun(bw, ac, eob, noBits); eob = 0 }
        } else {
          flushEobRun(bw, ac, eob, noBits); eob = 0
          var run = 0
          var i = 0
          while (i <= lastNz) {
            val v = vals(i)
            if (v == 0) run += 1
            else {
              while (run > 15) {
                val (c0, l0) = ac(0xF0); bw.put(c0, l0); run -= 16
              }
              val s = category(v)
              require(s <= 8, s"|AC| ${v} too large for the test table")
              val (c0, l0) = ac((run << 4) | s)
              bw.put(c0, l0)
              putExtendBits(bw, v, s)
              run = 0
            }
            i += 1
          }
          if (lastNz < se - ss) eob += 1
        }
      }
      flushEobRun(bw, ac, eob, noBits)
      bw.flush()
    }

    def acRefineScan(ss: Int, se: Int, al: Int): Unit = {
      seg(0xDA, Array(1, 1, 0x00, ss, se, ((al + 1) << 4) | al))
      val bw = new BitWriter(out)
      val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
      var eob = 0
      blocks.foreach { blk =>
        val absNow = Array.tabulate(se - ss + 1)(i =>
          math.abs(blk(ss + i)) >> al)
        val lastNew = absNow.lastIndexWhere(_ == 1)
        if (lastNew < 0) {
          // pure EOB-run member: its history correction bits ride the run
          eob += 1
          absNow.foreach(t => if (t > 1) pending += (t & 1))
          if (eob == 0x4000) { flushEobRun(bw, ac, eob, pending); eob = 0 }
        } else {
          flushEobRun(bw, ac, eob, pending); eob = 0
          var run = 0
          val corr = scala.collection.mutable.ArrayBuffer.empty[Int]
          var i = 0
          while (i <= lastNew) {
            val t = absNow(i)
            if (t == 0) {
              run += 1
              if (run == 16) { // decoder's ZRL walk: 16 zero-history slots
                val (c0, l0) = ac(0xF0)
                bw.put(c0, l0)
                corr.foreach(bit => bw.put(bit, 1)); corr.clear()
                run = 0
              }
            } else if (t > 1) corr += (t & 1)
            else { // newly significant: (run, size=1) + sign + corr bits
              val (c0, l0) = ac((run << 4) | 1)
              bw.put(c0, l0)
              bw.put(if (blk(ss + i) > 0) 1 else 0, 1)
              corr.foreach(bit => bw.put(bit, 1)); corr.clear()
              run = 0
            }
            i += 1
          }
          // tail after the last newly-significant position → EOB member
          if (lastNew < se - ss) {
            eob += 1
            var i2 = lastNew + 1
            while (i2 <= se - ss) {
              if (absNow(i2) > 1) pending += (absNow(i2) & 1)
              i2 += 1
            }
          }
        }
      }
      flushEobRun(bw, ac, eob, pending)
      bw.flush()
    }

    Seq((1, bandSplit), (bandSplit + 1, 63)).foreach { case (ss, se) =>
      acFirstScan(ss, se, acAl)
      (acAl - 1 to 0 by -1).foreach(al => acRefineScan(ss, se, al))
    }
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }
}
