package graft.ext

/** Pure-JVM GIF (87a/89a) decoder and a deterministic test encoder. No
  * codec library — header + logical-screen parse, global/local color
  * tables, sub-block walk (extensions skipped), and variable-width LZW
  * decompression (LSB-first packing, clear/end codes, 12-bit dictionary
  * cap); interlaced frames are accepted — interlacing permutes row
  * order only, which the order-independent luma sum never sees.
  * Decodes the FIRST image descriptor
  * (the still-image case of a web corpus; animation frames beyond the
  * first are metadata here, like video frames elsewhere in
  * [[Multimodal]]). Malformed payloads — truncated streams, codes
  * beyond the dictionary, missing color table, oversized dimensions —
  * fail loudly by name, never a silent wrong number.
  *
  * Same exact-integer Rec.601 luma convention as
  * [[Multimodal.decodeBmp]]/[[Multimodal.decodePng]]/[[Jpeg.decode]]:
  * lumaMilli = Σ (299·r + 587·g + 114·b) over the frame's pixels via
  * the palette, so a grayscale identity palette makes the gate's
  * closed-form oracle exact.
  */
object Gif {

  /** Decoded first-frame summary: dimensions, palette-expanded channel
    * count (always 3 — GIF pixels are palette indices), exact luma
    * milli-sum.
    */
  final case class Decoded(width: Int, height: Int, channels: Int,
                           lumaMilli: Long)

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Decode the first frame of a GIF87a/89a payload. */
  def decode(data: Array[Byte]): Decoded = {
    require(data.length >= 13, "GIF payload too short for header")
    val sig = new String(data, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF payload ($sig)")
    val screenW = u16le(data, 6)
    val screenH = u16le(data, 8)
    val packed = data(10) & 0xFF
    var off = 13
    var gct: Array[Int] = null // packed 0xRRGGBB per index
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 0x07)
      require(off + 3 * n <= data.length, "GIF global color table truncated")
      gct = Array.tabulate(n) { i =>
        ((data(off + 3 * i) & 0xFF) << 16) |
          ((data(off + 3 * i + 1) & 0xFF) << 8) | (data(off + 3 * i + 2) & 0xFF)
      }
      off += 3 * n
    }

    // block walk to the first image descriptor
    while (true) {
      require(off < data.length, "GIF truncated before image data")
      (data(off) & 0xFF) match {
        case 0x3B => throw new IllegalArgumentException(
          "GIF trailer reached with no image data")
        case 0x21 => // extension: label + sub-blocks, skipped
          require(off + 2 < data.length, "GIF extension truncated")
          off += 2
          var len = data(off) & 0xFF
          while (len != 0) {
            off += 1 + len
            require(off < data.length, "GIF extension sub-blocks truncated")
            len = data(off) & 0xFF
          }
          off += 1
        case 0x2C => // image descriptor
          require(off + 10 <= data.length, "GIF image descriptor truncated")
          val w = u16le(data, off + 5)
          val h = u16le(data, off + 7)
          val ipacked = data(off + 9) & 0xFF
          require(w > 0 && h > 0 && w <= screenW && h <= screenH,
            s"malformed GIF frame dimensions ${w}x$h on ${screenW}x$screenH")
          require(w.toLong * h <= (1L << 28),
            s"GIF frame too large: ${w}x$h")
          // interlace (ipacked & 0x40) permutes ROW order only; the luma
          // sum is order-independent, so no de-interlace pass is needed
          off += 10
          var palette = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 0x07)
            require(off + 3 * n <= data.length, "GIF local color table truncated")
            palette = Array.tabulate(n) { i =>
              ((data(off + 3 * i) & 0xFF) << 16) |
                ((data(off + 3 * i + 1) & 0xFF) << 8) |
                (data(off + 3 * i + 2) & 0xFF)
            }
            off += 3 * n
          }
          require(palette != null, "GIF frame has no color table")
          val indices = lzwDecode(data, off, w * h)
          var luma = 0L
          var i = 0
          while (i < w * h) {
            val idx = indices(i)
            require(idx < palette.length,
              s"GIF pixel index $idx beyond ${palette.length}-color table")
            val rgb = palette(idx)
            luma += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)
            i += 1
          }
          return Decoded(w, h, 3, luma)
        case b => throw new IllegalArgumentException(
          f"unknown GIF block 0x$b%02X")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Variable-width LZW decode of the image sub-block stream starting at
    * `off` (min-code-size byte first), producing exactly `nPixels`
    * palette indices.
    */
  private def lzwDecode(data: Array[Byte], off0: Int, nPixels: Int): Array[Int] = {
    require(off0 < data.length, "GIF LZW stream missing")
    val minCode = data(off0) & 0xFF
    require(minCode >= 2 && minCode <= 8, s"bad GIF LZW min code size $minCode")
    val clear = 1 << minCode
    val end = clear + 1
    // dictionary as (prefix code, appended index) pairs; entries < clear
    // are roots. 12-bit cap per spec.
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    var dictSize = end + 1
    var codeWidth = minCode + 1

    val out = new Array[Int](nPixels)
    var nOut = 0
    // sub-block-spanning LSB-first bit reader
    var off = off0 + 1
    var blockLeft = 0
    var bitBuf = 0L
    var bitCnt = 0
    def fill(): Unit = {
      while (bitCnt <= 24) {
        if (blockLeft == 0) {
          require(off < data.length, "GIF LZW stream truncated")
          blockLeft = data(off) & 0xFF
          off += 1
          if (blockLeft == 0) return // terminator: no more bits
        } else {
          require(off < data.length, "GIF LZW sub-block truncated")
          bitBuf |= (data(off) & 0xFFL) << bitCnt
          bitCnt += 8
          off += 1
          blockLeft -= 1
        }
      }
    }
    def nextCode(): Int = {
      fill()
      require(bitCnt >= codeWidth, "GIF LZW bits exhausted mid-code")
      val c = (bitBuf & ((1L << codeWidth) - 1)).toInt
      bitBuf >>>= codeWidth
      bitCnt -= codeWidth
      c
    }
    // scratch for expanding a code's prefix chain (reversed walk)
    val stack = new Array[Int](4096)
    var prev = -1
    var done = false
    while (!done && nOut < nPixels) {
      val code = nextCode()
      if (code == clear) {
        dictSize = end + 1
        codeWidth = minCode + 1
        prev = -1
      } else if (code == end) {
        done = true
      } else {
        require(code < dictSize || (code == dictSize && prev >= 0),
          s"GIF LZW code $code beyond dictionary ($dictSize)")
        // materialize the code's string: walk prefixes down to a root.
        // KwKwK (code == dictSize): string = string(prev) + head(prev).
        var sp = 0
        var c = if (code == dictSize) prev else code
        while (c >= clear + 2) {
          stack(sp) = append(c); sp += 1; c = prefix(c)
          require(sp < stack.length, "GIF LZW prefix chain too long")
        }
        val head = c // the string's first (root) index
        val need = sp + 1 + (if (code == dictSize) 1 else 0)
        require(nOut + need <= nPixels,
          s"GIF LZW produced more than $nPixels pixels")
        out(nOut) = head; nOut += 1
        var k = sp - 1
        while (k >= 0) { out(nOut) = stack(k); nOut += 1; k -= 1 }
        if (code == dictSize) { out(nOut) = head; nOut += 1 }
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          append(dictSize) = head
          dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    require(nOut == nPixels,
      s"GIF LZW stream ended after $nOut of $nPixels pixels")
    out
  }

  // ------------------------------------------------- deterministic encoder

  /** Deterministic GIF89a: an 8-bit grayscale identity palette (index i
    * → RGB(i,i,i)) and pixel v(x,y) = (seed + x + y) % 256 — decoded
    * luma is exactly 1000·Σv, the [[Multimodal.makeBmp]] closed form.
    * `compressed = false` emits literal LZW codes (9-bit, a clear every
    * 254 literals so the width never grows — valid, trivially
    * deterministic); `compressed = true` runs a REAL greedy LZW encoder
    * (dictionary hits, compound codes, KwKwK, code-width growth — the
    * decoder paths literals cannot reach). `interlaced` sets the flag
    * and writes rows in 4-pass order (luma is order-independent; the
    * flag path is still exercised).
    */
  def makeGif(seed: Long, width: Int, height: Int,
              interlaced: Boolean = false,
              compressed: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "dimensions must be positive")
    // pixel rows in file order (4-pass when interlaced)
    val rowOrder: Seq[Int] =
      if (!interlaced) 0 until height
      else (0 until height by 8) ++ (4 until height by 8) ++
        (2 until height by 4) ++ (1 until height by 2)
    val pixels = rowOrder.flatMap { y =>
      (0 until width).map(x => (((seed + x + y) % 256 + 256) % 256).toInt)
    }
    buildGif(pixels, width, height, interlaced, compressed)
  }

  /** Spec-only builder: a GIF from EXPLICIT palette indices in file
    * order (gray identity palette) — lets tests force the decoder paths
    * a gradient may not reach (uniform runs ⇒ KwKwK, incompressible
    * streams ⇒ 10/11/12-bit code widths).
    */
  def makeGifFromIndices(indices: Seq[Int], width: Int,
                         compressed: Boolean = true): Array[Byte] = {
    require(width > 0 && indices.nonEmpty && indices.length % width == 0,
      "need a full rectangle of indices")
    require(indices.forall(i => i >= 0 && i <= 255), "indices must be 0..255")
    buildGif(indices, width, indices.length / width,
      interlaced = false, compressed = compressed)
  }

  private def buildGif(pixels: Seq[Int], width: Int, height: Int,
                       interlaced: Boolean, compressed: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xFF); out.write((width >> 8) & 0xFF)
    out.write(height & 0xFF); out.write((height >> 8) & 0xFF)
    out.write(0x80 | 0x70 | 0x07) // GCT present, 8-bit, 256 entries
    out.write(0) // background
    out.write(0) // aspect
    (0 until 256).foreach { i => out.write(i); out.write(i); out.write(i) }
    out.write(0x2C) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xFF); out.write((width >> 8) & 0xFF)
    out.write(height & 0xFF); out.write((height >> 8) & 0xFF)
    out.write(if (interlaced) 0x40 else 0x00)

    out.write(8) // LZW min code size
    val body = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var putWidth = 9
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += putWidth
      while (bitCnt >= 8) {
        body.write((bitBuf & 0xFF).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    if (!compressed) {
      put(256) // initial clear
      pixels.zipWithIndex.foreach { case (p, i) =>
        if (i > 0 && i % 254 == 0) put(256) // keep the dictionary small
        put(p)
      }
      put(257) // end
    } else {
      // greedy LZW. Width grows one ENTRY later than the decoder's own
      // check (the decoder's dictionary add lags the encoder's by one
      // code), so each code is written at exactly the width the decoder
      // will read it with; at 4096 entries both sides stop adding.
      val dict = new java.util.HashMap[Long, Integer]()
      var dictSize = 258
      put(256) // initial clear
      var cur = pixels.head
      pixels.tail.foreach { k =>
        val key = (cur.toLong << 8) | k
        val e = dict.get(key)
        if (e != null) cur = e.intValue()
        else {
          put(cur)
          if (dictSize < 4096) {
            dict.put(key, Integer.valueOf(dictSize))
            dictSize += 1
            if (dictSize == (1 << putWidth) + 1 && putWidth < 12) putWidth += 1
          }
          cur = k
        }
      }
      put(cur)
      put(257) // end
    }
    if (bitCnt > 0) body.write((bitBuf & 0xFF).toInt)
    val bytes = body.toByteArray
    var i = 0
    while (i < bytes.length) {
      val n = math.min(255, bytes.length - i)
      out.write(n)
      out.write(bytes, i, n)
      i += n
    }
    out.write(0) // sub-block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }
}
