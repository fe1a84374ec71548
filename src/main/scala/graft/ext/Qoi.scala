package graft.ext

/** QOI ("Quite OK Image") codec — the lossless byte-oriented image
  * format small crawl/ML pipelines use as a cheap PNG alternative
  * (qoiformat.org spec, public domain). One byte-stream pass each way,
  * no entropy coding, no DEFLATE — which makes it the one image codec
  * whose decode is strictly cheaper than the PNG path at 100 TB scale.
  *
  * Both directions are REAL and spec-complete for the 8-bit RGB/RGBA
  * space: all six op codes (RUN, INDEX, DIFF, LUMA, RGB, RGBA), the
  * 64-slot running color index with the spec's (3,5,7,11) hash, and the
  * 8-byte end marker. The encoder is the reference greedy algorithm, so
  * a decode∘encode round-trip over a pixel series that revisits colors,
  * steps by small deltas, and holds constant runs exercises every op.
  *
  * Feature extraction matches [[Multimodal.decodeBmp]]'s contract: the
  * Rec.601 luma accumulates as an exact integer (299R+587G+114B per
  * pixel in a long), so `mean_luma` is pixel-order-free and an external
  * engine replays it in closed form.
  */
object Qoi {

  private val EndMarker: Array[Byte] =
    Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)

  private def hashRgba(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** Encode interleaved pixel bytes (RGB or RGBA per `channels`) to a
    * QOI byte stream. `pixels.length` must be `width*height*channels`.
    */
  def encode(pixels: Array[Byte], width: Int, height: Int,
             channels: Int): Array[Byte] = {
    require(channels == 3 || channels == 4, s"channels must be 3|4: $channels")
    require(width > 0 && height > 0, "dimensions must be positive")
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
    val out = new java.io.ByteArrayOutputStream(pixels.length / 2 + 32)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be(v: Int): Unit = {
      out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
      out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
    }
    be(width); be(height)
    out.write(channels); out.write(0) // colorspace: sRGB+linear alpha
    val index = new Array[Int](64) // packed 0xRRGGBBAA, 0 = unset-ish
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    // spec: index starts zeroed; slot for (0,0,0,0) is hash 0 and the
    // zero packing matches, so transparent black hits INDEX immediately —
    // exactly the reference implementation's behavior
    var run = 0
    var p = 0
    val n = pixels.length
    while (p < n) {
      val r = pixels(p) & 0xFF
      val g = pixels(p + 1) & 0xFF
      val b = pixels(p + 2) & 0xFF
      val a = if (channels == 4) pixels(p + 3) & 0xFF else pa
      if (r == pr && g == pg && b == pb && a == pa) {
        run += 1
        if (run == 62) { out.write(0xC0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xC0 | (run - 1)); run = 0 }
        val packed = (r << 24) | (g << 16) | (b << 8) | a
        val h = hashRgba(r, g, b, a)
        if (index(h) == packed) out.write(h) // QOI_OP_INDEX
        else {
          index(h) = packed
          if (a == pa) {
            // wrapping byte diffs per spec
            val dr = ((r - pr) & 0xFF).toByte.toInt
            val dg = ((g - pg) & 0xFF).toByte.toInt
            val db = ((b - pb) & 0xFF).toByte.toInt
            val drDg = dr - dg
            val dbDg = db - dg
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
              db >= -2 && db <= 1) {
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            } else if (dg >= -32 && dg <= 31 && drDg >= -8 && drDg <= 7 &&
              dbDg >= -8 && dbDg <= 7) {
              out.write(0x80 | (dg + 32)); out.write(((drDg + 8) << 4) | (dbDg + 8))
            } else {
              out.write(0xFE); out.write(r); out.write(g); out.write(b)
            }
          } else {
            out.write(0xFF); out.write(r); out.write(g); out.write(b); out.write(a)
          }
        }
        pr = r; pg = g; pb = b; pa = a
      }
      p += channels
    }
    if (run > 0) out.write(0xC0 | (run - 1))
    out.write(EndMarker, 0, 8)
    out.toByteArray
  }

  /** Decode a QOI byte stream into [[Multimodal.ImageFeatures]] —
    * dimensions and channel count from the header, exact-integer
    * Rec.601 mean luma over the decoded pixels (alpha ignored, the
    * [[Multimodal.decodePng]] stance). Corrupt payloads fail loudly by
    * name (magic, truncation, pixel under/overrun), never by index
    * crash.
    */
  def decode(assetId: Long, kind: String,
             data: Array[Byte]): Multimodal.ImageFeatures = {
    require(data.length >= 22 && data(0) == 'q' && data(1) == 'o' &&
      data(2) == 'i' && data(3) == 'f', "not a QOI payload")
    val width = beInt(data, 4)
    val height = beInt(data, 8)
    val channels = data(12) & 0xFF
    require(width > 0 && height > 0, s"malformed QOI dims ${width}x$height")
    require(channels == 3 || channels == 4, s"bad QOI channels $channels")
    val nPix = width.toLong * height
    require(nPix <= Int.MaxValue, "QOI pixel count overflows")
    val index = new Array[Int](64)
    var r = 0; var g = 0; var b = 0; var a = 255
    var lumaMilli = 0L
    var seen = 0L
    var p = 14
    val end = data.length - 8 // end marker never carries ops
    while (seen < nPix) {
      require(p < end, s"QOI truncated at byte $p ($seen/$nPix pixels)")
      val op = data(p) & 0xFF; p += 1
      var emit = 1
      if (op == 0xFE) { // RGB
        require(p + 3 <= end, "QOI RGB op truncated")
        r = data(p) & 0xFF; g = data(p + 1) & 0xFF; b = data(p + 2) & 0xFF
        p += 3
        index(hashRgba(r, g, b, a)) = (r << 24) | (g << 16) | (b << 8) | a
      } else if (op == 0xFF) { // RGBA
        require(p + 4 <= end, "QOI RGBA op truncated")
        r = data(p) & 0xFF; g = data(p + 1) & 0xFF
        b = data(p + 2) & 0xFF; a = data(p + 3) & 0xFF
        p += 4
        index(hashRgba(r, g, b, a)) = (r << 24) | (g << 16) | (b << 8) | a
      } else (op >> 6) match {
        case 0 => // INDEX
          val v = index(op & 0x3F)
          r = (v >>> 24) & 0xFF; g = (v >>> 16) & 0xFF
          b = (v >>> 8) & 0xFF; a = v & 0xFF
        case 1 => // DIFF
          r = (r + ((op >> 4) & 3) - 2) & 0xFF
          g = (g + ((op >> 2) & 3) - 2) & 0xFF
          b = (b + (op & 3) - 2) & 0xFF
          index(hashRgba(r, g, b, a)) = (r << 24) | (g << 16) | (b << 8) | a
        case 2 => // LUMA
          require(p + 1 <= end, "QOI LUMA op truncated")
          val dg = (op & 0x3F) - 32
          val b2 = data(p) & 0xFF; p += 1
          r = (r + dg + ((b2 >> 4) & 0xF) - 8) & 0xFF
          g = (g + dg) & 0xFF
          b = (b + dg + (b2 & 0xF) - 8) & 0xFF
          index(hashRgba(r, g, b, a)) = (r << 24) | (g << 16) | (b << 8) | a
        case _ => // RUN
          emit = (op & 0x3F) + 1
      }
      require(seen + emit <= nPix,
        s"QOI pixel overrun: ${seen + emit} > $nPix")
      lumaMilli += emit.toLong * (299L * r + 587L * g + 114L * b)
      seen += emit
    }
    Multimodal.ImageFeatures(assetId, kind, data.length.toLong,
      width, height, channels,
      lumaMilli.toDouble / (1000.0 * 255.0 * nPix))
  }

  /** Deterministic QOI payload: RGB when `(seed % 2) == 0`, else RGBA
    * (alpha 255). Pixel (x, y) cycles four row shapes so the greedy
    * encoder hits EVERY op class:
    *  - y % 4 == 3: constant gray `(seed + 101 + 7·((y div 4) % 2)) % 256`
    *    — long RUN ops, and rows 3/11/19… ALTERNATE between two colors,
    *    so each revisit is an INDEX hit (needs height ≥ 12);
    *  - y % 4 == 1: r,g,b = (seed+x+y, +1, +2) % 256 — unit steps along
    *    x, the DIFF op;
    *  - y % 4 ∈ {0, 2}: r=(seed+x+y)%256, g=(seed+2x+y)%256,
    *    b=(seed+x+2y)%256 — (1,2,1) steps, the LUMA op;
    *  - row seams jump arbitrarily — RGB escapes.
    * The decoded luma therefore has a pure closed form over the grid
    * that an external SQL engine recomputes exactly.
    */
  def makeQoi(seed: Long, width: Int, height: Int): Array[Byte] = {
    val channels = if (seed % 2 == 0) 3 else 4
    val px = new Array[Byte](width * height * channels)
    def m(v: Long): Byte = (((v % 256) + 256) % 256).toByte
    var i = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (y % 4 == 3) {
          val v = m(seed + 101 + 7 * ((y / 4) % 2))
          px(i) = v; px(i + 1) = v; px(i + 2) = v
        } else if (y % 4 == 1) {
          px(i) = m(seed + x + y)
          px(i + 1) = m(seed + x + y + 1)
          px(i + 2) = m(seed + x + y + 2)
        } else {
          px(i) = m(seed + x + y)
          px(i + 1) = m(seed + 2L * x + y)
          px(i + 2) = m(seed + x + 2L * y)
        }
        if (channels == 4) px(i + 3) = 0xFF.toByte
        i += channels
        x += 1
      }
      y += 1
    }
    encode(px, width, height, channels)
  }
}
