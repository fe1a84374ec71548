package graft.ext

import graft.SparkTestBase

class QoiSpec extends SparkTestBase {
  import spark.implicits._

  /** Exact expected luma for [[Qoi.makeQoi]]'s pixel formula. */
  private def expectedLuma(seed: Long, w: Int, h: Int): Double = {
    var milli = 0L
    for (y <- 0 until h; x <- 0 until w) {
      if (y % 4 == 3)
        milli += 1000L * ((seed + 101 + 7 * ((y / 4) % 2)) % 256)
      else if (y % 4 == 1)
        milli += 299L * ((seed + x + y) % 256) +
          587L * ((seed + x + y + 1) % 256) +
          114L * ((seed + x + y + 2) % 256)
      else milli += 299L * ((seed + x + y) % 256) +
        587L * ((seed + 2L * x + y) % 256) +
        114L * ((seed + x + 2L * y) % 256)
    }
    milli.toDouble / (1000.0 * 255.0 * (w.toLong * h))
  }

  test("roundtrip: decode(encode(px)) recovers dims, channels, exact luma") {
    for (seed <- 0L to 5L) {
      val f = Qoi.decode(seed, "image", Qoi.makeQoi(seed, 9, 12))
      assert(f.width == 9 && f.height == 12)
      assert(f.channels == (if (seed % 2 == 0) 3 else 4))
      assert(f.mean_luma == expectedLuma(seed, 9, 12), s"seed $seed")
    }
  }

  test("encoder emits every op class on the gate's pixel series") {
    val bytes = Qoi.makeQoi(2L, 16, 12)
    var p = 14
    val end = bytes.length - 8
    var sawRun = false; var sawIndex = false; var sawDiff = false
    var sawLuma = false; var sawRgb = false
    while (p < end) {
      val op = bytes(p) & 0xFF
      if (op == 0xFE) { sawRgb = true; p += 4 }
      else if (op == 0xFF) p += 5
      else {
        (op >> 6) match {
          case 0 => sawIndex = true; p += 1
          case 1 => sawDiff = true; p += 1
          case 2 => sawLuma = true; p += 2
          case _ => sawRun = true; p += 1
        }
      }
    }
    assert(sawRun && sawIndex && sawDiff && sawLuma && sawRgb,
      s"ops missing: run=$sawRun index=$sawIndex diff=$sawDiff " +
        s"luma=$sawLuma rgb=$sawRgb")
  }

  test("compresses: the op stream beats raw pixel bytes") {
    val raw = 16 * 12 * 3
    assert(Qoi.makeQoi(2L, 16, 12).length < raw)
  }

  test("rgba alpha is carried but ignored by luma") {
    // two identical gray images, one RGB (even seed) one RGBA (odd seed
    // + same pixels): build manually to isolate the channel path
    val px3 = Array.tabulate(4 * 4 * 3)(i => ((i / 3) % 256).toByte)
    val px4 = new Array[Byte](4 * 4 * 4)
    for (i <- 0 until 16) {
      px4(i * 4) = px3(i * 3); px4(i * 4 + 1) = px3(i * 3 + 1)
      px4(i * 4 + 2) = px3(i * 3 + 2); px4(i * 4 + 3) = 0xFF.toByte
    }
    val f3 = Qoi.decode(1, "image", Qoi.encode(px3, 4, 4, 3))
    val f4 = Qoi.decode(2, "image", Qoi.encode(px4, 4, 4, 4))
    assert(f3.mean_luma == f4.mean_luma)
    assert(f3.channels == 3 && f4.channels == 4)
  }

  test("index op: revisited colors round-trip through the 64-slot cache") {
    // alternating colors far apart force RGB then INDEX on each revisit
    // (hash slots 13 and 16 — distinct, so neither evicts the other)
    val colors = Seq((10, 200, 30), (201, 10, 130))
    val px = new Array[Byte](8 * 1 * 3)
    for (i <- 0 until 8) {
      val (r, g, b) = colors(i % 2)
      px(i * 3) = r.toByte; px(i * 3 + 1) = g.toByte; px(i * 3 + 2) = b.toByte
    }
    val enc = Qoi.encode(px, 8, 1, 3)
    val f = Qoi.decode(1, "image", enc)
    val expect = (0 until 8).map { i =>
      val (r, g, b) = colors(i % 2); 299L * r + 587L * g + 114L * b
    }.sum.toDouble / (1000.0 * 255.0 * 8)
    assert(f.mean_luma == expect)
    // beyond the first two pixels every op should be 1-byte INDEX
    assert(enc.length < 14 + 2 * 4 + 6 * 1 + 8 + 2)
  }

  test("corrupt payloads fail loudly by name") {
    val good = Qoi.makeQoi(1L, 4, 4)
    val badMagic = good.clone(); badMagic(0) = 'x'
    assert(intercept[IllegalArgumentException](
      Qoi.decode(1, "image", badMagic)).getMessage.contains("not a QOI"))
    val truncated = good.take(good.length - 12)
    assert(intercept[IllegalArgumentException](
      Qoi.decode(1, "image", truncated)).getMessage.contains("truncated"))
    val badChannels = good.clone(); badChannels(12) = 7
    assert(intercept[IllegalArgumentException](
      Qoi.decode(1, "image", badChannels)).getMessage.contains("channels"))
  }

  test("decodeImage dispatches qoif magic to the QOI decoder") {
    val f = Multimodal.decodeImage(7L, "image", Qoi.makeQoi(7L, 9, 12))
    assert(f.mean_luma == expectedLuma(7L, 9, 12))
  }

  test("sniffMime routes all seven payload families without decoding") {
    val rows = Seq(
      1L -> Multimodal.makeBmp(1, 4, 2),
      2L -> Multimodal.makePng(2, 4, 2),
      3L -> Jpeg.makeJpeg(3, 4, 2),
      4L -> Gif.makeGif(4, 4, 2),
      5L -> Multimodal.makeWav(5, 16),
      6L -> Qoi.makeQoi(6, 4, 4),
      7L -> "plain ascii text\n".getBytes("UTF-8"),
      8L -> Array[Byte](0x00, 0x01, 0x02, 0xFE.toByte))
      .toDF("id", "data")
    val got = rows.select(org.apache.spark.sql.functions.col("id"),
        Multimodal.sniffMime(org.apache.spark.sql.functions.col("data")))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "image/bmp" && got(2L) == "image/png")
    assert(got(3L) == "image/jpeg" && got(4L) == "image/gif")
    assert(got(5L) == "audio/wav" && got(6L) == "image/qoi")
    assert(got(7L) == "text/plain")
    assert(got(8L) == "application/octet-stream")
  }
}
