package graft.ext

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, ""), (3L, "xyz"))
    .toDF("doc_id", "text")

  test("packAssets: binary payload with typed id/kind") {
    val packed = Multimodal.packAssets(docs, "doc_id", "text")
    val schema = packed.schema
    assert(schema("data").dataType.typeName == "binary")
    val r = packed.filter($"asset_id" === 1).collect()(0)
    assert(new String(r.getAs[Array[Byte]]("data"), "UTF-8") == "hello world")
    assert(r.getAs[String]("kind") == "image")
  }

  test("extractImageFeatures: deterministic stub features per payload") {
    val packed = Multimodal.packAssets(docs, "doc_id", "text")
    val feats = Multimodal.imageFeatures(packed).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    val f1 = feats(1L)
    assert(f1.getAs[Long]("n_bytes") == 11)
    assert(f1.getAs[Int]("width") == 16 + 11)
    val expHeight = 16 + (('h'.toInt * 7 + 'd'.toInt) % 240)
    assert(f1.getAs[Int]("height") == expHeight)
    // empty payload: degenerate but defined
    assert(feats(2L).getAs[Int]("width") == 16)
    // re-run → identical (determinism contract)
    val again = Multimodal.imageFeatures(packed).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Double]("mean_luma")).toMap
    feats.foreach { case (id, r) =>
      assert(again(id) == r.getAs[Double]("mean_luma"))
    }
  }

  test("metadata-only queries prune the binary payload out of the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mm").toString
    Multimodal.packAssets(docs, "doc_id", "text").write
      .mode("overwrite").parquet(tmp)
    val metaOnly = spark.read.parquet(tmp).select("asset_id", "kind")
    val scan = metaOnly.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("data:binary"),
      s"binary column must be pruned from ReadSchema:\n$scan")
  }

  test("decodeImage: BMP decodes natively, compressed formats fail loudly") {
    // dispatch: real path for the native format...
    val f = Multimodal.decodeImage(7L, "image", Multimodal.makeBmp(7L, 8, 4))
    assert(f.width == 8 && f.height == 4 && f.channels == 3)
    // ...explicit NotImplementedError for anything else (no codec libs)
    intercept[NotImplementedError](
      Multimodal.decodeImage(1L, "image", Array[Byte](1)))
  }

  test("decodeBmp: exact header fields and closed-form gradient luma") {
    val (w, h, seed) = (5, 3, 10L) // odd width exercises the 4-byte stride pad
    val f = Multimodal.decodeBmp(seed, "image", Multimodal.makeBmp(seed, w, h))
    assert(f.width == w && f.height == h && f.channels == 3)
    val stride = ((3 * w + 3) / 4) * 4
    assert(f.n_bytes == 54L + stride * h)
    // gray gradient: luma == pixel value; mean over the grid in exact ints
    val sumV = (for (x <- 0 until w; y <- 0 until h) yield (seed + x + y) % 256).sum
    assert(f.mean_luma == sumV.toDouble * 1000.0 / (1000.0 * 255.0 * (w * h)))
    intercept[IllegalArgumentException](
      Multimodal.decodeBmp(1L, "image", "BMgarbage".getBytes))
  }

  test("makeWavFromPcm: byte-exact PCM roundtrip; 16-bit range enforced") {
    val pcm = Array(0, 1, -1, 32767, -32768, 1234, -4321, 7)
    assert(Multimodal.wavPcm(Multimodal.makeWavFromPcm(pcm)).toSeq == pcm.toSeq)
    // makeWav must be the same container around its generated samples
    assert(Multimodal.makeWav(3L, 256).toSeq == Multimodal.makeWavFromPcm(
      Array.tabulate(256)(i => ((((3L * 31 + i) % 65536) + 65536) % 65536)
        .toInt - 32768)).toSeq)
    intercept[IllegalArgumentException](
      Multimodal.makeWavFromPcm(Array(40000)))
  }

  test("decodeWav: chunk walk, exact RMS, malformed payloads fail loudly") {
    val seed = 3L
    val f = Multimodal.decodeWav(seed, Multimodal.makeWav(seed, 256))
    assert(f.n_samples == 256L && f.duration_ms == 16L && f.n_bytes == 556L)
    val sumSq = (0 until 256).map { i =>
      val s = ((seed * 31 + i) % 65536) - 32768; s * s
    }.sum
    assert(f.rms == math.sqrt(sumSq.toDouble / 256) / 32768.0)
    intercept[IllegalArgumentException](
      Multimodal.decodeWav(1L, "RIFFxxxxNOPE".getBytes))
    // a corrupt negative chunk length must error, not loop forever
    val evil = Multimodal.makeWav(1L, 4)
    evil(16) = -1; evil(17) = -1; evil(18) = -1; evil(19) = -1 // fmt len = -1
    intercept[IllegalArgumentException](Multimodal.decodeWav(1L, evil))
    // a corrupt negative width must error, not index out of bounds
    val badBmp = Multimodal.makeBmp(1L, 4, 4)
    badBmp(21) = -1 // width high byte -> negative
    intercept[IllegalArgumentException](
      Multimodal.decodeBmp(1L, "image", badBmp))
    // a HUGE width whose 3*width wraps Int negative must hit the loud
    // truncation require, not an index crash from a wrapped stride
    val hugeBmp = Multimodal.makeBmp(1L, 4, 4)
    hugeBmp(18) = 0; hugeBmp(19) = 0; hugeBmp(20) = 0; hugeBmp(21) = 0x30 // width = 0x30000000
    intercept[IllegalArgumentException](
      Multimodal.decodeBmp(1L, "image", hugeBmp))
    // a too-short declared fmt chunk must error, not read the next
    // chunk's bytes as sample rate
    val shortFmt = Multimodal.makeWav(1L, 4)
    shortFmt(16) = 4; shortFmt(17) = 0; shortFmt(18) = 0; shortFmt(19) = 0 // fmt len = 4
    intercept[IllegalArgumentException](Multimodal.decodeWav(1L, shortFmt))
  }

  test("decodeWav G.711: mu-law/A-law expand exactly, RMS closed form") {
    // canonical G.711 points: mu-law 0xFF encodes +0, 0x00 the most
    // negative (-32124), 0x80 the most positive; A-law silence 0xD5 = +8
    assert(Multimodal.mulawToLinear(0xFF) == 0)
    assert(Multimodal.mulawToLinear(0x00) == -32124)
    assert(Multimodal.mulawToLinear(0x80) == 32124)
    assert(Multimodal.alawToLinear(0xD5) == 8)
    assert(Multimodal.alawToLinear(0x55) == -8)
    assert(Multimodal.alawToLinear(0xAA) == 32256)
    assert(Multimodal.alawToLinear(0x2A) == -32256)
    for (mulaw <- Seq(true, false); seed <- Seq(0L, 5L, 77L)) {
      val f = Multimodal.decodeWav(9L, Multimodal.makeWavG711(seed, 256, mulaw))
      assert(f.n_samples == 256 && f.duration_ms == 32) // 256 / 8 kHz
      val sumSq = (0 until 256).map { i =>
        val b = (((seed * 31 + i) % 256 + 256) % 256).toInt
        val s = if (mulaw) Multimodal.mulawToLinear(b)
                else Multimodal.alawToLinear(b)
        s.toLong * s
      }.sum
      assert(f.rms == math.sqrt(sumSq.toDouble / 256) / 32768.0,
        s"rms mismatch mulaw=$mulaw seed=$seed")
    }
    // G.711 declaring 16 bits is malformed, loudly
    val bad = Multimodal.makeWavG711(1L, 16, mulaw = true)
    bad(34) = 16.toByte
    val e = intercept[IllegalArgumentException](Multimodal.decodeWav(1L, bad))
    assert(e.getMessage.contains("8-bit"))
  }

  test("decodeWav IMA ADPCM: block headers, nibble chain, quantization bound") {
    // INDEPENDENT reference decode: the test re-walks the WAV's data
    // blocks with its own copy of the published IMA tables and nibble
    // arithmetic, and the production decoder's RMS must equal the
    // reference's bit-for-bit
    val stepT = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
      41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
      190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
      2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
      6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
      16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    val idxT = Array(-1, -1, -1, -1, 2, 4, 6, 8)
    def referenceRms(wav: Array[Byte], nSamples: Int,
                     blockAlign: Int): Double = {
      var i = 12
      var dataAt = -1
      var dataLen = 0
      while (dataAt < 0) {
        val id = new String(wav.slice(i, i + 4), "US-ASCII")
        val len = (wav(i + 4) & 0xFF) | ((wav(i + 5) & 0xFF) << 8) |
          ((wav(i + 6) & 0xFF) << 16) | ((wav(i + 7) & 0xFF) << 24)
        if (id == "data") { dataAt = i + 8; dataLen = len }
        else i += 8 + len + (len & 1)
      }
      var sumSq = 0L
      var produced = 0
      var off = dataAt
      while (off < dataAt + dataLen && produced < nSamples) {
        val blockLen = math.min(blockAlign, dataAt + dataLen - off)
        var pred = ((wav(off) & 0xFF) | ((wav(off + 1) & 0xFF) << 8))
          .toShort.toInt
        var idx = wav(off + 2) & 0xFF
        sumSq += pred.toLong * pred; produced += 1
        var bi = 4
        var stop = false
        while (bi < blockLen && !stop) {
          val b = wav(off + bi) & 0xFF
          Seq(b & 0x0F, (b >> 4) & 0x0F).foreach { nib =>
            if (produced < nSamples) {
              val step = stepT(idx)
              var diff = step >> 3
              if ((nib & 1) != 0) diff += step >> 2
              if ((nib & 2) != 0) diff += step >> 1
              if ((nib & 4) != 0) diff += step
              pred = math.max(-32768, math.min(32767,
                if ((nib & 8) != 0) pred - diff else pred + diff))
              idx = math.max(0, math.min(88, idx + idxT(nib & 7)))
              sumSq += pred.toLong * pred; produced += 1
            } else stop = true
          }
          bi += 1
        }
        off += blockLen
      }
      math.sqrt(sumSq.toDouble / nSamples) / 32768.0
    }
    for (seed <- Seq(0L, 5L, 77L); n <- Seq(5, 505, 1200)) {
      val wav = Multimodal.makeWavAdpcm(seed, n)
      val f = Multimodal.decodeWav(9L, wav)
      assert(f.n_samples == n, s"n_samples seed=$seed n=$n")
      assert(f.duration_ms == n.toLong * 1000 / 8000)
      assert(f.rms == referenceRms(wav, n, 4 + (505 - 1) / 2),
        s"reference decode diverged at seed=$seed n=$n")
    }
    // decode == encoder's own forward predictor path (bit-exact): the
    // encoder embeds the DECODED predictor in each block header, so
    // consecutive single-block encodes pin the chain
    val one = Multimodal.decodeWav(1L, Multimodal.makeWavAdpcm(3L, 9,
      samplesPerBlock = 9))
    val multi = Multimodal.decodeWav(1L, Multimodal.makeWavAdpcm(3L, 9,
      samplesPerBlock = 5))
    assert(one.n_samples == 9 && multi.n_samples == 9)
    // malformed: step index out of range fails by name
    val bad = Multimodal.makeWavAdpcm(1L, 16)
    // find the data chunk, corrupt the first block's step index
    var i = 12
    var dataAt = -1
    while (dataAt < 0) {
      val id = new String(bad.slice(i, i + 4), "US-ASCII")
      val len = (bad(i + 4) & 0xFF) | ((bad(i + 5) & 0xFF) << 8) |
        ((bad(i + 6) & 0xFF) << 16) | ((bad(i + 7) & 0xFF) << 24)
      if (id == "data") dataAt = i + 8 else i += 8 + len + (len & 1)
    }
    bad(dataAt + 2) = 120.toByte // index > 88
    val e = intercept[IllegalArgumentException](Multimodal.decodeWav(1L, bad))
    assert(e.getMessage.contains("step index"))
    // truncated ADPCM payload fails by name (not silence)
    val wav = Multimodal.makeWavAdpcm(1L, 505)
    val cut = java.util.Arrays.copyOf(wav, wav.length - 40)
    // fix the data chunk length to match the truncation
    val e2 = intercept[IllegalArgumentException](Multimodal.decodeWav(1L, cut))
    assert(e2.getMessage.contains("malformed WAV chunk") ||
      e2.getMessage.contains("truncated"))
  }

  test("wavFrameEnergy: exact per-frame sums, short tail, PCM-only") {
    import spark.implicits._
    val assets = Seq(Multimodal.Asset(7L, "audio", Multimodal.makeWav(7L, 256)))
      .toDS()
    val frames = Multimodal.wavFrameEnergy(assets, frameSamples = 100)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(frames.map(_.n_in_frame).toSeq == Seq(100, 100, 56))
    def sample(i: Int): Long = ((7L * 31 + i) % 65536) - 32768
    val expected = (0 until 256).grouped(100).map(g =>
      g.map(i => sample(i) * sample(i)).sum).toSeq
    assert(frames.map(_.sum_sq).toSeq == expected)
    frames.foreach(f =>
      assert(f.rms == math.sqrt(f.sum_sq.toDouble / f.n_in_frame) / 32768.0))
    // frame sums re-aggregate to the whole-asset decode
    val whole = Multimodal.decodeWav(7L, Multimodal.makeWav(7L, 256))
    assert(whole.rms == math.sqrt(frames.map(_.sum_sq).sum.toDouble / 256) / 32768.0)
    // G.711 payloads are refused by name (frame walk is PCM-only)
    val g711 = Seq(Multimodal.Asset(1L, "audio",
      Multimodal.makeWavG711(1L, 64, mulaw = true))).toDS()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.wavFrameEnergy(g711).collect())
    assert(e.getMessage.contains("16-bit PCM") ||
      e.getCause.getMessage.contains("16-bit PCM"))
  }

  test("decodePng: roundtrip through every filter type, closed-form luma") {
    // height 7 with filter type (seed + y) % 5 covers all five filters;
    // seeds shift which filter lands on row 0 (the no-prior-row edge)
    for (seed <- 0L until 5L; channels <- Seq(3, 4)) {
      val (w, h) = (9, 7)
      val f = Multimodal.decodePng(seed, "image",
        Multimodal.makePng(seed, w, h, channels))
      assert(f.width == w && f.height == h && f.channels == channels)
      val sumV = (for (x <- 0 until w; y <- 0 until h) yield (seed + x + y) % 256).sum
      // gray gradient: RGBA's alpha=255 must NOT enter luma — the value
      // is the same closed form for both channel counts
      assert(f.mean_luma == sumV.toDouble * 1000.0 / (1000.0 * 255.0 * (w * h)),
        s"luma mismatch at seed=$seed channels=$channels")
    }
  }

  test("decodePng: malformed payloads fail loudly, never crash or mis-decode") {
    // not a PNG at all
    intercept[IllegalArgumentException](
      Multimodal.decodePng(1L, "image", "notapng-at-all".getBytes))
    // flipped pixel byte inside IDAT -> CRC mismatch caught by name
    val flipped = Multimodal.makePng(1L, 8, 4)
    flipped(flipped.length - 20) = (flipped(flipped.length - 20) ^ 0x7).toByte
    val e = intercept[IllegalArgumentException](
      Multimodal.decodePng(1L, "image", flipped))
    assert(e.getMessage.contains("CRC"))
    // truncated mid-chunk
    val truncated = Multimodal.makePng(1L, 8, 4).dropRight(30)
    intercept[IllegalArgumentException](
      Multimodal.decodePng(1L, "image", truncated))
    // unknown interlace METHOD (2; Adam7 itself is supported now), with
    // the IHDR CRC fixed up so the named refusal fires
    val interlaced = Multimodal.makePng(1L, 8, 4)
    interlaced(8 + 8 + 12) = 2 // IHDR data byte 12 (abs 28): interlace
    val crc = new java.util.zip.CRC32
    crc.update(interlaced, 8 + 4, 4 + 13)
    val cv = crc.getValue.toInt
    val crcOff = 8 + 8 + 13
    interlaced(crcOff) = (cv >> 24).toByte; interlaced(crcOff + 1) = (cv >> 16).toByte
    interlaced(crcOff + 2) = (cv >> 8).toByte; interlaced(crcOff + 3) = cv.toByte
    val e2 = intercept[IllegalArgumentException](
      Multimodal.decodePng(1L, "image", interlaced))
    assert(e2.getMessage.contains("interlace"))
  }

  test("decodePng variants: gray/palette/alpha, sub-byte depths, Adam7") {
    def msGray(seed: Long, w: Int, h: Int, d: Int): Long = {
      val scale = 255 / ((1 << d) - 1)
      (for (x <- 0 until w; y <- 0 until h)
        yield 1000L * (((seed + x + y) % (1 << d)) * scale)).sum
    }
    def msPal(seed: Long, w: Int, h: Int, d: Int): Long =
      (for (x <- 0 until w; y <- 0 until h)
        yield 1000L * ((seed + ((seed + x + y) % (1 << d))) % 256)).sum
    for (seed <- Seq(0L, 9L, 250L); inter <- Seq(false, true);
         (w, h) <- Seq((13, 7), (8, 8), (1, 1), (3, 10))) {
      val denom = 1000.0 * 255.0 * (w * h)
      for (d <- Seq(1, 2, 4, 8)) {
        val g = Multimodal.decodePng(seed, "image",
          Multimodal.makePngVariant(seed, w, h, 0, d, inter))
        assert(g.width == w && g.height == h && g.channels == 1)
        assert(g.mean_luma == msGray(seed, w, h, d) / denom,
          s"gray d=$d seed=$seed inter=$inter ${w}x$h")
        val p = Multimodal.decodePng(seed, "image",
          Multimodal.makePngVariant(seed, w, h, 3, d, inter))
        assert(p.channels == 3)
        assert(p.mean_luma == msPal(seed, w, h, d) / denom,
          s"palette d=$d seed=$seed inter=$inter ${w}x$h")
      }
      for ((ct, ch) <- Seq((2, 3), (4, 2), (6, 4))) {
        val f = Multimodal.decodePng(seed, "image",
          Multimodal.makePngVariant(seed, w, h, ct, 8, inter))
        assert(f.channels == ch)
        assert(f.mean_luma == msGray(seed, w, h, 8) / denom,
          s"type $ct seed=$seed inter=$inter ${w}x$h")
      }
    }
  }

  test("decodePng variants: malformed fails loudly by name") {
    // 16-bit depth: patch IHDR + recompute its CRC so the named depth
    // refusal (not the CRC tripwire) fires
    val png = Multimodal.makePngVariant(4L, 8, 8, 2, 8, interlaced = false)
    png(24) = 16.toByte // IHDR bit depth
    val crc = new java.util.zip.CRC32
    crc.update(png, 12, 17) // chunk type + 13-byte body
    val cv = crc.getValue.toInt
    png(29) = (cv >> 24).toByte; png(30) = (cv >> 16).toByte
    png(31) = (cv >> 8).toByte; png(32) = cv.toByte
    val e = intercept[IllegalArgumentException](
      Multimodal.decodePng(1L, "image", png))
    assert(e.getMessage.contains("8-bit"))
    // palette PNG with its PLTE chunk spliced out entirely
    val pal = Multimodal.makePngVariant(4L, 8, 8, 3, 8, interlaced = false)
    var i = 8
    var spliced: Array[Byte] = null
    while (spliced == null) {
      val len = java.nio.ByteBuffer.wrap(pal, i, 4).getInt
      val t = new String(pal, i + 4, 4, "US-ASCII")
      if (t == "PLTE") spliced = pal.take(i) ++ pal.drop(i + 12 + len)
      else i += 12 + len
    }
    val e2 = intercept[IllegalArgumentException](
      Multimodal.decodePng(1L, "image", spliced))
    assert(e2.getMessage.contains("PLTE"))
  }

  test("decodeImage dispatches PNG by signature") {
    val f = Multimodal.decodeImage(3L, "image", Multimodal.makePng(3L, 8, 4))
    assert(f.width == 8 && f.height == 4 && f.channels == 3)
  }

  test("decodeJpeg: flat-block grid in all three modes, closed-form luma") {
    // DC-only blocks with an all-8s table decode EXACTLY to their block
    // value; flat chroma 128 makes RGB == Y, so gray/444/420 all share
    // the same closed form: lumaMilli = sum over blocks of 64*1000*v
    for (seed <- Seq(0L, 7L, 200L); mode <- Seq("gray", "444", "420")) {
      val (bx, by) = (4, 2)
      val f = Multimodal.decodeJpeg(seed, "image",
        Jpeg.makeJpeg(seed, bx, by, mode))
      assert(f.width == bx * 8 && f.height == by * 8)
      assert(f.channels == (if (mode == "gray") 1 else 3))
      val sumV = (for (x <- 0 until bx; y <- 0 until by)
        yield (seed + x + y) % 256).sum
      assert(f.mean_luma ==
        sumV.toDouble * 64.0 * 1000.0 / (1000.0 * 255.0 * (bx * 8 * by * 8)),
        s"luma mismatch at seed=$seed mode=$mode")
    }
  }

  test("decodeJpeg: restart markers reset predictors, decode unchanged") {
    for (mode <- Seq("gray", "444", "420")) {
      val plain = Jpeg.decode(Jpeg.makeJpeg(11L, 4, 4, mode))
      val restarted = Jpeg.decode(Jpeg.makeJpeg(11L, 4, 4, mode, restartEvery = 2))
      assert(plain == restarted, s"restart path diverged in mode=$mode")
    }
  }

  test("Jpeg coefficient roundtrip drives the AC/ZRL/EOB entropy path") {
    // block 1: DC + adjacent ACs + a 16-zero gap (forces one ZRL code);
    // block 2: negative DC only (negative diff vs block 1's predictor)
    val b1 = new Array[Int](64)
    b1(0) = 5; b1(1) = 3; b1(2) = -1; b1(19) = 4
    val b2 = new Array[Int](64)
    b2(0) = -7
    val blocks = Seq(b1, b2)
    val decoded = Jpeg.decode(Jpeg.makeJpegFromCoefficients(blocks, blocksX = 2))
    assert(decoded.width == 16 && decoded.height == 8 && decoded.channels == 1)
    val expected = blocks.map(b =>
      Jpeg.referenceBlockPixels(b, q = 8).map(_.toLong).sum).sum * 1000L
    assert(decoded.lumaMilli == expected)
  }

  test("decodeJpeg: malformed payloads fail loudly by name") {
    // not a JPEG at all
    intercept[IllegalArgumentException](Jpeg.decode("notajpeg......".getBytes))
    // a BASELINE stream mislabeled as progressive must fail loudly (its
    // full-band SOS is not a legal progressive scan), not mis-decode
    val prog = Jpeg.makeJpeg(1L, 2, 2, "gray")
    var i = 0
    while (!((prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0)) i += 1
    prog(i + 1) = 0xC2.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e.getMessage.contains("DC scan"))
    // truncated entropy stream
    intercept[IllegalArgumentException](
      Jpeg.decode(Jpeg.makeJpeg(1L, 4, 4, "gray").dropRight(12)))
    // CMYK-ish component count must be refused by name
    val cmyk = Jpeg.makeJpeg(1L, 2, 2, "gray")
    var j = 0
    while (!((cmyk(j) & 0xFF) == 0xFF && (cmyk(j + 1) & 0xFF) == 0xC0)) j += 1
    cmyk(j + 9) = 4 // SOF nc byte
    val e2 = intercept[IllegalArgumentException](Jpeg.decode(cmyk))
    assert(e2.getMessage.contains("components"))
    // absurd declared dimensions must be a named refusal, not a giant
    // allocation (or an Int-wrapped zero-length plane)
    val huge = Jpeg.makeJpeg(1L, 2, 2, "gray")
    var h2 = 0
    while (!((huge(h2) & 0xFF) == 0xFF && (huge(h2 + 1) & 0xFF) == 0xC0)) h2 += 1
    huge(h2 + 5) = 0xFF.toByte; huge(h2 + 6) = 0xFF.toByte // height 65535
    huge(h2 + 7) = 0xFF.toByte; huge(h2 + 8) = 0xFF.toByte // width 65535
    val e3 = intercept[IllegalArgumentException](Jpeg.decode(huge))
    assert(e3.getMessage.contains("too large"))
  }

  test("decodeImage dispatches JPEG by SOI signature") {
    val f = Multimodal.decodeImage(5L, "image", Jpeg.makeJpeg(5L, 2, 2, "444"))
    assert(f.width == 16 && f.height == 16 && f.channels == 3)
  }

  test("progressive JPEG: flat scan script decodes identically to baseline") {
    // DC first (Al=1) + DC refinement + per-component EOB-run AC scans
    // must reproduce the baseline decode of the same image bit-exactly —
    // including the interleaved DC path (444) and restarts in every scan
    for (seed <- Seq(0L, 7L, 200L); mode <- Seq("gray", "444");
         re <- Seq(0, 2)) {
      val base = Jpeg.decode(Jpeg.makeJpeg(seed, 4, 2, mode))
      val prog = Jpeg.decode(
        Jpeg.makeProgressiveJpeg(seed, 4, 2, mode, restartEvery = re))
      assert(base == prog,
        s"progressive diverged at seed=$seed mode=$mode restart=$re")
    }
  }

  test("progressive JPEG: coefficient roundtrip matches baseline pixels") {
    // drives every refinement path: banded first scans with run/size and
    // ZRL codes, EOB runs spanning blocks, newly-significant
    // coefficients at each successive-approximation level, history
    // correction bits (odd values), and an all-zero block
    val b1 = new Array[Int](64)
    b1(0) = 5; b1(1) = 3; b1(2) = -1; b1(19) = 4
    val b2 = new Array[Int](64)
    b2(0) = -7; b2(6) = 9; b2(63) = -2 // crosses the band split; band tail
    val b3 = new Array[Int](64) // all-zero: EOB-run member in every scan
    val b4 = new Array[Int](64)
    b4(0) = 1; b4(5) = 7; b4(40) = -5; b4(41) = 1 // odd magnitudes: corr bits
    val blocks = Seq(b1, b2, b3, b4)
    val base = Jpeg.decode(Jpeg.makeJpegFromCoefficients(blocks, blocksX = 2))
    for (acAl <- 0 to 2; bandSplit <- Seq(1, 5, 33)) {
      val prog = Jpeg.decode(Jpeg.makeProgressiveJpegFromCoefficients(
        blocks, blocksX = 2, bandSplit = bandSplit, acAl = acAl))
      assert(base == prog,
        s"coefficient roundtrip diverged at acAl=$acAl split=$bandSplit")
    }
  }

  test("progressive JPEG: malformed payloads fail loudly by name") {
    // truncated mid-scan
    intercept[IllegalArgumentException](
      Jpeg.decode(Jpeg.makeProgressiveJpeg(3L, 4, 4, "gray").dropRight(10)))
    // progressive frames above the whole-image coefficient cap refuse
    val big = Jpeg.makeProgressiveJpeg(1L, 2, 2, "gray")
    var i = 0
    while (!((big(i) & 0xFF) == 0xFF && (big(i + 1) & 0xFF) == 0xC2)) i += 1
    big(i + 5) = 0x40.toByte; big(i + 6) = 0x00.toByte // height 16384
    big(i + 7) = 0x40.toByte; big(i + 8) = 0x00.toByte // width 16384
    val e = intercept[IllegalArgumentException](Jpeg.decode(big))
    assert(e.getMessage.contains("progressive JPEG frame too large"))
  }

  test("decodeGif: gradient closed-form luma; literal, compressed, interlaced agree") {
    for (seed <- Seq(0L, 9L, 250L); (w, h) <- Seq((8, 4), (13, 7))) {
      val f = Multimodal.decodeGif(seed, "image", Gif.makeGif(seed, w, h))
      assert(f.width == w && f.height == h && f.channels == 3)
      val sumV = (for (x <- 0 until w; y <- 0 until h) yield (seed + x + y) % 256).sum
      assert(f.mean_luma == sumV.toDouble * 1000.0 / (1000.0 * 255.0 * (w * h)),
        s"luma mismatch at seed=$seed ${w}x$h")
      // the real LZW encoder and the interlaced writer decode identically
      val plain = Gif.decode(Gif.makeGif(seed, w, h))
      assert(Gif.decode(Gif.makeGif(seed, w, h, compressed = true)) == plain)
      assert(Gif.decode(Gif.makeGif(seed, w, h, interlaced = true)) == plain)
    }
  }

  test("Gif LZW: uniform runs (KwKwK) and incompressible streams (width growth)") {
    // all-same indices force code == dictSize (KwKwK) immediately
    val uni = Array.fill(400)(77)
    val d = Gif.decode(Gif.makeGifFromIndices(uni, width = 20))
    assert(d.lumaMilli == 400L * 1000L * 77L)
    // a non-repeating de Bruijn-ish stream adds an entry per pixel pair:
    // >3840 entries drives the 10-, 11- and 12-bit code widths and the
    // 4096-entry dictionary cap on both encoder and decoder
    val hard = Array.tabulate(8192)(i => ((i * 37 + (i * i) % 251) % 256))
    val dh = Gif.decode(Gif.makeGifFromIndices(hard, width = 64))
    assert(dh.lumaMilli == hard.map(v => 1000L * v).sum)
    // and the literal (uncompressed) writer agrees on the same stream
    assert(Gif.decode(Gif.makeGifFromIndices(hard, 64, compressed = false)) == dh)
  }

  test("decodeGif: malformed payloads fail loudly by name") {
    intercept[IllegalArgumentException](Gif.decode("NOTAGIF-------".getBytes))
    // truncated mid-LZW
    intercept[IllegalArgumentException](
      Gif.decode(Gif.makeGif(1L, 8, 8).dropRight(10)))
    // trailer with no image data
    val empty = Gif.makeGif(1L, 4, 4)
    val headerLen = 13 + 768 // header + screen descriptor + GCT
    val noImage = empty.take(headerLen) :+ 0x3B.toByte
    val e = intercept[IllegalArgumentException](Gif.decode(noImage))
    assert(e.getMessage.contains("trailer"))
    // frame larger than the declared screen
    val big = Gif.makeGif(1L, 4, 4)
    big(headerLen + 5) = 9 // frame width 9 > screen 4
    intercept[IllegalArgumentException](Gif.decode(big))
    // truncated right after an extension introducer + label: must be the
    // named extension error, not an index crash
    val extTrunc = empty.take(headerLen) ++ Array(0x21.toByte, 0xFE.toByte)
    val e4 = intercept[IllegalArgumentException](Gif.decode(extTrunc))
    assert(e4.getMessage.contains("extension"))
  }

  test("decodeImage dispatches GIF by signature") {
    val f = Multimodal.decodeImage(2L, "image", Gif.makeGif(2L, 8, 4))
    assert(f.width == 8 && f.height == 4 && f.channels == 3)
  }

  test("sampleFrames: one row per sampled offset, stub duration") {
    val packed = Multimodal.packAssets(docs, "doc_id", "text", kind = "video")
    val frames = Multimodal.sampleFrames(packed.as[Multimodal.Asset]).collect()
    val byAsset = frames.groupBy(_.asset_id)
    assert(byAsset(1L).length == ("hello world".length % 10) + 1)
    assert(byAsset(1L).map(_.frame_index).sorted.sameElements(
      0 until byAsset(1L).length))
    assert(byAsset(1L).forall(f => f.frame_offset_ms == f.frame_index * 1000L))
  }
  test("resizeToBox: aspect preserved, fits the box, floor-clamped") {
    val assets = Seq(
      Multimodal.Asset(1L, "image", Array.fill[Byte](100)(65)),  // 116 x 16+(65*8%240)
      Multimodal.Asset(2L, "image", Array.emptyByteArray)        // 16 x 16
    ).toDS()
    val out = Multimodal.resizeToBox(assets, 224, 224).collect()
      .map(r => r.asset_id -> r).toMap
    out.values.foreach { r =>
      assert(r.out_width <= 224 && r.out_height <= 224 && r.out_width >= 1 && r.out_height >= 1)
      // the larger dimension fills the box (within floor rounding)
      assert(r.out_width == 224 || r.out_height == 224)
      assert(r.out_bytes == r.out_width.toLong * r.out_height * 3)
    }
    assert(out(2L).out_width == 224 && out(2L).out_height == 224, "square scales to the full box")
  }

  test("audioFeatures: PCM-fiction math over the payload") {
    val assets = Seq(Multimodal.Asset(1L, "audio", "abcd".getBytes)).toDS()
    val f = Multimodal.audioFeatures(assets).collect().head
    assert(f.n_bytes == 4 && f.n_samples == 2 && f.duration_ms == 0)
    assert(f.rms == (('a' * 31 + 'd') % 1000).toDouble / 1000.0)
  }

  /** Independent pixel-space reference for the perceptual hashes: the
    * same textured formula evaluated directly (no BMP bytes, no box-sum
    * loop order), downsampled by explicit 2×2 box sums.
    */
  private def refHashes(seed: Long, flip: Option[(Int, Int)]): (Long, Long) = {
    def v(x: Int, y: Int): Long = {
      val base = seed * 31 + x.toLong * x +
        (3L + java.lang.Math.floorMod(seed, 5L)) * x * y +
        (7L + java.lang.Math.floorMod(seed, 11L)) * y
      val bump = if (flip.contains((x, y))) 96L else 0L
      java.lang.Math.floorMod(base + bump, 256L)
    }
    val s = Array.ofDim[Long](8, 9)
    for (y <- 0 until 16; x <- 0 until 18) s(y / 2)(x / 2) += v(x, y)
    val total = (for (gy <- 0 until 8; gx <- 0 until 8) yield s(gy)(gx)).sum
    var dh = 0L; var ah = 0L
    for (gy <- 0 until 8; gx <- 0 until 8) {
      val bit = gy * 8 + gx
      if (s(gy)(gx + 1) > s(gy)(gx)) dh |= 1L << bit
      if (s(gy)(gx) * 64 > total) ah |= 1L << bit
    }
    (dh, ah)
  }

  test("imageHashes: dHash/aHash match a pixel-space reference incl. bit 63") {
    val seeds = (0L until 40L) ++ Seq(250L, 251L, 252L) // wrap-heavy seeds
    val assets = seeds.map(s =>
      Multimodal.Asset(s, "image", Multimodal.makeBmpTextured(s, 18, 16))).toDS()
    val got = Multimodal.imageHashes(assets).collect()
      .map(h => h.asset_id -> ((h.dhash, h.ahash))).toMap
    seeds.foreach { s =>
      assert(got(s) == refHashes(s, None), s"seed $s")
    }
    // at least one seed must exercise the sign bit (the HUGEINT-fold
    // edge of the oracle): dHash bit 63 is comparison (8,7) vs (7,7)
    assert(seeds.exists(s => got(s)._1 < 0), "no seed set dHash bit 63")
  }

  test("imageHashes: one-pixel flip moves at most 2 dHash bits") {
    val assets = (0 until 8).map { p =>
      Multimodal.Asset(p.toLong, "image",
        Multimodal.makeBmpTextured(7L, 18, 16, flip = Some((p * 2, p))))
    }.toDS()
    val hs = Multimodal.imageHashes(assets).collect()
      .map(h => h.asset_id -> h.dhash).toMap
    val (base, _) = refHashes(7L, None)
    hs.values.foreach { h =>
      assert(java.lang.Long.bitCount(h ^ base) <= 2)
    }
  }

  test("sniffCharset: BOMs, ascii, well-formed UTF-8, binary") {
    def sniff(payloads: Seq[Array[Byte]]): Seq[String] = {
      val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("id", "data")
      df.select($"id", Multimodal.sniffCharset($"data").as("c"))
        .orderBy("id").as[(Long, String)].collect().map(_._2).toSeq
    }
    val cases: Seq[(Array[Byte], String)] = Seq(
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "hi".getBytes -> "utf-8-bom",
      Array[Byte](0xFF.toByte, 0xFE.toByte, 'h', 0, 'i', 0) -> "utf-16le",
      Array[Byte](0xFE.toByte, 0xFF.toByte, 0, 'h', 0, 'i') -> "utf-16be",
      "plain ascii\t\n".getBytes("UTF-8") -> "ascii",
      "héllo 世界".getBytes("UTF-8") -> "utf-8",
      Array.emptyByteArray -> "ascii",
      // lone continuation byte → binary
      Array[Byte](0xA9.toByte, 'a') -> "binary",
      // Latin-1 'é' alone → binary (not valid UTF-8)
      Array[Byte]('c', 'a', 'f', 0xE9.toByte) -> "binary",
      // overlong encoding of '/' (C0 AF) must be REJECTED
      Array[Byte](0xC0.toByte, 0xAF.toByte) -> "binary",
      // CESU-8 surrogate half (ED A0 80) must be REJECTED
      Array[Byte](0xED.toByte, 0xA0.toByte, 0x80.toByte) -> "binary",
      // F4 90 would be > U+10FFFF → rejected
      Array[Byte](0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte) -> "binary",
      // max codepoint U+10FFFF (F4 8F BF BF) accepted
      Array[Byte](0xF4.toByte, 0x8F.toByte, 0xBF.toByte, 0xBF.toByte) -> "utf-8",
      // truncated multibyte tail → binary
      "é".getBytes("UTF-8").dropRight(1) -> "binary")
    val got = sniff(cases.map(_._1))
    cases.zip(got).zipWithIndex.foreach { case (((_, expect), g), i) =>
      assert(g == expect, s"case $i: got $g expected $expect")
    }
  }

  test("trimSilence: active span, all-silent None, threshold cut") {
    // 3 frames of 4 samples: silent / loud / silent
    val pcm = Array(0, 0, 0, 0, 100, -200, 300, -50, 0, 0, 0, 0)
    def wav(samples: Array[Int]): Array[Byte] = {
      val out = Multimodal.makeWavPadded(1L, samples.length, 0, 0, 4)
      samples.zipWithIndex.foreach { case (s, i) =>
        out(44 + 2 * i) = s.toByte; out(44 + 2 * i + 1) = (s >> 8).toByte
      }
      out
    }
    val assets = Seq(
      Multimodal.Asset(1L, "audio", wav(pcm)),
      Multimodal.Asset(2L, "audio", wav(new Array[Int](12)))).toDS()
    val got = Multimodal.trimSilence(assets, frameSamples = 4).collect()
      .map(t => t.asset_id -> t).toMap
    val loudE = 100L * 100 + 200L * 200 + 300L * 300 + 50L * 50
    assert(got(1L) == Multimodal.SilenceTrim(1L, 3, Some(1), Some(1), 1, loudE))
    assert(got(2L) == Multimodal.SilenceTrim(2L, 3, None, None, 0, 0L))
    // a threshold above the loud frame's energy silences it too
    val cut = Multimodal.trimSilence(assets, frameSamples = 4,
      thresholdSumSq = loudE).collect().map(t => t.asset_id -> t).toMap
    assert(cut(1L).first_active.isEmpty && cut(1L).n_active_frames == 0)
  }

  test("makeWavPadded: padded frames zero, interior keeps makeWav's series") {
    val lead = 2; val trail = 1
    val padded = Multimodal.makeWavPadded(9L, 800, lead, trail)
    val plain = Multimodal.makeWav(9L, 800)
    for (i <- 0 until 800) {
      val f = i / 160
      val lo = padded(44 + 2 * i); val hi = padded(44 + 2 * i + 1)
      if (f < lead || f >= 5 - trail) assert(lo == 0 && hi == 0, s"sample $i")
      else assert(lo == plain(44 + 2 * i) && hi == plain(44 + 2 * i + 1))
    }
  }

  test("imageHashes: non-tiling dimensions fail loudly") {
    val assets = Seq(Multimodal.Asset(1L, "image",
      Multimodal.makeBmpTextured(1L, 10, 16))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.imageHashes(assets).collect()
    }
    assert(e.getMessage.contains("tile the hash grid")
      || Option(e.getCause).exists(_.getMessage.contains("tile the hash grid")))
  }
}
