package graft.ext

import graft.SparkTestBase

class SpectralSpec extends SparkTestBase {
  import spark.implicits._

  /** Naive O(N²) DFT reference. */
  private def dft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  test("fft matches the naive DFT on random input") {
    val rnd = new scala.util.Random(5)
    for (n <- Seq(8, 64, 128)) {
      val x = Array.fill(n)(rnd.nextGaussian() * 100)
      val re = x.clone(); val im = new Array[Double](n)
      Spectral.fft(re, im)
      val (er, ei) = dft(x)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) < 1e-6, s"n=$n re[$k]")
        assert(math.abs(im(k) - ei(k)) < 1e-6, s"n=$n im[$k]")
      }
    }
  }

  test("fft: Parseval's identity and impulse flatness") {
    val rnd = new scala.util.Random(6)
    val n = 64
    val x = Array.fill(n)(rnd.nextGaussian())
    val re = x.clone(); val im = new Array[Double](n)
    Spectral.fft(re, im)
    val timeE = x.map(v => v * v).sum
    val freqE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(timeE - freqE) < 1e-9 * math.max(1.0, timeE))
    // impulse → perfectly flat magnitude spectrum
    val ire = new Array[Double](n); ire(0) = 1.0
    val iim = new Array[Double](n)
    Spectral.fft(ire, iim)
    (0 until n).foreach { k =>
      assert(math.abs(math.hypot(ire(k), iim(k)) - 1.0) < 1e-12)
    }
    // non-power-of-two fails loudly
    intercept[IllegalArgumentException](
      Spectral.fft(new Array[Double](12), new Array[Double](12)))
  }

  test("wavSpectral: square wave peaks at its fundamental bin") {
    // period 8 over a 64-sample frame → fundamental at bin 64/8 = 8
    val n = 64
    val pcm = Array.tabulate(n)(i => if ((i / 4) % 2 == 0) 8000 else -8000)
    val wav = makePcmWav(pcm)
    val out = Spectral.wavSpectral(
        Seq(Multimodal.Asset(1L, "audio", wav)).toDS(), frameSamples = 64)
      .collect()
    assert(out.length == 1)
    assert(out(0).peak_bin == 8, s"peak at ${out(0).peak_bin}")
    assert(out(0).n_in_frame == 64)
    assert(out(0).energy == pcm.map(s => s.toLong * s).sum)
  }

  test("wavSpectral: frame energy agrees with wavFrameEnergy; silence → NULL centroid") {
    val assets = Seq(
      Multimodal.Asset(1L, "audio", Multimodal.makeWav(7L, 300)),
      Multimodal.Asset(2L, "audio", makePcmWav(new Array[Int](100)))).toDS()
    val spec = Spectral.wavSpectral(assets, frameSamples = 64).collect()
      .map(f => (f.asset_id, f.frame_idx) -> f).toMap
    val time = Multimodal.wavFrameEnergy(assets, frameSamples = 64).collect()
      .map(f => (f.asset_id, f.frame_idx) -> f.sum_sq).toMap
    assert(spec.keySet == time.keySet)
    spec.foreach { case (k, f) => assert(f.energy == time(k), s"frame $k") }
    // all-zero frames: defined, centroid NULL, peak defaults to bin 1
    val silent = spec((2L, 0))
    assert(silent.centroid_e6.isEmpty && silent.energy == 0L)
    // short trailing frame is zero-padded, not dropped
    assert(spec((1L, 4)).n_in_frame == 300 - 4 * 64)
  }

  /** Minimal mono 16 kHz 16-bit PCM WAV wrapper around given samples. */
  private def makePcmWav(samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putInt(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putShort(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    "RIFF".getBytes.copyToArray(out, 0)
    putInt(4, 36 + dataLen)
    "WAVEfmt ".getBytes.copyToArray(out, 8)
    putInt(16, 16); putShort(20, 1); putShort(22, 1)
    putInt(24, 16000); putInt(28, 32000); putShort(32, 2); putShort(34, 16)
    "data".getBytes.copyToArray(out, 36)
    putInt(40, dataLen)
    samples.zipWithIndex.foreach { case (s, i) => putShort(44 + 2 * i, s) }
    out
  }
}
