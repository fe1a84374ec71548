package graft.ext

import org.apache.spark.sql.Dataset

/** Frequency-domain audio features — what a speech-corpus curation
  * pipeline runs after [[Multimodal.wavFrameEnergy]]'s time-domain
  * pass: per-frame magnitude spectra for tone/voicing/bandwidth
  * screening (a frame whose energy sits in one bin is a beep or hum,
  * not speech; a centroid parked at DC is rumble; both are cut
  * candidates long before any ASR model runs).
  *
  * The FFT is an in-repo iterative radix-2 Cooley–Tukey — ~40 lines of
  * primitive loops, no codec/JNI dependency, O(N log N) per frame —
  * run inside the same `mapPartitions` batch walk as every decoder in
  * [[Multimodal]]: payload bytes stay in the scan task, one output row
  * per frame, nothing wider than (id, frame, features) ever shuffles.
  *
  * Determinism: double-precision FFT results are IEEE-deterministic
  * for a fixed operation order (this implementation is sequential and
  * order-fixed), so outputs are stable run-to-run and machine-to-
  * machine on JVMs; they are NOT SQL-replayable (no closed form), so
  * the gate is rows-only and the numerics are spec-pinned against a
  * naive DFT, Parseval's identity, and analytically-known inputs.
  */
object Spectral {

  /** In-place iterative radix-2 FFT. Length must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "re/im length mismatch")
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ar = re(base + k); val ai = im(base + k)
          val br = re(base + k + len / 2); val bi = im(base + k + len / 2)
          val tr = br * cr - bi * ci
          val ti = br * ci + bi * cr
          re(base + k) = ar + tr; im(base + k) = ai + ti
          re(base + k + len / 2) = ar - tr; im(base + k + len / 2) = ai - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Per-frame spectral summary. `energy` is the exact integer Σs² of
    * the frame (the [[Multimodal.wavFrameEnergy]] quantity — the two
    * operators must agree, spec-asserted); `peak_bin` is the argmax
    * magnitude over bins 1..N/2 (DC excluded, lowest bin on ties);
    * `centroid_e6` is floor(1e6 · Σ bin·|X|/Σ|X|) over the same bins,
    * or NULL for an all-zero spectrum.
    */
  final case class SpectralFrame(asset_id: Long, frame_idx: Int,
                                 n_in_frame: Int, energy: Long,
                                 peak_bin: Int, centroid_e6: Option[Long])

  /** Frame-wise spectra over 16-bit PCM WAV assets. `frameSamples` must
    * be a power of two; the trailing short frame is zero-padded (the
    * standard convention — windowing policy beyond rectangular is the
    * caller's business upstream).
    */
  def wavSpectral(assets: Dataset[Multimodal.Asset],
                  frameSamples: Int = 256): Dataset[SpectralFrame] = {
    require(frameSamples > 1 && (frameSamples & (frameSamples - 1)) == 0,
      s"frameSamples must be a power of 2, got $frameSamples")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.flatMap { a =>
      val pcm = Multimodal.wavPcm(a.data)
      val nFrames = (pcm.length + frameSamples - 1) / frameSamples
      Iterator.tabulate(nFrames) { f =>
        val start = f * frameSamples
        val inFrame = math.min(frameSamples, pcm.length - start)
        val re = new Array[Double](frameSamples)
        val im = new Array[Double](frameSamples)
        var energy = 0L
        var i = 0
        while (i < inFrame) {
          val s = pcm(start + i)
          re(i) = s.toDouble
          energy += s.toLong * s
          i += 1
        }
        fft(re, im)
        var peak = 1
        var peakMag = -1.0
        var magSum = 0.0
        var weighted = 0.0
        var b = 1
        val half = frameSamples / 2
        while (b <= half) {
          val mag = math.sqrt(re(b) * re(b) + im(b) * im(b))
          if (mag > peakMag) { peakMag = mag; peak = b }
          magSum += mag
          weighted += b.toDouble * mag
          b += 1
        }
        val centroid =
          if (magSum > 0.0) Some(math.floor(weighted / magSum * 1e6).toLong)
          else None
        SpectralFrame(a.asset_id, f, inFrame, energy, peak, centroid)
      }
    })
  }
}
