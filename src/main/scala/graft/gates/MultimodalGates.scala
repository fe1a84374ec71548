package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — multimodal columns: image/audio codecs over binary columns, frame sampling, perceptual hashing.
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object MultimodalGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext multimodal — binary payloads + batch (mapPartitions) feature
    // extraction through the STUB decoder; plumbing (schema, encoders,
    // batch shape) is real and the stub is arithmetic the oracle mirrors.
    "q24_multimodal_decode" -> ((s, dir) => {
      val packed = ext.Multimodal.packAssets(
        tbl(s, dir, "documents"), "doc_id", "text")
      ext.Multimodal.imageFeatures(packed)
    }),

    // ext multimodal — video frame sampling (flatMap: 1 row per frame).
    "q25_frame_sample" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val packed = ext.Multimodal.packAssets(
        tbl(s, dir, "documents"), "doc_id", "text", kind = "video")
      ext.Multimodal.sampleFrames(packed.as[ext.Multimodal.Asset]).toDF()
    }),

    // ext multimodal — audio-kind payloads through the batch decode stub
    // (16-bit mono PCM fiction; real codec swaps in behind the signature).
    "q50_audio_features" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val packed = ext.Multimodal.packAssets(
        tbl(s, dir, "documents"), "doc_id", "text", kind = "audio")
      ext.Multimodal.audioFeatures(packed.as[ext.Multimodal.Asset]).toDF()
    }),

    // ext multimodal — aspect-preserving resize into a 224x224 box; the
    // dimension math is the real contract, pixels are stubbed.
    "q51_image_resize" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val packed = ext.Multimodal.packAssets(
        tbl(s, dir, "documents"), "doc_id", "text")
      ext.Multimodal.resizeToBox(packed.as[ext.Multimodal.Asset]).toDF()
    }),

    // ext multimodal — REAL pure-JVM GIF decode end-to-end: deterministic
    // gradient images (every third id runs the real greedy LZW encoder,
    // every other id is interlaced — row order the luma sum never sees),
    // the native decoder walks blocks + LZW-decompresses + palette-maps,
    // and the oracle recomputes exact-integer Rec.601 luma in closed
    // form over the gradient (identity gray palette: luma = index).
    "q111_gif_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "image",
          ext.Gif.makeGif(id, 8, 4,
            interlaced = id % 2 == 1, compressed = id % 3 == 0)))
      ext.Multimodal.gifFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext multimodal — REAL 24-bit BMP decode end-to-end: deterministic
    // gradient images are byte-built per document, the native byte-level
    // parser extracts dimensions and exact-integer Rec.601 mean luma, and
    // the oracle recomputes the luma in closed form over the pixel grid.
    "q93_bmp_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "image", ext.Multimodal.makeBmp(id, 8, 4)))
      ext.Multimodal.bmpFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("n_bytes"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext multimodal — REAL 16-bit PCM WAV decode end-to-end: RIFF chunks
    // walked, RMS from an exact integer sum of squares; the oracle
    // recomputes it in closed form over the sample series.
    "q94_wav_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "audio", ext.Multimodal.makeWav(id, 256)))
      ext.Multimodal.wavFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("n_bytes"),
          col("n_samples"), col("duration_ms"), col("rms"))
        .orderBy("doc_id")
    }),

    // ext multimodal — REAL pure-JVM PNG decode end-to-end: deterministic
    // gradient images (alternating RGB/RGBA by id, scanline filters
    // cycling through all five PNG filter types) are zlib-compressed and
    // chunk-wrapped per document, the native decoder inflates + unfilters
    // + CRC-checks, and the oracle recomputes the exact-integer Rec.601
    // luma in closed form over the pixel grid (n_bytes is omitted: the
    // deflate length is not SQL-expressible).
    "q105_png_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "image",
          ext.Multimodal.makePng(id, 8, 4, channels = (3 + id % 2).toInt)))
      ext.Multimodal.pngFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext multimodal — REAL pure-JVM baseline JPEG decode end-to-end:
    // deterministic flat-block images (mode cycles gray / YCbCr 4:4:4 /
    // 4:2:0 by id, every other id carries DRI+restart markers), the
    // native decoder walks markers, Huffman-decodes the entropy stream,
    // dequantizes + IDCTs + upsamples + converts color, and the oracle
    // recomputes the exact-integer Rec.601 luma in closed form (DC-only
    // blocks with an all-8s table decode exactly to their block value;
    // flat chroma 128 makes RGB == Y).
    "q107_jpeg_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      // fanned out: JPEG encode+full-decode is the ONE multimodal asset
      // family whose per-row work amortizes the id exchange even at gate
      // scale (floor 0.74 -> 0.52 s; the BMP/WAV synth gates measured
      // the OPPOSITE and stay on their scan partitioning)
      val assets = fannedDocIds(tbl(s, dir, "documents"))
        .map { id =>
          val mode = (id % 3) match {
            case 0 => "gray"; case 1 => "444"; case _ => "420"
          }
          ext.Multimodal.Asset(id, "image",
            ext.Jpeg.makeJpeg(id, 4, 2, mode, restartEvery = (id % 2).toInt * 2))
        }
      ext.Multimodal.jpegFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext multimodal — PROGRESSIVE (SOF2) JPEG decode, q107's closed-form
    // family re-encoded as a real multi-scan script (DC first at Al=1,
    // DC refinement, per-component EOB-run AC scans, interleaved DC for
    // color, restarts on odd ids): the web-crawl JPEG variant baseline
    // decoders reject. DC-only blocks ⇒ decoded pixel == block value
    // exactly, so mean luma keeps q107's closed form.
    "q136_jpeg_progressive" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      // fanned out like q107 (floor 0.97 -> 0.48 s): multi-scan
      // progressive decode is heavy enough per row to amortize the
      // exchange
      val assets = fannedDocIds(tbl(s, dir, "documents"))
        .map { id =>
          val mode = if (id % 2 == 0) "gray" else "444"
          ext.Multimodal.Asset(id, "image",
            ext.Jpeg.makeProgressiveJpeg(id, 4, 2, mode,
              restartEvery = (id % 2).toInt * 2))
        }
      ext.Multimodal.jpegFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext multimodal — G.711 telephony audio (WAV format 7 = μ-law,
    // 6 = A-law): the 8-bit logarithmic expansion is pure integer
    // (shift/mod), so the oracle replays every sample bit-for-bit and
    // the RMS is closed-form — the speech-corpus ingest path MP3/Vorbis
    // can't have without a codec lib.
    "q140_g711_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "audio",
          ext.Multimodal.makeWavG711(id, 256, mulaw = id % 2 == 0)))
      ext.Multimodal.wavFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("n_bytes"),
          col("n_samples"), col("duration_ms"), col("rms"))
        .orderBy("doc_id")
    }),

    // ext multimodal — windowed frame energy over PCM audio (the VAD /
    // silence-trim primitive): one row per 100-sample frame, exact
    // BIGINT Σs² plus the derived rms; the last frame is short (56).
    "q146_audio_frames" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "audio",
          ext.Multimodal.makeWav(id, 256)))
      ext.Multimodal.wavFrameEnergy(assets, frameSamples = 100).toDF()
        .select(col("asset_id").as("doc_id"), col("frame_idx"),
          col("n_in_frame"), col("sum_sq"), col("rms"))
        .orderBy("doc_id", "frame_idx")
    }),

    // ext multimodal — IMA ADPCM (WAV format 17) decode: block headers +
    // adaptive nibble chain, pure integer. Oracle-gated since round 12:
    // the decoder's per-sample state EQUALS the encoder's (the ADPCM
    // round-trip invariant), the fixture's target samples are a closed
    // form of (doc_id, i), and the quantize+step recurrence unrolls as
    // a recursive CTE over sample index — so DuckDB replays the whole
    // predictor/step-index walk bit-for-bit. MultimodalSpec still pins
    // the byte-level decode against an independent reference walk.
    "q145_adpcm_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "audio",
          ext.Multimodal.makeWavAdpcm(id, 256 + (id % 3).toInt * 128)))
      ext.Multimodal.wavFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("n_bytes"),
          col("n_samples"), col("duration_ms"), col("rms"))
        .orderBy("doc_id")
    }),

    // ext multimodal — PNG variant surface (the web-crawl forms beyond
    // q105's truecolor): grayscale and palette color types at sub-byte
    // depths, gray+alpha, and Adam7 INTERLACE, every scanline still
    // rotating through all five filters. Closed forms: gray s·255/(2^d−1)
    // with s=(id+x+y) mod 2^d; palette luma (id + idx) mod 256.
    "q137_png_variants" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val bytes = (id % 5) match {
            case 0 => ext.Multimodal.makePngVariant(id, 13, 7, 0, 8)
            case 1 => ext.Multimodal.makePngVariant(id, 13, 7, 0, 4,
              interlaced = true)
            case 2 => ext.Multimodal.makePngVariant(id, 13, 7, 3, 8)
            case 3 => ext.Multimodal.makePngVariant(id, 13, 7, 3, 2,
              interlaced = true)
            case _ => ext.Multimodal.makePngVariant(id, 13, 7, 6, 8,
              interlaced = true)
          }
          ext.Multimodal.Asset(id, "image", bytes)
        }
      ext.Multimodal.pngFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext multimodal — REAL QOI decode end-to-end: the greedy reference
    // encoder compresses a deterministic pixel series built to hit every
    // op (alternating constant rows → RUN + INDEX, unit-step rows →
    // DIFF, (1,2,1)-step rows → LUMA, row seams → RGB escapes; RGB/RGBA
    // alternating by id), the decoder walks the op stream, and the
    // oracle recomputes the exact-integer Rec.601 luma in closed form
    // over the 9×12 grid.
    "q155_qoi_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "image", ext.Qoi.makeQoi(id, 9, 12)))
      ext.Multimodal.qoiFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext multimodal — perceptual image hashing (dHash + aHash) over REAL
    // byte-decoded 18×16 textured BMPs: exact-integer 2×2 box sums
    // downsample to the classic 9×8 grid, comparisons are division-free,
    // and the oracle replays both 64-bit hashes closed-form over the
    // pixel formula (full 64 bits via a HUGEINT two's-complement fold).
    "q174_image_phash" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "image",
          ext.Multimodal.makeBmpTextured(id, 18, 16)))
      ext.Multimodal.imageHashes(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("dhash"), col("ahash"))
        .orderBy("doc_id")
    }),

    // ext audio curation — leading/trailing silence trim over REAL PCM
    // WAV bytes: per-frame exact integer Σs², active span + energy per
    // asset. Padded frames (lead = id%3, trail = (id//3)%2 of 5) keep
    // makeWav's closed form, so the oracle replays every frame energy.
    "q189_trim_silence" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          ext.Multimodal.Asset(id, "audio",
            ext.Multimodal.makeWavPadded(id, 800,
              lead = (id % 3).toInt, trail = ((id / 3) % 2).toInt))
        }
      ext.Multimodal.trimSilence(assets, frameSamples = 160).toDF()
        .select(col("asset_id").as("doc_id"), col("n_frames"),
          col("first_active"), col("last_active"),
          col("n_active_frames"), col("active_sum_sq"))
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // IMA ADPCM replay (q145): the decoder state equals the encoder
    // state (the ADPCM round-trip invariant), targets are the fixture's
    // closed form sample(i) = ((doc_id*31 + i) mod 2^16) - 32768, and
    // the greedy quantize + table-step recurrence (89-entry step table,
    // int16/index clamps) unrolls as a RECURSIVE CTE over the sample
    // index - block headers reset the predictor at i % 505 = 0 with the
    // step index carried across blocks. n_bytes/duration are header
    // closed forms; rms is one fixed IEEE sqrt over the exact BIGINT
    // sum of squares.
    "q145_adpcm_decode" ->
      s"""WITH RECURSIVE docs0 AS (
         |  SELECT doc_id, CAST(256 + (doc_id % 3) * 128 AS BIGINT) AS n,
         |    CAST(((doc_id * 31) % 65536 + 65536) % 65536 - 32768 AS BIGINT) AS smp0
         |  FROM documents),
         |chain AS (
         |  SELECT doc_id, CAST(0 AS BIGINT) AS i, n,
         |    smp0 AS pred, CAST(0 AS BIGINT) AS idx,
         |    CAST(smp0 * smp0 AS BIGINT) AS sumsq
         |  FROM docs0
         |  UNION ALL
         |
         |  SELECT doc_id, i + 1 AS i, n,
         |    CASE WHEN hdr THEN t ELSE p END AS pred,
         |    CASE WHEN hdr THEN idx ELSE ix END AS idx,
         |    sumsq + (CASE WHEN hdr THEN t ELSE p END)
         |          * (CASE WHEN hdr THEN t ELSE p END) AS sumsq
         |  FROM (
         |    SELECT doc_id, i, n, idx, sumsq, hdr, t,
         |      greatest(CAST(-32768 AS BIGINT), least(CAST(32767 AS BIGINT),
         |        CASE WHEN sgn THEN pred - diff ELSE pred + diff END)) AS p,
         |      greatest(CAST(0 AS BIGINT), least(CAST(88 AS BIGINT),
         |        idx + ([-1, -1, -1, -1, 2, 4, 6, 8])[(CASE WHEN b4 THEN 4 ELSE 0 END
         |          + CASE WHEN b2 THEN 2 ELSE 0 END
         |          + CASE WHEN b1 THEN 1 ELSE 0 END) + 1])) AS ix
         |    FROM (
         |      SELECT *,
         |        (st // 8) + CASE WHEN b1 THEN st // 4 ELSE 0 END
         |          + CASE WHEN b2 THEN st // 2 ELSE 0 END
         |          + CASE WHEN b4 THEN st ELSE 0 END AS diff
         |      FROM (
         |        SELECT *, (r1 - CASE WHEN b2 THEN st // 2 ELSE 0 END) >= st // 4 AS b1
         |        FROM (
         |          SELECT *, (ad - CASE WHEN b4 THEN st ELSE 0 END) AS r1,
         |            (ad - CASE WHEN b4 THEN st ELSE 0 END) >= st // 2 AS b2
         |          FROM (
         |            SELECT *, abs(t - pred) AS ad, (t - pred) < 0 AS sgn,
         |              abs(t - pred) >= st AS b4
         |            FROM (
         |              SELECT doc_id, i, n, pred, idx, sumsq,
         |                ((i + 1) % 505) = 0 AS hdr,
         |                CAST(((doc_id * 31 + i + 1) % 65536 + 65536) % 65536
         |                  - 32768 AS BIGINT) AS t,
         |                ([7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767])[CAST(idx + 1 AS INT)] AS st
         |              FROM chain WHERE i + 1 < n) t0) t1) t2) t3) t4) t5
         |)
         |SELECT doc_id,
         |  CAST(60 + ((n + 504) // 505) * 256 AS BIGINT) AS n_bytes,
         |  n AS n_samples, n // 8 AS duration_ms,
         |  sqrt(CAST(sumsq AS DOUBLE) / n) / 32768.0 AS rms
         |FROM chain WHERE i = n - 1
         |ORDER BY doc_id""".stripMargin,

    // 8×4 gray gradient v = (doc_id + x + y) % 256 under an identity
    // palette: luma milli-sum is 1000·Σv exactly, whatever the encoding
    // (literal vs LZW-compressed vs interlaced) — same grid as q105
    "q111_gif_decode" ->
      """SELECT d.doc_id,
        |  CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  CAST(sum(1000 * ((d.doc_id + u.x + v.y) % 256)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 32) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 7)) AS u(x),
        |  unnest(generate_series(0, 3)) AS v(y)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // 8×4 gray gradient v = (doc_id + x + y) % 256: luma milli-sum is
    // 1000·Σv exactly (299+587+114 = 1000 on gray), n_bytes = 54 header
    // + 4 rows × 24-byte stride = 150
    "q93_bmp_decode" ->
      """SELECT d.doc_id, CAST(150 AS BIGINT) AS n_bytes,
        |  CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  CAST(sum(1000 * ((d.doc_id + u.x + v.y) % 256)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 32) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 7)) AS u(x),
        |  unnest(generate_series(0, 3)) AS v(y)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // mono 16 kHz, 256 samples s_i = (doc_id·31 + i) % 65536 − 32768:
    // rms = sqrt(Σs²/256)/32768 (exact integer sum; sqrt is correctly
    // rounded on every IEEE engine); 44-byte header + 512 data bytes
    "q94_wav_decode" ->
      """SELECT d.doc_id, CAST(556 AS BIGINT) AS n_bytes,
        |  CAST(256 AS BIGINT) AS n_samples, CAST(16 AS BIGINT) AS duration_ms,
        |  sqrt(CAST(sum(((d.doc_id * 31 + u.i) % 65536 - 32768)
        |              * ((d.doc_id * 31 + u.i) % 65536 - 32768)) AS DOUBLE)
        |       / 256) / 32768.0 AS rms
        |FROM documents d, unnest(generate_series(0, 255)) AS u(i)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // 8×4 gray gradient v = (doc_id + x + y) % 256 (same grid as q93's
    // BMP); luma milli-sum is 1000·Σv exactly on gray; channels alternate
    // RGB/RGBA by id parity and alpha never enters luma
    "q105_png_decode" ->
      """SELECT d.doc_id,
        |  CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
        |  CAST(3 + (d.doc_id % 2) AS INT) AS channels,
        |  CAST(sum(1000 * ((d.doc_id + u.x + v.y) % 256)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 32) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 7)) AS u(x),
        |  unnest(generate_series(0, 3)) AS v(y)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // 4×2 grid of flat 8×8 blocks, block value v = (doc_id + bx + by) %
    // 256 → every pixel in the block equals v exactly (DC-only, q=8),
    // so lumaMilli = Σ_blocks 64·1000·v regardless of mode (flat chroma
    // 128 ⇒ RGB = Y); channels = 1 for gray ids (doc_id % 3 = 0) else 3
    "q107_jpeg_decode" ->
      """SELECT d.doc_id,
        |  CAST(32 AS INT) AS width, CAST(16 AS INT) AS height,
        |  CAST(CASE WHEN d.doc_id % 3 = 0 THEN 1 ELSE 3 END AS INT) AS channels,
        |  CAST(sum(64 * 1000 * ((d.doc_id + u.bx + v.by) % 256)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 512) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 3)) AS u(bx),
        |  unnest(generate_series(0, 1)) AS v(by)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Mirrors Multimodal.fakeDecode's arithmetic over the utf-8 payload
    // (documents are ascii: char ops == byte ops).
    "q24_multimodal_decode" ->
      """SELECT doc_id AS asset_id, 'image' AS kind,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(16 + (strlen(text) % 240) AS INT) AS width,
        |  CAST(16 + ((ascii(substr(text, 1, 1)) * 7 + ascii(substr(text, length(text), 1))) % 240) AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  CAST((CAST(16 + (strlen(text) % 240) AS BIGINT)
        |        * (16 + ((ascii(substr(text, 1, 1)) * 7 + ascii(substr(text, length(text), 1))) % 240))) % 251 AS DOUBLE)
        |    / CAST(250 AS DOUBLE) AS mean_luma
        |FROM documents""".stripMargin,

    "q25_frame_sample" ->
      """SELECT doc_id AS asset_id,
        |  CAST(i AS INT) AS frame_index,
        |  CAST(i * 1000 AS BIGINT) AS frame_offset_ms,
        |  CAST(strlen(text) AS BIGINT) * 1315423911 + i * 1000 AS frame_hash
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, strlen(text) % 10)) AS i
        |      FROM documents)""".stripMargin,

    "q50_audio_features" ->
      """SELECT doc_id AS asset_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(strlen(text) // 2 AS BIGINT) AS n_samples,
        |  CAST((strlen(text) // 2) // 16 AS BIGINT) AS duration_ms,
        |  CAST((ascii(substr(text, 1, 1)) * 31 + ascii(substr(text, length(text), 1))) % 1000 AS DOUBLE) / 1000.0 AS rms
        |FROM documents""".stripMargin,

    // Mirrors fakeDecode's dims then the resize math: scale = min of the
    // two box ratios, floor, clamp to >= 1.
    "q51_image_resize" ->
      """WITH f AS (
        |  SELECT doc_id AS asset_id,
        |    CAST(16 + (strlen(text) % 240) AS INT) AS width,
        |    CAST(16 + ((ascii(substr(text, 1, 1)) * 7 + ascii(substr(text, length(text), 1))) % 240) AS INT) AS height
        |  FROM documents),
        |r AS (
        |  SELECT asset_id, width, height,
        |    least(224.0 / width, 224.0 / height) AS scale
        |  FROM f)
        |SELECT asset_id, width, height,
        |  greatest(1, CAST(floor(width * scale) AS INT)) AS out_width,
        |  greatest(1, CAST(floor(height * scale) AS INT)) AS out_height,
        |  CAST(greatest(1, CAST(floor(width * scale) AS INT)) AS BIGINT)
        |    * greatest(1, CAST(floor(height * scale) AS INT)) * 3 AS out_bytes
        |FROM r""".stripMargin,

    // per-frame Σs² over the q94 sample family, grouped by i // 100
    "q146_audio_frames" ->
      """SELECT d.doc_id, CAST(u.i // 100 AS INT) AS frame_idx,
        |  CAST(count(*) AS INT) AS n_in_frame,
        |  CAST(sum(((d.doc_id * 31 + u.i) % 65536 - 32768)
        |         * ((d.doc_id * 31 + u.i) % 65536 - 32768)) AS BIGINT) AS sum_sq,
        |  sqrt(CAST(sum(((d.doc_id * 31 + u.i) % 65536 - 32768)
        |              * ((d.doc_id * 31 + u.i) % 65536 - 32768)) AS DOUBLE)
        |       / count(*)) / 32768.0 AS rms
        |FROM documents d, unnest(generate_series(0, 255)) AS u(i)
        |GROUP BY d.doc_id, u.i // 100
        |ORDER BY d.doc_id, frame_idx""".stripMargin,

    // G.711 expansion replayed per byte in exact integers: μ-law via the
    // complemented (mantissa·8+132)<<exp − 132 form, A-law via XOR 0x55
    // and the segment expansion; rms = sqrt(Σs²/n)/32768 as q94
    "q140_g711_decode" ->
      """WITH b AS (
        |  SELECT d.doc_id, (d.doc_id * 31 + u.i) % 256 AS byte
        |  FROM documents d, unnest(generate_series(0, 255)) AS u(i)),
        |x AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      (CASE WHEN (255 - byte) >= 128 THEN -1 ELSE 1 END) *
        |      ((((255 - byte) % 16) * 8 + 132)
        |         * (1 << (((255 - byte) // 16) % 8)) - 132)
        |    ELSE
        |      (CASE WHEN xor(byte, 85) >= 128 THEN 1 ELSE -1 END) *
        |      (CASE WHEN ((xor(byte, 85) // 16) % 8) = 0
        |            THEN (xor(byte, 85) % 16) * 16 + 8
        |            ELSE ((xor(byte, 85) % 16) * 16 + 264)
        |                 * (1 << (((xor(byte, 85) // 16) % 8) - 1)) END)
        |    END AS s
        |  FROM b)
        |SELECT doc_id, CAST(300 AS BIGINT) AS n_bytes,
        |  CAST(256 AS BIGINT) AS n_samples, CAST(32 AS BIGINT) AS duration_ms,
        |  sqrt(CAST(sum(s * s) AS DOUBLE) / 256) / 32768.0 AS rms
        |FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // per-pixel closed forms over the 13x7 grid, keyed by doc_id mod 5
    "q137_png_variants" ->
      """SELECT d.doc_id,
        |  CAST(13 AS INT) AS width, CAST(7 AS INT) AS height,
        |  CAST(CASE WHEN d.doc_id % 5 IN (0, 1) THEN 1
        |            WHEN d.doc_id % 5 = 4 THEN 4 ELSE 3 END AS INT) AS channels,
        |  CAST(sum(1000 * (CASE d.doc_id % 5
        |    WHEN 0 THEN (d.doc_id + u.x + v.y) % 256
        |    WHEN 1 THEN 17 * ((d.doc_id + u.x + v.y) % 16)
        |    WHEN 2 THEN (d.doc_id + ((d.doc_id + u.x + v.y) % 256)) % 256
        |    WHEN 3 THEN (d.doc_id + ((d.doc_id + u.x + v.y) % 4)) % 256
        |    ELSE (d.doc_id + u.x + v.y) % 256 END)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 91) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 12)) AS u(x),
        |  unnest(generate_series(0, 6)) AS v(y)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // q107's closed form, gray/444 keyed by doc_id parity
    "q136_jpeg_progressive" ->
      """SELECT d.doc_id,
        |  CAST(32 AS INT) AS width, CAST(16 AS INT) AS height,
        |  CAST(CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT) AS channels,
        |  CAST(sum(64 * 1000 * ((d.doc_id + u.bx + v.by) % 256)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 512) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 3)) AS u(bx),
        |  unnest(generate_series(0, 1)) AS v(by)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // per-pixel closed form over the 9×12 grid: alternating constant
    // rows (y%4=3), unit-step rows (y%4=1), (1,2,1)-step rows
    // otherwise; channels by parity
    "q155_qoi_decode" ->
      """SELECT d.doc_id,
        |  CAST(9 AS INT) AS width, CAST(12 AS INT) AS height,
        |  CAST(CASE WHEN d.doc_id % 2 = 0 THEN 3 ELSE 4 END AS INT)
        |    AS channels,
        |  CAST(sum(CASE WHEN v.y % 4 = 3
        |    THEN 1000 * ((d.doc_id + 101 + 7 * ((v.y // 4) % 2)) % 256)
        |    WHEN v.y % 4 = 1
        |    THEN 299 * ((d.doc_id + u.x + v.y) % 256)
        |       + 587 * ((d.doc_id + u.x + v.y + 1) % 256)
        |       + 114 * ((d.doc_id + u.x + v.y + 2) % 256)
        |    ELSE 299 * ((d.doc_id + u.x + v.y) % 256)
        |       + 587 * ((d.doc_id + 2 * u.x + v.y) % 256)
        |       + 114 * ((d.doc_id + u.x + 2 * v.y) % 256) END) AS DOUBLE)
        |    / (1000.0 * 255.0 * 108) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 8)) AS u(x),
        |  unnest(generate_series(0, 11)) AS v(y)
        |WHERE d.doc_id IS NOT NULL
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // closed-form replay of both 64-bit perceptual hashes over the
    // textured pixel formula: 2×2 box sums (gray, so the 1000× luma
    // scale cancels out of every comparison), HUGEINT bit fold, then
    // the two's-complement cast back to BIGINT
    "q174_image_phash" ->
      s"""WITH ${imageHashCtes("(d.doc_id * 31 + u.x * u.x" +
            " + (3 + d.doc_id % 5) * u.x * v.y" +
            " + (7 + d.doc_id % 11) * v.y) % 256")}
         |SELECT dh.doc_id,
         |  ${hugeToLong("dh.h")} AS dhash,
         |  ${hugeToLong("ah.h")} AS ahash
         |FROM dh JOIN ah USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // frame energies in closed form (padded frames contribute 0), then
    // the active-span aggregate; 800 samples = 5 frames of 160
    "q189_trim_silence" ->
      """WITH s AS (
        |  SELECT d.doc_id, CAST(u.i // 160 AS INT) AS f,
        |    CASE WHEN (u.i // 160) < d.doc_id % 3
        |           OR (u.i // 160) >= 5 - (d.doc_id // 3) % 2
        |      THEN 0
        |      ELSE (d.doc_id * 31 + u.i) % 65536 - 32768 END AS v
        |  FROM documents d, unnest(generate_series(0, 799)) AS u(i)
        |  WHERE d.doc_id IS NOT NULL),
        |fe AS (
        |  SELECT doc_id, f, CAST(sum(v * v) AS BIGINT) AS e
        |  FROM s GROUP BY doc_id, f)
        |SELECT doc_id, CAST(5 AS INT) AS n_frames,
        |  CAST(min(CASE WHEN e > 0 THEN f END) AS INT) AS first_active,
        |  CAST(max(CASE WHEN e > 0 THEN f END) AS INT) AS last_active,
        |  CAST(count(CASE WHEN e > 0 THEN 1 END) AS INT) AS n_active_frames,
        |  CAST(coalesce(sum(CASE WHEN e > 0 THEN e END), 0) AS BIGINT)
        |    AS active_sum_sq
        |FROM fe GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
  )
}
